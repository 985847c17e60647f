"""SRS through the FAPI path: ul_tti srs PDU -> conductor -> srs_indication."""

import numpy as np
import jax.numpy as jnp

from srsran_tpu.fapi.conductor import SlotConductor
from srsran_tpu.fapi.messages import UlTtiRequest
from srsran_tpu.ops import ofdm
from srsran_tpu.phy.slot_programs import CellConfig
from srsran_tpu.phy.upper import srs
from srsran_tpu.ran.slot_point import SlotPoint


def test_srs_indication_through_conductor():
    cell = CellConfig(nof_ports=2, nof_rb=24, dft_size=512, numerology=1,
                      center_freq_hz=0.0)
    cfg = srs.SrsConfig(rb_start=0, rb_count=24, start_symbol=10,
                        nof_symbols=4, comb=2, comb_offset=0,
                        cyclic_shift=0, nof_ports=2, sequence_id=7,
                        numerology=1, rnti=0x22)
    # UE-side: SRS on both ports through a known 2x2 channel.
    ue = jnp.zeros((2, 14, cell.nof_sc), dtype=jnp.complex64)
    ue = np.asarray(srs.map_to_grid(ue, cfg))
    hmat = np.array([[0.9 * np.exp(0.4j), 0.2],
                     [0.1 * np.exp(-0.8j), 0.8 * np.exp(0.2j)]],
                    dtype=np.complex64)
    rng = np.random.default_rng(0)
    rx_grid = np.einsum("pt,tsk->psk", hmat, ue)
    rx_grid += 0.01 * (rng.normal(size=rx_grid.shape)
                       + 1j * rng.normal(size=rx_grid.shape))
    samples = ofdm.modulate_slot(jnp.asarray(rx_grid.astype(np.complex64)),
                                 cell.dft_size, cell.numerology,
                                 slot_in_subframe=0, center_freq_hz=0.0)

    cond = SlotConductor(cell)
    res = cond.process_ul(UlTtiRequest(slot=SlotPoint(1, 0), srs=(cfg,)),
                          samples).resolve()
    assert len(res.srs) == 1
    ind = res.srs[0]
    assert ind.rnti == 0x22
    assert ind.wideband_h.shape == (2, 2)
    # the wideband channel report recovers the true matrix
    np.testing.assert_allclose(ind.wideband_h, hmat, atol=0.1)
    assert abs(ind.timing_advance_s) < 2e-7
    assert ind.snr_db > 15
