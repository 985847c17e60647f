"""End-to-end slot conductor: FAPI requests -> DL samples -> channel -> UL
indications, including HARQ retransmission across slots."""

import numpy as np
import jax.numpy as jnp

from srsran_tpu.phy.slot_programs import CellConfig
from srsran_tpu.phy.upper.ssb import SsbConfig
from srsran_tpu.phy.upper.pdsch import PdschConfig
from srsran_tpu.phy.upper.pdcch import PdcchConfig, CoresetConfig
from srsran_tpu.phy.upper.pusch import PuschConfig
from srsran_tpu.phy.upper.csi_rs import CsiRsConfig
from srsran_tpu.fapi.messages import DlTtiRequest, TxDataRequest, UlTtiRequest
from srsran_tpu.fapi.conductor import SlotConductor
from srsran_tpu.ran.slot_point import SlotPoint

CELL = CellConfig(nof_ports=2, nof_rb=52, dft_size=1024, numerology=1,
                  center_freq_hz=3.5e9)


def test_dl_slot_program():
    rng = np.random.default_rng(0)
    cond = SlotConductor(CELL)
    slot = SlotPoint(1, 40)
    ssb = SsbConfig(phys_cell_id=101, ssb_idx=0, l_max=8, sfn=slot.sfn,
                    first_symbol=2, first_subcarrier=48)
    coreset = CoresetConfig(rb_start=0, nof_rb=24, start_symbol=0, duration=1)
    pdcch = PdcchConfig(coreset=coreset, rnti=0x4601, aggregation_level=4,
                        cce_index=0, payload_bits=40, n_id=101, n_id_data=101)
    pdsch = PdschConfig(rnti=0x4601, rb_start=30, rb_count=20, first_symbol=1,
                        nof_symbols=12, modulation="qam16",
                        target_code_rate=0.5, tbs=3624, nof_layers=2,
                        n_id=101, dmrs_symbols=(2, 11),
                        slot_in_frame=slot.slot_index)
    csi = CsiRsConfig(row=1, rb_start=0, rb_count=52, symbol=13, k0=0,
                      scrambling_id=101, slot_in_frame=slot.slot_index)
    dl = DlTtiRequest(slot=slot, ssb=(ssb,), pdcch=(pdcch,), pdsch=(pdsch,),
                      csi_rs=(csi,))
    tx = TxDataRequest(
        slot=slot,
        pdsch_payloads=(rng.integers(0, 2, pdsch.tbs).astype(np.int8),),
        pdcch_payloads=(rng.integers(0, 2, 40).astype(np.int8),),
        ssb_mib=(rng.integers(0, 2, 24).astype(np.int8),))
    samples, grid = cond.process_dl(dl, tx)
    assert samples.shape == (2, CELL.slot_samples(slot.subframe_slot_index))
    g = np.asarray(grid)
    assert np.count_nonzero(g) > 5000
    # power sanity: non-empty symbols on port 0
    assert np.abs(np.asarray(samples)).max() > 0


def test_ul_slot_with_harq_retransmission():
    rng = np.random.default_rng(1)
    cond = SlotConductor(CELL)

    # UE-side TX emulation via the DL chain blocks (same scrambling/DMRS).
    from srsran_tpu.phy.upper import pdsch as pdsch_mod
    from srsran_tpu.ops import ofdm

    tbs = 4224
    payload = rng.integers(0, 2, tbs).astype(np.int8)

    def ue_tx(rv):
        cfg = pdsch_mod.PdschConfig(
            rnti=0x22, rb_start=0, rb_count=48, first_symbol=0,
            nof_symbols=14, modulation="qam64", target_code_rate=0.8,
            tbs=tbs, nof_layers=1, rv=rv, n_id=33, dmrs_symbols=(2, 7, 11),
            slot_in_frame=4)
        grid = jnp.zeros((1, 14, CELL.nof_sc), dtype=jnp.complex64)
        grid = pdsch_mod.process(grid, jnp.asarray(payload), cfg,
                                 precoding=np.eye(1, dtype=np.complex64))
        return ofdm.modulate_slot(grid, CELL.dft_size, CELL.numerology,
                                  center_freq_hz=CELL.center_freq_hz)

    def rx_cfg(rv):
        return PuschConfig(
            rnti=0x22, rb_start=0, rb_count=48, first_symbol=0,
            nof_symbols=14, modulation="qam64", target_code_rate=0.8,
            tbs=tbs, nof_layers=1, rv=rv, n_id=33, dmrs_symbols=(2, 7, 11),
            slot_in_frame=4)

    sigma = 0.22   # hard for rate ~0.66 qam64 in one shot
    slot = SlotPoint(1, 4)

    def channel(tx):
        t = np.asarray(tx)
        rx = np.stack([0.9 * t[0], 0.7 * np.exp(0.5j) * t[0]])
        rx += (rng.normal(0, sigma / np.sqrt(2), rx.shape)
               + 1j * rng.normal(0, sigma / np.sqrt(2), rx.shape))
        return jnp.asarray(rx.astype(np.complex64))

    ul0 = UlTtiRequest(slot=slot, pusch=(rx_cfg(0),),
                       pusch_harq=((3, True),))
    res0 = cond.process_ul(ul0, channel(ue_tx(0))).resolve()
    first_ok = res0.crc[0].tb_crc_ok

    if not first_ok:
        ul2 = UlTtiRequest(slot=slot + 8, pusch=(rx_cfg(2),),
                           pusch_harq=((3, False),))
        res2 = cond.process_ul(ul2, channel(ue_tx(2))).resolve()
        assert res2.crc[0].tb_crc_ok, "HARQ retransmission failed to decode"
        np.testing.assert_array_equal(res2.rx_data[0].payload, payload)
    else:
        np.testing.assert_array_equal(res0.rx_data[0].payload, payload)
    assert res0.crc[0].snr_db > 5
