"""Round-3 FAPI wiring: PUCCH F3/F4 through the conductor, PT-RS-enabled
PDSCH slots, PRS PDUs, ul_dci_request, and per-port CSI indications."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from srsran_tpu.phy.slot_programs import CellConfig
from srsran_tpu.phy.upper.pdsch import PdschConfig, PdschPtrs
from srsran_tpu.phy.upper.pdcch import PdcchConfig, CoresetConfig
from srsran_tpu.phy.upper.pusch import PuschConfig
from srsran_tpu.phy.upper.pucch import PucchF3Config, f3_encode
from srsran_tpu.phy.upper.ptrs_prs import PrsConfig
from srsran_tpu.fapi.messages import (DlTtiRequest, TxDataRequest,
                                      UlTtiRequest, UlDciRequest)
from srsran_tpu.fapi.conductor import SlotConductor
from srsran_tpu.ran.slot_point import SlotPoint

CELL = CellConfig(nof_ports=2, nof_rb=52, dft_size=1024, numerology=1,
                  center_freq_hz=3.5e9)


def _f3_waveform(cfg, uci_bits, sigma=0.02, seed=0):
    """UE-side F3/F4 TX into a 2-port waveform with noise."""
    from srsran_tpu.ops import ofdm
    rng = np.random.default_rng(seed)
    block = np.asarray(f3_encode(jnp.asarray(uci_bits), cfg))
    grid = np.zeros((2, 14, CELL.nof_sc), np.complex64)
    sc0 = cfg.rb_start * 12
    gains = (0.9, 0.6 * np.exp(0.4j))
    for p, g in enumerate(gains):
        grid[p, cfg.start_symbol:cfg.start_symbol + cfg.nof_symbols,
             sc0:sc0 + cfg.nof_rb * 12] = g * block
    grid += (rng.normal(0, sigma, grid.shape)
             + 1j * rng.normal(0, sigma, grid.shape)).astype(np.complex64)
    return ofdm.modulate_slot(jnp.asarray(grid), CELL.dft_size,
                              CELL.numerology,
                              center_freq_hz=CELL.center_freq_hz)


def test_pucch_f3_uci_roundtrip_through_conductor():
    slot = SlotPoint(1, 7)
    cfg = PucchF3Config(rb_start=4, nof_rb=2, start_symbol=0, nof_symbols=10,
                        rnti=0x31, n_id=17, n_id_hopping=17, nof_uci_bits=16,
                        slot=slot.slot_index)
    rng = np.random.default_rng(5)
    uci = rng.integers(0, 2, cfg.nof_uci_bits).astype(np.int8)
    samples = _f3_waveform(cfg, uci)
    cond = SlotConductor(CELL)
    ul = UlTtiRequest(slot=slot, pucch_f3=(cfg,))
    res = cond.process_ul(ul, samples).resolve()
    assert len(res.uci) == 1
    ind = res.uci[0]
    assert ind.rnti == 0x31 and ind.detected
    np.testing.assert_array_equal(ind.csi_bits, uci)


def test_pucch_f4_occ_roundtrip_through_conductor():
    slot = SlotPoint(1, 3)
    cfg = PucchF3Config(rb_start=10, nof_rb=1, start_symbol=2,
                        nof_symbols=12, rnti=0x44, n_id=9, n_id_hopping=9,
                        nof_uci_bits=8, slot=slot.slot_index,
                        occ_length=2, occ_index=1)
    rng = np.random.default_rng(6)
    uci = rng.integers(0, 2, cfg.nof_uci_bits).astype(np.int8)
    samples = _f3_waveform(cfg, uci, seed=6)
    cond = SlotConductor(CELL)
    ul = UlTtiRequest(slot=slot, pucch_f4=(cfg,))
    res = cond.process_ul(ul, samples).resolve()
    assert res.uci[0].detected
    np.testing.assert_array_equal(res.uci[0].csi_bits, uci)


def test_pdsch_with_ptrs_through_conductor():
    """PT-RS PDUs: data maps around PT-RS REs and the TB still decodes."""
    rng = np.random.default_rng(7)
    slot = SlotPoint(1, 2)
    ptrs = PdschPtrs(time_density=1, freq_density=2, re_offset=0, port=0)
    pd = PdschConfig(rnti=0x55, rb_start=0, rb_count=48, first_symbol=0,
                     nof_symbols=14, modulation="qam16",
                     target_code_rate=0.5, tbs=3624, nof_layers=1,
                     n_id=7, dmrs_symbols=(2, 11),
                     slot_in_frame=slot.slot_index, ptrs=ptrs)
    payload = rng.integers(0, 2, pd.tbs).astype(np.int8)
    cond = SlotConductor(CELL)
    dl = DlTtiRequest(slot=slot, pdsch=(pd,))
    tx = TxDataRequest(slot=slot, pdsch_payloads=(payload,))
    samples, grid = cond.process_dl(dl, tx)
    g = np.asarray(grid)
    # PT-RS REs present: symbol 0 (non-DMRS), every 2nd RB, RE offset 0
    from srsran_tpu.phy.upper.ptrs_prs import PtrsConfig, ptrs_positions
    pos = ptrs_positions(PtrsConfig(
        rb_start=0, rb_count=48, first_symbol=0, nof_symbols=14,
        dmrs_symbols=(2, 11)))
    assert len(pos) > 0
    assert np.all(np.abs(g[0, pos[:, 0], pos[:, 1]]) > 0.1)
    # the same allocation WITHOUT ptrs decodes to a different G
    from srsran_tpu.phy.upper.pdsch import nof_data_re
    assert nof_data_re(pd) < nof_data_re(dataclasses.replace(pd, ptrs=None))
    # receive side: decode the TB around the PT-RS REs
    ul_cfg = PuschConfig(rnti=0x55, rb_start=0, rb_count=48, first_symbol=0,
                         nof_symbols=14, modulation="qam16",
                         target_code_rate=0.5, tbs=pd.tbs, nof_layers=1,
                         n_id=7, dmrs_symbols=(2, 11),
                         slot_in_frame=slot.slot_index)
    # PUSCH has no PT-RS field: decode directly from the grid data REs
    from srsran_tpu.phy.upper import pdsch as pdsch_mod
    from srsran_tpu.ops.modulation import demodulate, BITS_PER_SYMBOL
    from srsran_tpu.ops.scrambling import descramble_llrs
    plan = pdsch_mod._data_re_plan(0, 48, 0, 14, (2, 11), 2, ptrs)
    syms = g[0, plan[:, 0], plan[:, 1]]
    llr = descramble_llrs(
        demodulate(jnp.asarray(syms)[None],
                   jnp.full((1, len(syms)), 1e-4, jnp.float32), "qam16"),
        (0x55 << 15) + 7)[0]
    from srsran_tpu.ran.ldpc_params import segment_tb, select_base_graph
    from srsran_tpu.phy.upper import sch_decoder
    seg = segment_tb(pd.tbs, select_base_graph(pd.tbs, 0.5))
    e_sizes = pdsch_mod._cb_rate_match_sizes(llr.shape[0],
                                             seg.nof_codeblocks, 4, 1)
    dec = sch_decoder.decode(llr, seg, e_sizes, 0, 4, pd.tbs)
    assert bool(dec.tb_crc_ok)
    np.testing.assert_array_equal(np.asarray(dec.tb_bits), payload)


def test_prs_pdu_through_conductor():
    slot = SlotPoint(1, 5)
    prs = PrsConfig(rb_start=0, rb_count=24, first_symbol=2, nof_symbols=4,
                    comb_size=4, comb_offset=1, n_id_prs=321,
                    slot_in_frame=slot.slot_index)
    cond = SlotConductor(CELL)
    dl = DlTtiRequest(slot=slot, prs=(prs,))
    tx = TxDataRequest(slot=slot)
    _, grid = cond.process_dl(dl, tx)
    g = np.asarray(grid)
    # comb-4 staggered pattern occupies symbols 2..5 on port 0
    from srsran_tpu.phy.upper.ptrs_prs import _PRS_SYMBOL_OFFSETS
    for i, l in enumerate(range(2, 6)):
        k0 = (1 + _PRS_SYMBOL_OFFSETS[4][i]) % 4
        sc = k0 + 4 * np.arange(24 * 12 // 4)
        assert np.all(np.abs(g[0, l, sc]) > 0.5), l
        # only the comb REs of this symbol are occupied
        assert np.count_nonzero(g[0, l, :24 * 12]) == len(sc)
    # slot-dependence: a different slot yields a different sequence
    dl2 = DlTtiRequest(slot=slot + 2, prs=(
        dataclasses.replace(prs, slot_in_frame=(slot + 2).slot_index),))
    _, grid2 = cond.process_dl(dl2, tx)
    assert not np.allclose(np.asarray(grid2), g)


def test_ul_dci_request_rides_dl_slot():
    rng = np.random.default_rng(9)
    slot = SlotPoint(1, 1)
    coreset = CoresetConfig(rb_start=0, nof_rb=24, start_symbol=0, duration=1)
    dl_pdcch = PdcchConfig(coreset=coreset, rnti=0x4601, aggregation_level=2,
                           cce_index=0, payload_bits=40, n_id=1, n_id_data=1)
    ul_pdcch = PdcchConfig(coreset=coreset, rnti=0x4601, aggregation_level=2,
                           cce_index=2, payload_bits=36, n_id=1, n_id_data=1)
    dl = DlTtiRequest(slot=slot, pdcch=(dl_pdcch,))
    tx = TxDataRequest(
        slot=slot,
        pdcch_payloads=(rng.integers(0, 2, 40).astype(np.int8),))
    ul_dci = UlDciRequest(
        slot=slot, pdcch=(ul_pdcch,),
        payloads=(rng.integers(0, 2, 36).astype(np.int8),))
    cond = SlotConductor(CELL)
    _, grid_both = cond.process_dl(dl, tx, ul_dci=ul_dci)
    _, grid_dl = cond.process_dl(dl, tx)
    g_both, g_dl = np.asarray(grid_both), np.asarray(grid_dl)
    # the UL grant occupies extra CORESET REs beyond the DL-only slot
    assert np.count_nonzero(g_both[0, 0]) > np.count_nonzero(g_dl[0, 0])


def test_per_port_csi_in_crc_indication():
    rng = np.random.default_rng(11)
    from srsran_tpu.phy.upper import pdsch as pdsch_mod
    from srsran_tpu.ops import ofdm
    tbs = 2112
    cfg = PuschConfig(rnti=0x66, rb_start=0, rb_count=24, first_symbol=0,
                      nof_symbols=14, modulation="qpsk",
                      target_code_rate=0.4, tbs=tbs, nof_layers=1,
                      n_id=3, dmrs_symbols=(2, 7, 11))
    ue = pdsch_mod.PdschConfig(
        rnti=0x66, rb_start=0, rb_count=24, first_symbol=0, nof_symbols=14,
        modulation="qpsk", target_code_rate=0.4, tbs=tbs, nof_layers=1,
        n_id=3, dmrs_symbols=(2, 7, 11))
    payload = rng.integers(0, 2, tbs).astype(np.int8)
    grid = jnp.zeros((1, 14, CELL.nof_sc), jnp.complex64)
    grid = pdsch_mod.process(grid, jnp.asarray(payload), ue,
                             precoding=np.eye(1, dtype=np.complex64))
    tx = np.asarray(ofdm.modulate_slot(grid, CELL.dft_size, CELL.numerology,
                                       center_freq_hz=CELL.center_freq_hz))
    # port 0 strong, port 1 weak: per-port SNR must differ
    rx = np.stack([1.0 * tx[0], 0.1 * tx[0]])
    rx += 0.01 * (rng.normal(size=rx.shape) + 1j * rng.normal(size=rx.shape))
    cond = SlotConductor(CELL)
    ul = UlTtiRequest(slot=SlotPoint(1, 0), pusch=(cfg,))
    res = cond.process_ul(ul, jnp.asarray(rx.astype(np.complex64))).resolve()
    pdu = res.crc[0]
    assert pdu.tb_crc_ok
    assert pdu.snr_port_db.shape == (2,)
    assert pdu.snr_port_db[0] > pdu.snr_port_db[1] + 10
    assert pdu.epre_port[0] > pdu.epre_port[1]
    assert pdu.evm < 0.2         # real EVM on a clean channel
    assert pdu.nof_ldpc_iterations >= 1
