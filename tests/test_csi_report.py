"""CSI report sizing/packing/unpacking + DL link adaptation loop.

Mirrors lib/ran/csi_report/csi_report_on_puxch_helpers.cpp (field widths),
csi_report_on_pucch_helpers.cpp (padded single report), and the scheduler
side of ue_link_adaptation (CQI -> MCS, RI -> layers, PMI -> precoding).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from srsran_tpu.ran import csi_report as csi
from srsran_tpu.ran.precoding_codebooks import pmi_to_index


CFG4 = csi.CsiReportConfig(pmi_codebook="typeI_4ports")
CFG2 = csi.CsiReportConfig(pmi_codebook="two", ri_restriction=0b11)


def test_field_sizes_match_reference_tables():
    # 4 ports, TypeI SP mode1 (csi_report_get_pmi_sizes_typeI_single_panel
    # _mode1): ri=1 -> i11=3,i2=2; ri=2 -> i11=3,i13=1,i2=1; ri=3/4 -> 3+1
    assert csi.pmi_sizes(CFG4, 1) == csi.PmiSizes(i_1_1=3, i_2=2)
    assert csi.pmi_sizes(CFG4, 2) == csi.PmiSizes(i_1_1=3, i_1_3=1, i_2=1)
    assert csi.pmi_sizes(CFG4, 3) == csi.PmiSizes(i_1_1=3, i_2=1)
    assert csi.pmi_sizes(CFG4, 4) == csi.PmiSizes(i_1_1=3, i_2=1)
    # 2 ports: 2 bits ri=1, 1 bit ri=2 (csi_report_get_size_pmi_two_port)
    assert csi.pmi_sizes(CFG2, 1).total == 2
    assert csi.pmi_sizes(CFG2, 2).total == 1
    # RI width: log2_ceil(allowed), capped (2 for 4 ports, 1 for 2 ports)
    assert csi.ri_size(CFG4) == 2
    assert csi.ri_size(CFG2) == 1
    # part1 = CRI + RI + 4-bit wideband CQI
    assert csi.part1_size(CFG4) == 0 + 2 + 4
    # LI: min(2, log2_ceil(ri))
    assert csi.li_size(CFG4, 1) == 0
    assert csi.li_size(CFG4, 2) == 1
    assert csi.li_size(CFG4, 4) == 2


@pytest.mark.parametrize("cfg", [CFG4, CFG2])
@pytest.mark.parametrize("ri", [1, 2, 3, 4])
def test_pusch_pack_unpack_roundtrip(cfg, ri):
    if ri not in cfg.allowed_ranks():
        pytest.skip("rank not allowed")
    sz = csi.pmi_sizes(cfg, ri)
    data = csi.CsiReportData(
        ri=ri, wideband_cqi=11, li=(1 << csi.li_size(cfg, ri)) - 1,
        i_1_1=(1 << sz.i_1_1) - 1, i_1_3=(1 << sz.i_1_3) - 1,
        i_2=(1 << sz.i_2) - 1)
    b1, b2 = csi.pack(data, cfg)
    assert b1.size == csi.part1_size(cfg)
    assert b2.size == csi.part2_size(cfg, ri)
    got = csi.unpack(b1, b2, cfg)
    assert (got.ri, got.wideband_cqi, got.li) == (ri, 11, data.li)
    assert (got.i_1_1, got.i_1_3, got.i_2) == (data.i_1_1, data.i_1_3,
                                               data.i_2)


@pytest.mark.parametrize("ri", [1, 2, 3, 4])
def test_pucch_pack_unpack_with_padding(ri):
    sz = csi.pmi_sizes(CFG4, ri)
    data = csi.CsiReportData(ri=ri, wideband_cqi=7, i_1_1=min(5, (1 << sz.i_1_1) - 1),
                             i_1_3=(1 << sz.i_1_3) - 1, i_2=(1 << sz.i_2) - 1)
    bits = csi.pack_pucch(data, CFG4)
    assert bits.size == csi.pucch_size(CFG4)     # fixed size, all ranks
    got = csi.unpack_pucch(bits, CFG4)
    assert (got.ri, got.wideband_cqi) == (ri, 7)
    assert (got.i_1_1, got.i_1_3, got.i_2) == (data.i_1_1, data.i_1_3,
                                               data.i_2)


def test_part2_correspondence_selects_by_ri():
    from srsran_tpu.ran.uci_on_pusch import uci_part2_get_size
    descr = csi.part2_correspondence(CFG4)
    for ri in (1, 2, 3, 4):
        data = csi.CsiReportData(ri=ri, wideband_cqi=3)
        b1, _ = csi.pack(data, CFG4)
        assert uci_part2_get_size(b1, descr) == csi.part2_size(CFG4, ri)


def test_cqi_to_mcs_monotone_and_bounds():
    prev = -1
    for cqi in range(16):
        m = csi.cqi_to_mcs(cqi, "qam64")
        assert m >= prev
        prev = m
    assert csi.cqi_to_mcs(0) == 0
    assert csi.cqi_to_mcs(15, "qam64") >= 26
    assert csi.cqi_to_mcs(15, "qam256") >= 25
    # efficiency never exceeds the CQI's (the ue_link_adaptation contract)
    from srsran_tpu.ran.mcs_tbs import TABLES, QM
    for cqi in range(1, 16):
        m = csi.cqi_to_mcs(cqi, "qam64")
        if m == 0:
            continue        # MCS 0 is the floor even when its SE is higher
        mod, r = TABLES["qam64"][m]
        assert QM[mod] * r / 1024.0 <= csi.CQI_TABLE_1_SE[cqi] + 1e-9


# ------------------------------------------------- scheduler adaptation

def _mini_sched(nof_ports=4, csi_period=10, ul_buffer=-1):
    from srsran_tpu.mac.scheduler import CellScheduler, SchedUeConfig
    from srsran_tpu.phy.slot_programs import CellConfig
    from srsran_tpu.ran.tdd import TddPattern
    cell = CellConfig(nof_rb=52, numerology=1, nof_ports=nof_ports,
                      dft_size=1024)
    return CellScheduler(
        cell, 1, ues=[SchedUeConfig(rnti=0x4601, nof_layers_dl=2,
                                    ul_buffer_bytes=ul_buffer)],
        tdd=TddPattern(periodicity_slots=2, nof_dl_slots=1, nof_ul_slots=1),
        csi_period_slots=csi_period)


def test_scheduler_csi_drives_dl_mcs_rank_and_pmi():
    from srsran_tpu.ran.slot_point import SlotPoint
    sched = _mini_sched()
    # default grant: configured MCS 27, 2 layers, no precoding
    dl, _, _ = sched.slot_indication(SlotPoint(1, 0))
    assert dl.pdsch[0].nof_layers == 2 and dl.pdsch[0].precoding is None
    base_mod = dl.pdsch[0].modulation
    # low-CQI rank-1 report steps MCS down and layers to 1
    rep = csi.CsiReportData(ri=1, wideband_cqi=3, i_1_1=5, i_2=1)
    sched.handle_csi(0x4601, csi.pack_pucch(rep, sched.csi_cfg))
    dl2, _, _ = sched.slot_indication(SlotPoint(1, 2))
    p = dl2.pdsch[0]
    assert p.nof_layers == 1
    assert p.modulation == "qpsk" and base_mod != "qpsk"
    assert p.precoding is not None
    want = pmi_to_index(4, ri=1, i_1_1=5, i_2=1)
    assert set(p.precoding.pm_indices) == {want}
    from srsran_tpu.ran.precoding_codebooks import nof_prgs
    assert len(p.precoding.pm_indices) == nof_prgs(
        p.rb_start, p.rb_count, sched.dl_prg_size)
    # high-CQI rank-2 report steps MCS back up with the rank-2 PMI
    rep2 = csi.CsiReportData(ri=2, wideband_cqi=15, i_1_1=2, i_1_3=1, i_2=0)
    sched.handle_csi(0x4601, csi.pack_pucch(rep2, sched.csi_cfg))
    dl3, _, _ = sched.slot_indication(SlotPoint(1, 4))
    p3 = dl3.pdsch[0]
    assert p3.nof_layers == 2 and p3.modulation == "qam64"
    assert set(p3.precoding.pm_indices) == {
        pmi_to_index(4, ri=2, i_1_1=2, i_1_3=1, i_2=0)}


def test_scheduler_schedules_csi_occasions_and_routes_indications():
    """Mini closed loop: F2 occasion scheduled -> UE packs + transmits ->
    gNB process_format2 decodes -> handle_uci_indications -> dl_mcs."""
    from srsran_tpu.ran.slot_point import SlotPoint
    from srsran_tpu.phy.upper import pucch as pucch_mod

    # no UL data -> no PUSCH grant -> the CSI stays on PUCCH F2
    sched = _mini_sched(csi_period=2, ul_buffer=0)
    slot = SlotPoint(1, 1)          # UL slot, csi period hits
    _, _, ul = sched.slot_indication(slot)
    assert not ul.pusch and len(ul.pucch_f2) == 1
    fc = ul.pucch_f2[0]
    assert fc.nof_uci_bits == csi.pucch_size(sched.csi_cfg)
    # UE side
    rep = csi.CsiReportData(ri=1, wideband_cqi=4, i_1_1=3, i_2=2)
    bits = csi.pack_pucch(rep, sched.csi_cfg)
    grid = jnp.zeros((4, 14, 52 * 12), jnp.complex64)
    grid = pucch_mod.transmit_format2(grid, fc, bits)
    # gNB side
    res = pucch_mod.process_format2(grid, fc)
    assert bool(res["valid"])
    np.testing.assert_array_equal(np.asarray(res["uci_bits"]), bits)

    class Pdu:
        detected = True
        harq_bits = None
        csi_bits = np.asarray(res["uci_bits"])
    sched.handle_uci_indications(slot.count, [Pdu()])
    ue = sched.ues[0x4601]
    assert ue.dl_mcs == csi.cqi_to_mcs(4, "qam64")
    assert ue.last_csi.i_1_1 == 3 and ue.last_csi.ri == 1


def test_csi_on_pusch_roundtrip_adapts_dl():
    """Aperiodic CSI multiplexed ON PUSCH (rank-restricted request ->
    static part sizes): scheduler grant carries o_csi1/o_csi2; UE packs
    and multiplexes via ue_tx; conductor decodes; handle_csi_pusch steps
    the DL MCS."""
    import jax.numpy as jnp
    from srsran_tpu.fapi.conductor import SlotConductor
    from srsran_tpu.fapi.messages import UlTtiRequest
    from srsran_tpu.phy.upper import ue_tx
    from srsran_tpu.ran.slot_point import SlotPoint

    sched = _mini_sched(csi_period=2)
    cond = SlotConductor(sched.cell)
    slot = SlotPoint(1, 1)             # UL slot, csi period hits
    _, _, ul = sched.slot_indication(slot)
    assert len(ul.pusch) == 1
    pu = ul.pusch[0]
    # the report moved onto PUSCH: sizes set, no F2 for this UE
    assert pu.uci.o_csi1 == csi.part1_size(sched.ues[0x4601].pusch_csi_cfg)
    assert pu.uci.o_csi2 > 0
    assert not ul.pucch_f2
    cfg_r = sched.ues[0x4601].pusch_csi_cfg
    assert cfg_r.allowed_ranks() == (2,)       # rank-restricted
    rep = csi.CsiReportData(ri=2, wideband_cqi=9, i_1_1=4, i_1_3=1, i_2=0)
    b1, b2 = csi.pack(rep, cfg_r)
    assert b1.size == pu.uci.o_csi1 and b2.size == pu.uci.o_csi2
    rng = np.random.default_rng(0)
    tb = rng.integers(0, 2, pu.tbs).astype(np.int8)
    grid = ue_tx.pusch_transmit(pu, tb, csi1=b1, csi2=b2,
                                nof_sc=sched.cell.nof_sc)
    # 2 rx ports see the single-layer TX
    rx_grid = jnp.concatenate([jnp.asarray(grid)] * sched.cell.nof_ports +
                              [], axis=0)[:sched.cell.nof_ports]
    from srsran_tpu.ops import ofdm
    rx = ofdm.modulate_slot(rx_grid, sched.cell.dft_size,
                            sched.cell.numerology,
                            center_freq_hz=sched.cell.center_freq_hz)
    res = cond.process_ul(ul, rx).resolve()
    assert res.crc[0].tb_crc_ok
    u = [x for x in res.uci if x.source == "pusch"][0]
    np.testing.assert_array_equal(np.asarray(u.csi_bits), b1)
    np.testing.assert_array_equal(np.asarray(u.csi2_bits), b2)
    sched.handle_csi_pusch(u.rnti, u.csi_bits, u.csi2_bits)
    ue = sched.ues[0x4601]
    assert ue.dl_mcs == csi.cqi_to_mcs(9, "qam64")
    assert ue.last_csi.i_1_1 == 4 and ue.last_csi.ri == 2
