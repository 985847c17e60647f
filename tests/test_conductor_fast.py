"""Conductor fast-path tests: packed-byte payloads, the fused staged slot
program, and the phase cache.

Mirrors the reference translator's slot-dispatch behavior
(lib/fapi_adaptor/phy/fapi_to_phy_translator.cpp:333/534): repeat slots
reuse pre-resolved state; payloads ride the FAPI wire format (packed bytes,
include/srsran/fapi/messages/tx_data_request.h) in ONE fused transfer.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from srsran_tpu.phy.slot_programs import CellConfig
from srsran_tpu.phy.upper.pdsch import PdschConfig
from srsran_tpu.phy.upper.pdcch import PdcchConfig, CoresetConfig
from srsran_tpu.phy.upper.pusch import PuschConfig
from srsran_tpu.phy.upper.pucch import PucchF1Config
from srsran_tpu.fapi.messages import (DlTtiRequest, TxDataRequest,
                                      UlTtiRequest)
from srsran_tpu.fapi.conductor import (SlotConductor, pack_payload_blob,
                                       _dl_payload_layout)
from srsran_tpu.fapi.validators import ValidationError
from srsran_tpu.ran.slot_point import SlotPoint


CELL = CellConfig(nof_ports=2, nof_rb=24, dft_size=512, numerology=1)
PDCCH = PdcchConfig(
    coreset=CoresetConfig(rb_start=0, nof_rb=24, start_symbol=0, duration=1),
    rnti=0x4601, aggregation_level=2, cce_index=0, payload_bits=40,
    n_id=1, n_id_data=1)
PDSCH = PdschConfig(rnti=0x4601, rb_start=0, rb_count=24, first_symbol=1,
                    nof_symbols=12, modulation="qam16", target_code_rate=0.5,
                    tbs=8192, nof_layers=2, n_id=1, dmrs_symbols=(2, 11))
PUSCH = PuschConfig(rnti=0x17, rb_start=0, rb_count=24, first_symbol=0,
                    nof_symbols=14, modulation="qpsk", target_code_rate=0.5,
                    tbs=4096, nof_layers=1, n_id=1, dmrs_symbols=(2, 7, 11))
PUCCH = PucchF1Config(prb=0, start_symbol=0, nof_symbols=14,
                      initial_cyclic_shift=0, time_domain_occ=0, n_id=1)

RNG = np.random.default_rng(3)
SCH_BITS = RNG.integers(0, 2, PDSCH.tbs).astype(np.uint8)
DCI_BITS = RNG.integers(0, 2, 40).astype(np.uint8)


def dl_req(i):
    s = SlotPoint(1, 2 * i)
    return DlTtiRequest(
        slot=s,
        pdcch=(dataclasses.replace(PDCCH, slot_in_frame=s.slot_index),),
        pdsch=(dataclasses.replace(PDSCH, slot_in_frame=s.slot_index),))


def ul_req(i):
    s = SlotPoint(1, 2 * i)
    return UlTtiRequest(
        slot=s,
        pusch=(dataclasses.replace(PUSCH, slot_in_frame=s.slot_index),),
        pucch_f1=(dataclasses.replace(PUCCH, slot=s.slot_index),))


def tx_req(i, packed):
    if packed:
        return TxDataRequest(slot=SlotPoint(1, 2 * i),
                             pdsch_payloads=(np.packbits(SCH_BITS),),
                             pdcch_payloads=(np.packbits(DCI_BITS),))
    return TxDataRequest(slot=SlotPoint(1, 2 * i),
                         pdsch_payloads=(SCH_BITS,),
                         pdcch_payloads=(DCI_BITS,))


def test_packed_bytes_equal_bit_payloads():
    cond = SlotConductor(CELL)
    s_bits, _ = cond.process_dl(dl_req(0), tx_req(0, packed=False),
                                return_grid=False)
    s_bytes, _ = cond.process_dl(dl_req(0), tx_req(0, packed=True),
                                 return_grid=False)
    assert jnp.allclose(s_bits, s_bytes)


def test_fused_staged_matches_separate_path():
    cond = SlotConductor(CELL)
    rx = jnp.zeros((2, CELL.slot_samples(0)), jnp.complex64)
    sep_s, _ = cond.process_dl(dl_req(0), tx_req(0, True), return_grid=False)
    sep_p = cond.process_ul(ul_req(0), rx)
    staged = cond.stage_payloads([(dl_req(0), tx_req(0, True)),
                                  (dl_req(1), tx_req(1, True))])
    for k in (0, 1):
        fus_s, fus_p = cond.process_slot(dl_req(k), ul_req(k), staged, k, rx)
        ref_s, _ = cond.process_dl(dl_req(k), tx_req(k, True),
                                   return_grid=False)
        assert jnp.allclose(ref_s, fus_s)
        if k == 0:
            assert jnp.allclose(sep_p.scalars, fus_p.scalars)
            ra, rb = sep_p.resolve(), fus_p.resolve()
            assert ra.crc[0].tb_crc_ok == rb.crc[0].tb_crc_ok
            assert len(ra.uci) == len(rb.uci)
    assert jnp.allclose(sep_s, sep_s)


def test_phase_cache_hits_and_bounds():
    cond = SlotConductor(CELL)
    rx = jnp.zeros((2, CELL.slot_samples(0)), jnp.complex64)
    for rep in range(3):
        for i in range(4):
            cond.process_dl(dl_req(i), tx_req(i, True), return_grid=False)
            cond.process_ul(ul_req(i), rx)
    # 4 distinct slot-in-frame phases, re-visited without growth
    assert len(cond._dl_phases) == 4
    assert len(cond._ul_phases) == 4


def test_payload_size_validation():
    cond = SlotConductor(CELL)
    bad = TxDataRequest(slot=SlotPoint(1, 0),
                        pdsch_payloads=(SCH_BITS[:100],),
                        pdcch_payloads=(DCI_BITS,))
    with pytest.raises(ValidationError):
        cond.process_dl(dl_req(0), bad, return_grid=False)
    none = TxDataRequest(slot=SlotPoint(1, 0))
    with pytest.raises(ValidationError):
        cond.process_dl(dl_req(0), none, return_grid=False)


def test_pack_payload_blob_bit_order():
    # MSB-first like np.packbits: 0b10100000 -> bits [1,0,1,0,0,0,0,0]
    layout = _dl_payload_layout(((), (), (), (), ()), 0, 0, 0)
    assert layout[1] == 1            # empty plan still yields a 1-byte blob
    segs = (((0, 1, 3)), )
    blob = pack_payload_blob((segs, 1), (np.array([1, 0, 1], np.uint8),))
    assert blob[0] == 0b10100000


def test_stage_payloads_stride_check():
    cond = SlotConductor(CELL)
    with pytest.raises(ValidationError):
        cond.stage_payloads([(dl_req(0), tx_req(0, True))], stride=4)


def test_process_slot_batch_matches_per_slot():
    """SLOT-BATCHED throughput mode: B slots in one vmapped dispatch give
    EXACTLY the per-slot fused path's outputs (per-slot scrambling
    context is mapped over the batch; shared plan context broadcasts)."""
    cond_a = SlotConductor(CELL)
    cond_b = SlotConductor(CELL)
    b = 3
    rng = np.random.default_rng(9)
    rxs = [jnp.asarray(
        (0.1 * (rng.standard_normal((2, CELL.slot_samples(0)))
                + 1j * rng.standard_normal((2, CELL.slot_samples(0))))
         ).astype(np.complex64)) for _ in range(b)]
    reqs = [(dl_req(k), tx_req(k, True), ul_req(k)) for k in range(b)]

    st_a = cond_a.stage_payloads([(d, t) for d, t, _ in reqs])
    ref_scalars, ref_res = [], []
    for k, (d, t, u) in enumerate(reqs):
        _, pend = cond_a.process_slot(d, u, st_a, k, rxs[k])
        ref_scalars.append(np.asarray(pend.scalars))
        ref_res.append(pend.resolve())

    st_b = cond_b.stage_payloads([(d, t) for d, t, _ in reqs])
    rx_b = jnp.stack(rxs, axis=0)
    tx_b, pend_b = cond_b.process_slot_batch(
        [(d, u) for d, _, u in reqs], st_b, rx_b)
    assert tx_b.shape[0] == b
    got = pend_b.resolve()
    assert len(got) == b
    sc_b = np.asarray(pend_b.scalars)
    for k in range(b):
        np.testing.assert_allclose(sc_b[k], ref_scalars[k],
                                   rtol=2e-4, atol=2e-4)
        assert (got[k].crc[0].tb_crc_ok
                == ref_res[k].crc[0].tb_crc_ok)
        assert len(got[k].uci) == len(ref_res[k].uci)
    # distinct slot phases really were mapped (ctx differs across batch)
    assert len(cond_b._batch_fns) == 1


def test_process_slot_batch_rejects_mixed_plans():
    cond = SlotConductor(CELL)
    st = cond.stage_payloads([(dl_req(0), tx_req(0, True)),
                              (dl_req(1), tx_req(1, True))])
    rx_b = jnp.zeros((2, 2, CELL.slot_samples(0)), jnp.complex64)
    other_ul = UlTtiRequest(slot=SlotPoint(1, 2),
                            pusch=(dataclasses.replace(PUSCH, rb_count=12,
                                                       tbs=2048),))
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        cond.process_slot_batch(
            [(dl_req(0), ul_req(0)), (dl_req(1), other_ul)], st, rx_b)
