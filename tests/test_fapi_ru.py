"""FAPI validators + message bufferer + RU abstraction + PUCCH F1 batch."""

import numpy as np
import jax.numpy as jnp
import pytest

from srsran_tpu.phy.slot_programs import CellConfig
from srsran_tpu.phy.upper.pdsch import PdschConfig
from srsran_tpu.phy.upper.pusch import PuschConfig
from srsran_tpu.phy.upper.pucch import (PucchF1Config, detect_format1_batch,
                                        _f01_sequence, _occ)
from srsran_tpu.fapi.messages import DlTtiRequest, TxDataRequest, UlTtiRequest
from srsran_tpu.fapi import validators
from srsran_tpu.fapi.bufferer import MessageBufferer
from srsran_tpu.ran.slot_point import SlotPoint
from srsran_tpu.ru import RuDummy, RuFile

CELL = CellConfig(nof_ports=2, nof_rb=52, dft_size=1024, numerology=1)


def _pdsch(**kw):
    base = dict(rnti=1, rb_start=0, rb_count=20, first_symbol=1,
                nof_symbols=12, modulation="qam16", target_code_rate=0.5,
                tbs=3624, nof_layers=1, dmrs_symbols=(2, 11))
    base.update(kw)
    return PdschConfig(**base)


def test_validators_catch_bad_pdsch():
    slot = SlotPoint(1, 0)
    ok = DlTtiRequest(slot=slot, pdsch=(_pdsch(),))
    validators.validate_dl_tti(ok, CELL)
    with pytest.raises(validators.ValidationError, match="PRB range"):
        validators.validate_dl_tti(
            DlTtiRequest(slot=slot, pdsch=(_pdsch(rb_start=40, rb_count=20),)),
            CELL)
    with pytest.raises(validators.ValidationError, match="capacity"):
        validators.validate_dl_tti(
            DlTtiRequest(slot=slot, pdsch=(_pdsch(tbs=200000),)), CELL)
    with pytest.raises(validators.ValidationError, match="DM-RS"):
        validators.validate_dl_tti(
            DlTtiRequest(slot=slot, pdsch=(_pdsch(dmrs_symbols=(13,)),)), CELL)


def test_validators_tx_data_mismatch():
    slot = SlotPoint(1, 0)
    dl = DlTtiRequest(slot=slot, pdsch=(_pdsch(),))
    with pytest.raises(validators.ValidationError, match="payload count"):
        validators.validate_tx_data(TxDataRequest(slot=slot), dl)
    bad = TxDataRequest(slot=slot,
                        pdsch_payloads=(np.zeros(100, np.int8),))
    with pytest.raises(validators.ValidationError, match="TBS"):
        validators.validate_tx_data(bad, dl)


def test_validators_ul():
    slot = SlotPoint(1, 0)
    # 2-layer MMSE is supported here (beyond the reference); the layer cap
    # is 4 (the reference rejects PUSCH above 1 layer).
    bad = PuschConfig(rnti=1, rb_start=0, rb_count=10, first_symbol=0,
                      nof_symbols=14, modulation="qpsk",
                      target_code_rate=0.3, tbs=100, nof_layers=5,
                      equalizer="mmse", dmrs_symbols=(2,))
    with pytest.raises(validators.ValidationError, match="layers"):
        validators.validate_ul_tti(UlTtiRequest(slot=slot, pusch=(bad,)), CELL)


def test_message_bufferer_window():
    buf = MessageBufferer(max_advance_slots=3)
    s0 = SlotPoint(1, 100)
    buf.tick(s0)
    assert buf.push("dl_tti", s0 + 2, "msg-a")       # in window
    assert not buf.push("dl_tti", s0 + 7, "late")    # beyond window
    assert len(buf.errors) == 1
    out = buf.tick(s0 + 1)
    assert out == {}
    out = buf.tick(s0 + 2)
    assert out == {"dl_tti": "msg-a"}
    # stale message dropped + counted
    buf.push("ul_tti", s0 + 3, "msg-b")
    buf.tick(s0 + 5)
    assert any(e.kind == "ul_tti" for e in buf.errors)


def test_ru_dummy_loopback_with_channel():
    ru = RuDummy(2, channel_fn=lambda s: 0.5 * s)
    x = (np.arange(20).reshape(2, 10) + 1j).astype(np.complex64)
    ru.send_dl(x, 0)
    out, ts = ru.receive_ul(10)
    np.testing.assert_allclose(out, 0.5 * x)


def test_ru_file_record_replay(tmp_path):
    p = str(tmp_path / "dl.sio")
    ru = RuFile(2, 61.44e6, dl_path=p)
    x = (np.random.default_rng(0).normal(size=(2, 64))
         + 1j * np.random.default_rng(1).normal(size=(2, 64))).astype(np.complex64)
    ru.send_dl(x, 0)
    ru.stop()
    rr = RuFile(2, 61.44e6, ul_path=p)
    out, ts = rr.receive_ul(64)
    np.testing.assert_allclose(out, x)
    assert rr.receive_ul(1) is None   # exhausted
    rr.stop()


def test_pucch_f1_batch_multiplexed_users():
    """Three users on one PRB with different (ics, occ); all detected."""
    common = PucchF1Config(prb=1, start_symbol=0, nof_symbols=8,
                           initial_cyclic_shift=0, time_domain_occ=0,
                           n_id=9, slot=3, nof_harq_bits=1)
    users = ((0, 0, 1), (4, 0, 1), (0, 1, 2))
    bits = {0: [1], 1: [0], 2: [1, 0]}
    rng = np.random.default_rng(0)
    g = np.zeros((2, 14, 120), dtype=np.complex64)
    n_data = common.nof_symbols // 2
    n_dmrs = common.nof_symbols - n_data
    gains = [0.9, 0.8 * np.exp(0.5j), 0.7 * np.exp(-0.9j)]
    for ui, (ics, occ, nb) in enumerate(users):
        if nb == 1:
            d = (1 - 2 * bits[ui][0]) * (1 + 1j) / np.sqrt(2)
        else:
            d = ((1 - 2 * bits[ui][0]) + 1j * (1 - 2 * bits[ui][1])) / np.sqrt(2)
        occ_d, occ_m = _occ(occ, n_data), _occ(occ, n_dmrs)
        di = mi = 0
        for s in range(common.nof_symbols):
            l = common.start_symbol + s
            seq = _f01_sequence(common.n_id, common.slot, l, ics)
            if s % 2 == 0:
                val = seq * occ_m[mi]; mi += 1
            else:
                val = d * seq * occ_d[di]; di += 1
            g[:, l, 12:24] += gains[ui] * val[None, :]
    g += 0.03 * (rng.normal(size=g.shape) + 1j * rng.normal(size=g.shape))
    res = detect_format1_batch(jnp.asarray(g.astype(np.complex64)), common,
                               users)
    for ui, r in enumerate(res):
        assert bool(r["detected"]), ui
        np.testing.assert_array_equal(np.asarray(r["harq_bits"]), bits[ui])
