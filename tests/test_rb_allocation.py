"""RA type 0 (PRB bitmap) + VRB-to-PRB interleaved mapping for PDSCH.

Mirrors lib/phy/upper/rb_allocation.cpp (make_type0/make_type1 +
vrb_to_prb config) and TS38.211 §7.3.1.6.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from srsran_tpu.ran.rb_allocation import (vrb_to_prb_interleaved,
                                          allocated_prbs)
from srsran_tpu.phy.upper import pdsch
from srsran_tpu.ops.scrambling import scramble_bits
from srsran_tpu.ops.modulation import modulate
from srsran_tpu.ops.precoding import layer_map


def test_interleaver_is_a_permutation_with_selfmapped_last_bundle():
    for size, l in ((52, 2), (52, 4), (24, 2), (106, 4)):
        m = np.array(vrb_to_prb_interleaved(0, size, l))
        assert sorted(m.tolist()) == list(range(size))
        # last bundle maps to itself
        n_bundle = -(-size // l)
        last0 = (n_bundle - 1) * l
        for k in range(size - last0):
            assert m[last0 + k] == last0 + k
        # block interleaver: bundle j=cR+r -> f(j)=rC+c
        c = n_bundle // 2
        for j in range(n_bundle - 1):
            f = (j % 2) * c + j // 2
            assert m[j * l] == f * l


def test_allocated_prbs_modes():
    np.testing.assert_array_equal(allocated_prbs(3, 4), [3, 4, 5, 6])
    np.testing.assert_array_equal(
        allocated_prbs(0, 0, prbs=(7, 2, 11)), [2, 7, 11])
    inter = allocated_prbs(0, 4, interleaved=True, bwp_size=24)
    assert len(inter) == 4 and len(set(inter.tolist())) == 4


def _cfg(**kw):
    base = dict(rnti=0x4601, rb_start=0, rb_count=8, first_symbol=1,
                nof_symbols=12, modulation="qam16", target_code_rate=0.5,
                tbs=824, nof_layers=1, dmrs_symbols=(2, 7), n_id=7,
                dmrs_scrambling_id=7)
    base.update(kw)
    return pdsch.PdschConfig(**base)


def test_type0_scattered_occupies_exactly_the_allocated_prbs():
    nof_sc = 24 * 12
    rng = np.random.default_rng(0)
    prbs = (1, 4, 5, 9, 13, 20, 21, 22)
    cfg = _cfg(rb_start=1, rb_count=22, prbs=prbs)
    bits = jnp.asarray(rng.integers(0, 2, cfg.tbs).astype(np.int8))
    grid = np.asarray(pdsch.process(
        jnp.zeros((1, 14, nof_sc), jnp.complex64), bits, cfg))
    prb_energy = np.abs(grid[0]).sum(axis=0).reshape(24, 12).sum(axis=1)
    on = set(prbs)
    for p in range(24):
        if p in on:
            assert prb_energy[p] > 0, f"allocated PRB {p} empty"
        else:
            assert prb_energy[p] == 0, f"unallocated PRB {p} has energy"
    # data REs carry the modulated codeword in frequency-first order
    cw, _ = pdsch.encode_transport_block(bits, cfg)
    scr = scramble_bits(np.asarray(cw)[None], (cfg.rnti << 15) + cfg.n_id)
    syms = np.asarray(modulate(scr, cfg.modulation))[0]
    plan = pdsch._data_re_plan(cfg.rb_start, cfg.rb_count, cfg.first_symbol,
                               cfg.nof_symbols, cfg.dmrs_symbols,
                               cfg.reserved_cdm_groups, None,
                               pdsch._plan_prbs_key(cfg))
    np.testing.assert_allclose(grid[0, plan[:, 0], plan[:, 1]], syms,
                               atol=1e-5)


def test_interleaved_equals_explicit_prb_list():
    """Interleaved type-1 == type-0 with the interleaver's PRB list."""
    nof_sc = 24 * 12
    rng = np.random.default_rng(1)
    cfg_i = _cfg(rb_start=0, rb_count=8, vrb_prb_interleaved=True,
                 bwp_size=24)
    expl = tuple(int(p) for p in allocated_prbs(
        0, 8, interleaved=True, bwp_size=24))
    cfg_e = _cfg(rb_start=0, rb_count=8, prbs=expl)
    bits = jnp.asarray(rng.integers(0, 2, cfg_i.tbs).astype(np.int8))
    ga = np.asarray(pdsch.process(
        jnp.zeros((1, 14, nof_sc), jnp.complex64), bits, cfg_i))
    gb = np.asarray(pdsch.process(
        jnp.zeros((1, 14, nof_sc), jnp.complex64), bits, cfg_e))
    np.testing.assert_allclose(ga, gb, atol=1e-6)
    # and it actually scatters (differs from non-interleaved)
    gc = np.asarray(pdsch.process(
        jnp.zeros((1, 14, nof_sc), jnp.complex64), bits,
        _cfg(rb_start=0, rb_count=8)))
    assert not np.allclose(ga, gc)


def test_type0_through_conductor_with_validators():
    from srsran_tpu.fapi.conductor import SlotConductor
    from srsran_tpu.fapi.messages import DlTtiRequest, TxDataRequest
    from srsran_tpu.fapi.validators import ValidationError
    from srsran_tpu.phy.slot_programs import CellConfig
    from srsran_tpu.ran.slot_point import SlotPoint

    cell = CellConfig(nof_rb=24, numerology=1, nof_ports=2, dft_size=512)
    cond = SlotConductor(cell)
    rng = np.random.default_rng(2)
    prbs = (0, 2, 3, 8, 9, 15, 16, 23)
    cfg = _cfg(rb_start=0, rb_count=24, prbs=prbs, nof_layers=2, tbs=1608,
               dmrs_symbols=(2, 11))
    slot = SlotPoint(1, 0)
    bits = rng.integers(0, 2, cfg.tbs).astype(np.int8)
    samples, grid = cond.process_dl(
        DlTtiRequest(slot=slot, pdsch=(cfg,)),
        TxDataRequest(slot=slot, pdsch_payloads=(bits,)))
    g = np.asarray(grid)
    assert np.abs(g).sum() > 0
    # unallocated PRB stays empty
    assert np.abs(g[:, :, 4 * 12:5 * 12]).sum() == 0
    # out-of-carrier PRB rejected
    with pytest.raises(ValidationError):
        bad = _cfg(rb_start=0, rb_count=24, prbs=(0, 30))
        cond.process_dl(DlTtiRequest(slot=slot, pdsch=(bad,)),
                        TxDataRequest(slot=slot, pdsch_payloads=(
                            np.zeros(bad.tbs, np.int8),)))


def test_type0_with_per_prg_precoding():
    """Scattered allocation + per-PRG codebook precoding compose: the PRG
    base is the first ALLOCATED PRB and the validator sizes pm_indices
    over the allocation span."""
    from srsran_tpu.ran.precoding_codebooks import (PrecodingConfig,
                                                    nof_prgs, pmi_to_index,
                                                    get_matrix)
    nof_sc = 24 * 12
    rng = np.random.default_rng(3)
    prbs = (2, 3, 8, 9, 14, 15)
    ia = pmi_to_index(2, ri=2, i_2=0)
    ib = pmi_to_index(2, ri=2, i_2=1)
    span = nof_prgs(2, 14, 4)                 # PRBs 2..15, prg_size 4
    pre = PrecodingConfig(prg_size=4, pm_indices=tuple(
        [ia, ib] * span)[:span])
    cfg = _cfg(rb_start=2, rb_count=14, prbs=prbs, nof_layers=2, tbs=824,
               precoding=pre, dmrs_symbols=(2, 7))
    bits = jnp.asarray(rng.integers(0, 2, cfg.tbs).astype(np.int8))
    grid = np.asarray(pdsch.process(
        jnp.zeros((2, 14, nof_sc), jnp.complex64), bits, cfg))
    # energy only on allocated PRBs, on both ports (precoded)
    prb_energy = np.abs(grid).sum(axis=(0, 1)).reshape(24, 12).sum(axis=1)
    for p in range(24):
        assert (prb_energy[p] > 0) == (p in set(prbs)), p
    # splice check: per-PRG result equals the wideband runs spliced by PRG
    wa = np.asarray(pdsch.process(
        jnp.zeros((2, 14, nof_sc), jnp.complex64), bits,
        _cfg(rb_start=2, rb_count=14, prbs=prbs, nof_layers=2, tbs=824,
             dmrs_symbols=(2, 7)),
        precoding=get_matrix(2, ia)))
    wb = np.asarray(pdsch.process(
        jnp.zeros((2, 14, nof_sc), jnp.complex64), bits,
        _cfg(rb_start=2, rb_count=14, prbs=prbs, nof_layers=2, tbs=824,
             dmrs_symbols=(2, 7)),
        precoding=get_matrix(2, ib)))
    prg_of_prb = np.arange(24) // 4 - 2 // 4      # base PRB 2 -> prg0 = 0
    pm_of_prb = np.array([pre.pm_indices[min(max(g, 0), span - 1)]
                          for g in prg_of_prb])
    sel_a = np.repeat(pm_of_prb == ia, 12)[None, None, :]
    want = np.where(sel_a, wa, wb)
    np.testing.assert_allclose(grid, want, atol=1e-5)
