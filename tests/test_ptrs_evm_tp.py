"""PT-RS/PRS mapping, EVM calculator, transform-precoded PUSCH."""

import numpy as np
import jax.numpy as jnp
import pytest

from srsran_tpu.phy.upper import ptrs_prs, pusch
from srsran_tpu.ops import evm as evm_mod
from srsran_tpu.ops.modulation import modulate
from srsran_tpu.ops.transform_precode import precode
from srsran_tpu.ops.scrambling import scramble_bits
from srsran_tpu.ops.low_papr import base_sequence
from srsran_tpu.phy.upper.pdsch import _data_re_plan, _cb_rate_match_sizes, encode_transport_block, PdschConfig


def test_ptrs_positions_and_mapping():
    cfg = ptrs_prs.PtrsConfig(rb_start=0, rb_count=8, first_symbol=1,
                              nof_symbols=12, dmrs_symbols=(2, 11),
                              time_density=1, freq_density=2)
    pos = ptrs_prs.ptrs_positions(cfg)
    # every non-DMRS symbol, every 2nd RB
    assert len(pos) == 10 * 4
    g = jnp.zeros((1, 14, 96), dtype=jnp.complex64)
    g = ptrs_prs.map_ptrs(g, cfg)
    assert np.count_nonzero(np.asarray(g)) == 40


def test_prs_staggered_comb():
    cfg = ptrs_prs.PrsConfig(rb_start=0, rb_count=12, first_symbol=2,
                             nof_symbols=4, comb_size=4, comb_offset=0,
                             n_id_prs=123)
    g = np.asarray(ptrs_prs.map_prs(jnp.zeros((1, 14, 144), dtype=jnp.complex64), cfg))
    # each symbol: 144/4 = 36 REs, distinct comb offsets per symbol
    for i, off in enumerate((0, 2, 1, 3)):
        nz = np.nonzero(g[0, 2 + i])[0]
        assert len(nz) == 36 and (nz % 4 == off).all()


def test_evm():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, (1, 400)).astype(np.int8)
    syms = modulate(jnp.asarray(bits), "qam16")
    noise = 0.05 * (rng.normal(size=syms.shape) + 1j * rng.normal(size=syms.shape))
    noisy = syms + noise.astype(np.complex64)
    llr = jnp.where(jnp.asarray(np.repeat(bits, 1, axis=0)).astype(bool), -1.0, 1.0)
    e = float(evm_mod.evm(noisy, llr, "qam16")[0])
    assert 0.03 < e < 0.12


def test_transform_precoded_pusch():
    cfg = pusch.PuschConfig(
        rnti=0x19, rb_start=0, rb_count=12, first_symbol=0, nof_symbols=14,
        modulation="qpsk", target_code_rate=0.3, tbs=1288, nof_layers=1,
        n_id=4, dmrs_symbols=(2, 7, 11), dmrs_scrambling_id=7,
        transform_precoding=True)
    rng = np.random.default_rng(1)
    payload = rng.integers(0, 2, cfg.tbs).astype(np.int8)

    # UE TX: encode -> scramble -> QPSK -> per-symbol DFT -> map + low-PAPR DMRS
    tx_cfg = PdschConfig(rnti=cfg.rnti, rb_start=cfg.rb_start,
                         rb_count=cfg.rb_count, first_symbol=cfg.first_symbol,
                         nof_symbols=cfg.nof_symbols, modulation=cfg.modulation,
                         target_code_rate=cfg.target_code_rate, tbs=cfg.tbs,
                         nof_layers=1, n_id=cfg.n_id,
                         dmrs_symbols=cfg.dmrs_symbols)
    cw, _ = encode_transport_block(jnp.asarray(payload), tx_cfg)
    scr = scramble_bits(cw[None], (cfg.rnti << 15) + cfg.n_id)
    syms = np.asarray(modulate(scr, "qpsk"))[0]
    m = cfg.rb_count * 12
    blocks = np.asarray(precode(jnp.asarray(syms.reshape(-1, m))))
    grid = np.zeros((1, 14, m), dtype=np.complex64)
    plan = _data_re_plan(cfg.rb_start, cfg.rb_count, cfg.first_symbol,
                         cfg.nof_symbols, cfg.dmrs_symbols, 2)
    grid[0, plan[:, 0], plan[:, 1]] = blocks.reshape(-1)
    dmrs_seq = np.asarray(base_sequence(cfg.dmrs_scrambling_id % 30, 0, 6 * cfg.rb_count))
    for l in cfg.dmrs_symbols:
        grid[0, l, 0:m:2] = dmrs_seq

    ch = 0.85 * np.exp(0.6j)
    rx = np.stack([ch * grid[0], 0.55 * ch * grid[0]])
    sigma = 0.04
    rx = rx + (rng.normal(0, sigma / np.sqrt(2), rx.shape)
               + 1j * rng.normal(0, sigma / np.sqrt(2), rx.shape))
    res = pusch.process(jnp.asarray(rx.astype(np.complex64)), cfg)
    assert bool(res.tb_crc_ok)
    np.testing.assert_array_equal(np.asarray(res.tb_bits), payload)


def test_evm_closed_form_equals_remodulation():
    """The per-axis nearest-level distance must equal the remodulate-the-
    hard-bits error for Gray square QAM (the closed form the fast path
    uses)."""
    import numpy as np
    import jax.numpy as jnp
    from srsran_tpu.ops.modulation import (modulate, demodulate,
                                           BITS_PER_SYMBOL)
    rng = np.random.default_rng(3)
    for scheme in ("qpsk", "qam16", "qam64", "qam256"):
        qm = BITS_PER_SYMBOL[scheme]
        bits = rng.integers(0, 2, 4096 * qm).astype(np.int8)
        clean = modulate(jnp.asarray(bits)[None], scheme)
        noisy = clean + 0.05 * jnp.asarray(
            rng.normal(size=clean.shape) + 1j * rng.normal(size=clean.shape))
        nv = jnp.full(noisy.shape, 0.0025, jnp.float32)
        llr = demodulate(noisy, nv, scheme)
        fast = float(evm_mod.evm(noisy, llr, scheme)[0])
        hard = (np.asarray(llr) < 0).astype(np.int8)
        ref = np.asarray(modulate(jnp.asarray(hard), scheme))
        slow = float(np.sqrt(np.mean(np.abs(np.asarray(noisy) - ref) ** 2)))
        np.testing.assert_allclose(fast, slow, rtol=1e-5)
