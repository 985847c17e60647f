"""PUCCH F2/F3 through the port channel estimator on delay-spread channels.

The reference runs PUCCH formats 2-4 through the same
port_channel_estimator as PUSCH (lib/phy/upper/signal_processors/pucch/);
until round 4 this repo used an ad-hoc LS + 50/50 wideband blend for F3/F4
("flat-fading assumption").  These tests pin the new behavior: on a 2-tap
frequency-selective channel the RC-filter-smoothed estimate tracks the
per-subcarrier channel and the UCI decodes, while the old flat blend fails.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from srsran_tpu.phy.upper import pucch
from srsran_tpu.ops import channel_estimate as chest


def _two_tap_channel(nof_sc: int, tau_sc: float = 0.18, a1: float = 1.0,
                     a2: float = 0.95):
    """H[k] = a1 + a2*exp(-2j*pi*tau_sc*k): deep notches across the band."""
    k = np.arange(nof_sc)
    return (a1 + a2 * np.exp(-2j * np.pi * tau_sc * k)).astype(np.complex64)


def _apply_channel(grid, h_sc, snr_db, seed=0):
    """Per-subcarrier channel + AWGN onto a [P, 14, nsc] grid."""
    rng = np.random.default_rng(seed)
    g = np.asarray(grid)
    y = g * h_sc[None, None, :]
    sig = np.mean(np.abs(y[np.abs(y) > 0]) ** 2)
    nv = sig / 10 ** (snr_db / 10)
    noise = (rng.normal(size=y.shape) + 1j * rng.normal(size=y.shape))
    y = y + np.sqrt(nv / 2) * noise
    return jnp.asarray(y.astype(np.complex64))


def _flat_blend_f3_decode(grid, cfg):
    """The pre-round-4 F3 receiver (LS avg + 50/50 wideband blend) for
    comparison: identical downstream (equalize, deprecode, demap, decode)."""
    from srsran_tpu.phy.upper.uci import decode_uci
    from srsran_tpu.ops.modulation import demodulate
    from srsran_tpu.ops.scrambling import descramble_llrs
    from srsran_tpu.ops.transform_precode import deprecode

    m = cfg.nof_rb * 12
    sc = jnp.arange(cfg.rb_start * 12, cfg.rb_start * 12 + m)
    dmrs_rel, data_rel = pucch._f3_symbol_split(cfg)
    h_acc = jnp.zeros((grid.shape[0], m), dtype=jnp.complex64)
    noise_acc = 0.0
    for s in dmrs_rel:
        l = cfg.start_symbol + s
        ref = jnp.asarray(pucch._f3_dmrs_seq(cfg, l))
        ls = grid[:, l, sc] * jnp.conj(ref)
        h_acc = h_acc + ls
        noise_acc = noise_acc + jnp.mean(
            jnp.abs(ls - jnp.mean(ls, axis=-1, keepdims=True)) ** 2)
    h = h_acc / len(dmrs_rel)
    h_use = 0.5 * (h + jnp.mean(h, axis=-1, keepdims=True) * jnp.ones_like(h))
    noise = noise_acc / len(dmrs_rel)
    llr_parts = []
    for s in data_rel:
        l = cfg.start_symbol + s
        rx = grid[:, l, sc]
        corr = jnp.sum(jnp.conj(h_use) * rx, axis=0)
        energy = jnp.sum(jnp.abs(h_use) ** 2, axis=0)
        eq = corr / jnp.maximum(energy, 1e-12)
        nv = noise / jnp.maximum(jnp.mean(energy), 1e-12)
        x = deprecode(eq)
        nvv = jnp.full(x.shape, nv, dtype=jnp.float32)
        llr_parts.append(demodulate(x[None], nvv[None], "qpsk")[0])
    llr = jnp.concatenate(llr_parts)
    llr = descramble_llrs(llr[None], (cfg.rnti << 15) + cfg.n_id)[0]
    bits, ok, metric = decode_uci(llr, cfg.nof_uci_bits, 2)
    return bits, ok


F3 = pucch.PucchF3Config(rb_start=4, nof_rb=4, start_symbol=0,
                         nof_symbols=14, rnti=0x1234, n_id=7,
                         n_id_hopping=11, nof_uci_bits=16)


def _f3_grid(cfg, bits, nof_rb_carrier=52, ports=2):
    vals = pucch.f3_encode(jnp.asarray(bits), cfg)          # [S, M]
    grid = np.zeros((ports, 14, nof_rb_carrier * 12), np.complex64)
    sc0 = cfg.rb_start * 12
    m = cfg.nof_rb * 12
    for s in range(cfg.nof_symbols):
        grid[:, cfg.start_symbol + s, sc0:sc0 + m] = np.asarray(vals)[s]
    return jnp.asarray(grid)


def test_f3_decodes_on_two_tap_channel_where_flat_blend_fails():
    """1 rx port (no diversity to hide behind), 40 UCI bits, equal-power
    2-tap channel with ~1.7 us delay (deep in-band notches) at 0 dB: the
    port-estimator + MMSE path decodes every realization; the old LS +
    50/50 wideband blend drops some."""
    import dataclasses as dc
    cfg = dc.replace(F3, nof_uci_bits=40)
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, cfg.nof_uci_bits).astype(np.uint8)
    grid = _f3_grid(cfg, bits, ports=1)
    h = _two_tap_channel(52 * 12, tau_sc=0.05, a2=1.0)
    new_ok = old_ok = 0
    for seed in range(8):
        rx = _apply_channel(grid, h, snr_db=0.0, seed=seed)
        res = pucch.process_format3(rx, cfg)
        new_ok += int(bool(res["valid"])
                      and np.array_equal(np.asarray(res["uci_bits"]), bits))
        ob, ook = _flat_blend_f3_decode(rx, cfg)
        old_ok += int(bool(ook) and np.array_equal(np.asarray(ob), bits))
    assert new_ok == 8, f"port-estimator path decoded only {new_ok}/8"
    assert old_ok < 8, "flat-fading blend unexpectedly decoded all " \
                       "realizations (channel not selective enough)"


def test_f3_flat_channel_still_decodes():
    rng = np.random.default_rng(6)
    bits = rng.integers(0, 2, F3.nof_uci_bits).astype(np.uint8)
    grid = _f3_grid(F3, bits)
    h = np.full(52 * 12, 0.8 - 0.4j, np.complex64)
    rx = _apply_channel(grid, h, snr_db=10.0, seed=2)
    res = pucch.process_format3(rx, F3)
    assert bool(res["valid"])
    assert np.array_equal(np.asarray(res["uci_bits"]), bits)


def test_f2_decodes_on_two_tap_channel():
    cfg = pucch.PucchF2Config(rb_start=10, nof_rb=4, start_symbol=12,
                              nof_symbols=2, rnti=0x777, n_id=3, n_id0=5,
                              nof_uci_bits=10)
    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, cfg.nof_uci_bits).astype(np.uint8)
    # UE-side F2 TX: encode + scramble + QPSK onto the data REs
    from srsran_tpu.phy.upper.uci import encode_uci
    from srsran_tpu.ops.modulation import modulate
    from srsran_tpu.ops.scrambling import scramble_bits
    data_sc, dmrs_sc = [], []
    for rb in range(cfg.rb_start, cfg.rb_start + cfg.nof_rb):
        for k in range(12):
            (dmrs_sc if k % 3 == 1 else data_sc).append(rb * 12 + k)
    e = len(data_sc) * 2 * cfg.nof_symbols
    coded = encode_uci(jnp.asarray(bits), e, 2)
    scr = scramble_bits(coded[None], ((cfg.rnti << 15) + cfg.n_id) % (1 << 31))
    syms = np.asarray(modulate(scr, "qpsk")[0])
    pil = pucch.f2_pilot_values_for(cfg)
    grid = np.zeros((2, 14, 52 * 12), np.complex64)
    per_sym = len(data_sc)
    for s in range(cfg.nof_symbols):
        l = cfg.start_symbol + s
        grid[:, l, data_sc] = syms[s * per_sym:(s + 1) * per_sym]
        grid[:, l, dmrs_sc] = pil[s]
    h = _two_tap_channel(52 * 12, tau_sc=0.1)
    rx = _apply_channel(jnp.asarray(grid), h, snr_db=10.0, seed=3)
    res = pucch.process_format2(rx, cfg)
    assert bool(res["valid"])
    assert np.array_equal(np.asarray(res["uci_bits"]), bits)


def test_f3_estimator_matches_numpy_ls_on_clean_channel():
    """Value golden: on a noiseless selective channel the estimate at the
    pilot lattice must match the true channel within filter tolerance."""
    rng = np.random.default_rng(8)
    bits = rng.integers(0, 2, F3.nof_uci_bits).astype(np.uint8)
    grid = _f3_grid(F3, bits, ports=1)
    nsc = 52 * 12
    h = _two_tap_channel(nsc, tau_sc=0.05)   # mild selectivity
    rx = jnp.asarray(np.asarray(grid) * h[None, None, :])
    m = F3.nof_rb * 12
    sc0 = F3.rb_start * 12
    dmrs_rel, _ = pucch._f3_symbol_split(F3)
    refs = np.stack([np.asarray(pucch._f3_dmrs_seq(
        F3, F3.start_symbol + s)) for s in dmrs_rel])
    rx_pil = jnp.stack([rx[:, F3.start_symbol + s, sc0:sc0 + m]
                        for s in dmrs_rel], axis=1)
    est = chest.estimate(rx_pil, jnp.asarray(refs)[None], np.arange(m),
                         nof_sc=m, nof_symbols=14, scs_hz=30e3, stride=2,
                         smoothing="filter", estimate_cfo=False)
    got = np.asarray(est.coeffs[0, 0, 0])
    want = h[sc0:sc0 + m]
    # numpy LS reference: rx_pilot * conj(ref) == h exactly (unit-modulus
    # pilots); the RC filter distorts mildly-selective channels < 5%
    ls_np = np.mean(np.asarray(rx_pil)[0] * np.conj(refs), axis=0)
    assert np.allclose(ls_np, want, atol=1e-4)
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-3)
    assert np.median(rel) < 0.05
