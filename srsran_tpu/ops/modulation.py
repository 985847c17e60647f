"""Modulation mapper + max-log soft demapper (TS38.211 §5.1).

TPU-native replacement for modulation_mapper_{lut,avx512,neon}_impl and
demodulation_mapper_qpsk/qam{16,64,256} (lib/phy/upper/channel_modulation/):
mapping evaluates the closed-form NR Gray constellations directly on the
VPU; demapping computes exact max-log per-axis LLRs (the reference's
interval tables, demodulation_mapper_intervals.h, are a piecewise-linear
approximation of exactly this function).  LLR > 0 means bit 0.

Shapes: bits [..., E] -> symbols [..., E/Qm]; symbols+noise_var -> llrs
[..., E].  All batched; Qm is static.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

BITS_PER_SYMBOL = {
    "pi2bpsk": 1, "bpsk": 1, "qpsk": 2, "qam16": 4, "qam64": 6, "qam256": 8,
}

_SCALE = {"qpsk": 2 ** -0.5, "qam16": 10 ** -0.5, "qam64": 42 ** -0.5,
          "qam256": 170 ** -0.5, "bpsk": 2 ** -0.5, "pi2bpsk": 2 ** -0.5}


def _pam(bits: jnp.ndarray, order: int) -> jnp.ndarray:
    """Gray PAM amplitude from sign-bit-first NR bit groups.

    order = number of bits on this axis (1, 2, 3 or 4).
    bits: [..., order] float; returns unnormalized amplitude.
    """
    s = 1.0 - 2.0 * bits.astype(jnp.float32)
    if order == 1:
        return s[..., 0]
    if order == 2:
        return s[..., 0] * (2.0 - s[..., 1])
    if order == 3:
        return s[..., 0] * (4.0 - s[..., 1] * (2.0 - s[..., 2]))
    return s[..., 0] * (8.0 - s[..., 1] * (4.0 - s[..., 2] * (2.0 - s[..., 3])))


def modulate(bits: jnp.ndarray, scheme: str) -> jnp.ndarray:
    """Map bits to complex symbols.  bits int [..., E] -> complex64 [..., E/Qm]."""
    qm = BITS_PER_SYMBOL[scheme]
    scale = _SCALE[scheme]
    shape = bits.shape[:-1]
    e = bits.shape[-1]
    assert e % qm == 0
    if scheme in ("bpsk", "pi2bpsk"):
        s = 1.0 - 2.0 * bits.astype(jnp.float32)
        sym = scale * (s + 1j * s).astype(jnp.complex64)
        if scheme == "pi2bpsk":
            n = sym.shape[-1]
            rot = jnp.where(jnp.arange(n) % 2 == 1, 1j, 1.0).astype(jnp.complex64)
            sym = sym * rot
        return sym
    g = bits.reshape(shape + (e // qm, qm))
    half = qm // 2
    i_amp = _pam(g[..., 0::2], half)
    q_amp = _pam(g[..., 1::2], half)
    return (scale * (i_amp + 1j * q_amp)).astype(jnp.complex64)


def qpsk_np(bits: np.ndarray) -> np.ndarray:
    """Host QPSK mapper (matches modulate(..., 'qpsk') exactly) — used by
    the per-slot host sequence builders that feed pilot VALUES into the
    jitted slot programs instead of computing Gold/QPSK on device."""
    b = np.asarray(bits).reshape(-1, 2).astype(np.float32)
    return (((1.0 - 2.0 * b[:, 0]) + 1j * (1.0 - 2.0 * b[:, 1]))
            * np.float32(2 ** -0.5)).astype(np.complex64)


@functools.lru_cache(maxsize=None)
def _pam_levels(order: int) -> np.ndarray:
    """All 2^order PAM amplitudes indexed by the bit group value, plus the
    per-bit 0/1 masks.  Returns (levels [L], bit0_mask [order, L])."""
    levels = np.zeros(1 << order, dtype=np.float32)
    bitmask = np.zeros((order, 1 << order), dtype=bool)
    for v in range(1 << order):
        bits = [(v >> (order - 1 - i)) & 1 for i in range(order)]
        s = [1.0 - 2.0 * b for b in bits]
        if order == 1:
            a = s[0]
        elif order == 2:
            a = s[0] * (2 - s[1])
        elif order == 3:
            a = s[0] * (4 - s[1] * (2 - s[2]))
        else:
            a = s[0] * (8 - s[1] * (4 - s[2] * (2 - s[3])))
        levels[v] = a
        for i in range(order):
            bitmask[i, v] = bits[i] == 0
    return levels, bitmask


def _axis_llrs(y: jnp.ndarray, order: int, scale: float,
               noise_var: jnp.ndarray) -> jnp.ndarray:
    """Max-log LLRs for one real axis.  y [...] -> [..., order]."""
    levels, mask0 = _pam_levels(order)
    lv = jnp.asarray(levels * scale)                     # [L]
    d2 = (y[..., None] - lv) ** 2                        # [..., L]
    big = jnp.float32(1e30)
    m0 = jnp.asarray(mask0)                              # [order, L]
    d0 = jnp.min(jnp.where(m0, d2[..., None, :], big), axis=-1)   # [..., order]
    d1 = jnp.min(jnp.where(~m0, d2[..., None, :], big), axis=-1)
    return (d1 - d0) / jnp.maximum(noise_var[..., None], 1e-12)


def demodulate(symbols: jnp.ndarray, noise_var: jnp.ndarray,
               scheme: str) -> jnp.ndarray:
    """Soft demap.  symbols complex [..., S], noise_var [..., S] -> llrs [..., S*Qm]."""
    qm = BITS_PER_SYMBOL[scheme]
    scale = _SCALE[scheme]
    if scheme in ("bpsk", "pi2bpsk"):
        sym = symbols
        if scheme == "pi2bpsk":
            n = sym.shape[-1]
            rot = jnp.where(jnp.arange(n) % 2 == 1, -1j, 1.0).astype(jnp.complex64)
            sym = sym * rot
        proj = (sym.real + sym.imag) * (2.0 * scale)
        return 2.0 * proj / jnp.maximum(noise_var, 1e-12)
    half = qm // 2
    li = _axis_llrs(symbols.real, half, scale, noise_var)   # [..., S, half]
    lq = _axis_llrs(symbols.imag, half, scale, noise_var)
    # bit order within a symbol: b0(I), b1(Q), b2(I), b3(Q), ...
    inter = jnp.stack([li, lq], axis=-1)                    # [..., S, half, 2]
    return inter.reshape(symbols.shape[:-1] + (symbols.shape[-1] * qm,))
