"""Channel equalizer: ZF / MMSE for 1-4 layers x N rx ports.

TPU-native replacement for channel_equalizer_generic_impl
(lib/phy/upper/equalization/channel_equalizer_generic_impl.cpp:100-190,
equalize_zf_1xn.h / equalize_zf_2xn.h): closed-form per-RE solves,
vectorized over all REs of a slot — no per-RE dispatch, just fused VPU math.
Outputs equalized symbols and per-RE post-equalization noise variances
(the demapper divides by these), with tx_scaling folding the DM-RS-to-data
EPRE ratio exactly like the reference.
"""

from __future__ import annotations

import jax.numpy as jnp


def equalize_zf_1xn(y: jnp.ndarray, h: jnp.ndarray, noise_var: jnp.ndarray,
                    tx_scaling: float = 1.0):
    """1 layer, N ports.  y [..., P], h [..., P], noise_var [...] or [..., P].

    Returns (x_hat [...], eq_noise_var [...]).
    """
    if noise_var.ndim == y.ndim:
        nv = jnp.mean(noise_var, axis=-1)
    else:
        nv = noise_var
    energy = jnp.sum(jnp.abs(h) ** 2, axis=-1)
    corr = jnp.sum(jnp.conj(h) * y, axis=-1)
    inv = 1.0 / jnp.maximum(energy, 1e-12)
    x = corr * inv / tx_scaling
    out_nv = nv * inv / (tx_scaling ** 2)
    # infinite noise where the channel is singular
    out_nv = jnp.where(energy < 1e-12, 1e12, out_nv)
    return x.astype(jnp.complex64), out_nv.astype(jnp.float32)


def equalize_mmse_1xn(y: jnp.ndarray, h: jnp.ndarray, noise_var: jnp.ndarray,
                      tx_scaling: float = 1.0):
    """MMSE, 1 layer, N ports (the reference's only MMSE case)."""
    if noise_var.ndim == y.ndim:
        nv = jnp.mean(noise_var, axis=-1)
    else:
        nv = noise_var
    energy = jnp.sum(jnp.abs(h) ** 2, axis=-1)
    corr = jnp.sum(jnp.conj(h) * y, axis=-1)
    denom = energy + nv / (tx_scaling ** 2)
    x = corr / jnp.maximum(denom, 1e-12) / tx_scaling
    # post-MMSE effective noise: nv_eff = nv * energy / denom^2 scaled; use
    # unbiased form nv/(energy) matching ZF asymptotics at high SNR.
    out_nv = nv * energy / jnp.maximum(denom, 1e-12) ** 2 / (tx_scaling ** 2)
    out_nv = jnp.where(energy < 1e-12, 1e12, out_nv)
    return x.astype(jnp.complex64), out_nv.astype(jnp.float32)


def equalize_zf_2xn(y: jnp.ndarray, h: jnp.ndarray, noise_var: jnp.ndarray,
                    tx_scaling: float = 1.0):
    """2 layers, N ports.  y [..., P], h [..., P, 2], noise_var [...].

    Closed-form 2x2 Gram inverse (equalize_zf_2xn.h).
    Returns (x_hat [..., 2], eq_noise_var [..., 2]).
    """
    if noise_var.ndim == y.ndim:
        nv = jnp.mean(noise_var, axis=-1)
    else:
        nv = noise_var
    h0, h1 = h[..., 0], h[..., 1]
    a = jnp.sum(jnp.abs(h0) ** 2, axis=-1)           # G00
    d = jnp.sum(jnp.abs(h1) ** 2, axis=-1)           # G11
    b = jnp.sum(jnp.conj(h0) * h1, axis=-1)          # G01
    det = a * d - jnp.abs(b) ** 2
    det = jnp.where(det < 1e-12, 1e-12, det)
    z0 = jnp.sum(jnp.conj(h0) * y, axis=-1)
    z1 = jnp.sum(jnp.conj(h1) * y, axis=-1)
    x0 = (d * z0 - b * z1) / det / tx_scaling
    x1 = (a * z1 - jnp.conj(b) * z0) / det / tx_scaling
    nv0 = nv * d / det / (tx_scaling ** 2)
    nv1 = nv * a / det / (tx_scaling ** 2)
    x = jnp.stack([x0, x1], axis=-1).astype(jnp.complex64)
    out_nv = jnp.stack([nv0, nv1], axis=-1).astype(jnp.float32)
    return x, out_nv


def equalize_lxn(y: jnp.ndarray, h: jnp.ndarray, noise_var: jnp.ndarray,
                 method: str = "zf", tx_scaling: float = 1.0):
    """General L layers x N ports ZF/MMSE via batched Gram solves.

    BEYOND the reference: its generic equalizer stubs out 3x4/4x4 ZF and
    multi-layer MMSE (channel_equalizer_generic_impl.cpp:190-271); here
    every RE solves (H^H H + c I) x = H^H y with c = 0 (ZF) or noise/beta^2
    (MMSE), batched over the slot on the MXU-friendly [RE, L, L] Grams.
    Per-layer output noise follows the inverse Gram diagonal.

    y [..., P]; h [..., P, L]; noise_var [...] or [..., P].
    Returns (x [..., L], eq_noise_var [..., L]).
    """
    if noise_var.ndim == y.ndim:
        nv = jnp.mean(noise_var, axis=-1)
    else:
        nv = noise_var
    nof_layers = h.shape[-1]
    gram = jnp.einsum("...pl,...pm->...lm", jnp.conj(h), h)
    z = jnp.einsum("...pl,...p->...l", jnp.conj(h), y)
    eye = jnp.eye(nof_layers, dtype=gram.dtype)
    ridge = (nv[..., None, None] / (tx_scaling ** 2)) * eye \
        if method == "mmse" else 1e-9 * eye
    a = gram + ridge
    a_inv = jnp.linalg.inv(a)
    x = jnp.einsum("...lm,...m->...l", a_inv, z) / tx_scaling
    diag_inv = jnp.real(jnp.einsum("...ll->...l", a_inv))
    if method == "mmse":
        # unbiased-equivalent noise: nv * [A^-1 G A^-1]_ll
        gi = jnp.einsum("...lm,...mn,...nk->...lk", a_inv, gram, a_inv)
        diag_eff = jnp.real(jnp.einsum("...ll->...l", gi))
    else:
        diag_eff = diag_inv
    out_nv = nv[..., None] * diag_eff / (tx_scaling ** 2)
    out_nv = jnp.where(diag_eff <= 0, 1e12, out_nv)
    return x.astype(jnp.complex64), out_nv.astype(jnp.float32)


def equalize(y: jnp.ndarray, h: jnp.ndarray, noise_var: jnp.ndarray,
             nof_layers: int, method: str = "zf", tx_scaling: float = 1.0):
    """Dispatch like channel_equalizer_generic_impl.cpp:100-190, extended:
    the reference implements ZF for 1-2 layers and MMSE for 1 and stubs the
    rest; layers 2 (MMSE) through 4 here use the general batched solver.

    y [..., P]; h [..., P, L]; returns (x [..., L], nv [..., L]).
    """
    if nof_layers == 1:
        fn = equalize_mmse_1xn if method == "mmse" else equalize_zf_1xn
        x, nv = fn(y, h[..., 0], noise_var, tx_scaling)
        return x[..., None], nv[..., None]
    if nof_layers == 2 and method == "zf":
        return equalize_zf_2xn(y, h, noise_var, tx_scaling)
    if 2 <= nof_layers <= 4:
        return equalize_lxn(y, h, noise_var, method, tx_scaling)
    raise NotImplementedError(f"{nof_layers}-layer equalization")
