"""EVM calculator (error vector magnitude from hard decisions).

TPU-native analogue of evm_calculator_generic_impl
(lib/phy/upper/channel_modulation/evm_*): RMS error vector between the
equalized symbols and their hard decisions.

For Gray-mapped square QAM the hard decision from max-log LLR signs is the
nearest constellation point, and nearest-point search separates per axis —
so the error is computed closed-form per I/Q coordinate (a handful of
fusable elementwise ops) instead of remodulating the hard bit stream.
Equality with the remodulation path is pinned in tests.
"""

from __future__ import annotations

import jax.numpy as jnp

from .modulation import modulate, BITS_PER_SYMBOL, _SCALE


def _axis_error(coord: jnp.ndarray, nof_levels: int, scale: float):
    """Distance from a PAM coordinate to the nearest level in
    {±1, ±3, … ±(2L-1)} * scale."""
    y = jnp.abs(coord) / scale
    nearest = jnp.clip(2.0 * jnp.floor(y / 2.0) + 1.0, 1.0,
                       2.0 * nof_levels - 1.0)
    # floor-based candidate vs the next level up: pick the closer one
    up = jnp.minimum(nearest + 2.0, 2.0 * nof_levels - 1.0)
    err = jnp.minimum(jnp.abs(y - nearest), jnp.abs(y - up))
    return err * scale


def evm(symbols: jnp.ndarray, llrs: jnp.ndarray, scheme: str) -> jnp.ndarray:
    """RMS EVM.  symbols [..., S] equalized; llrs [..., S*Qm] (unused except
    for the BPSK fallbacks, kept for interface parity)."""
    if scheme in ("bpsk", "pi2bpsk"):
        hard = (llrs < 0).astype(jnp.int8)
        ref = modulate(hard, scheme)
        return jnp.sqrt(jnp.mean(jnp.abs(symbols - ref) ** 2, axis=-1))
    qm = BITS_PER_SYMBOL[scheme]
    nof_levels = 1 << (qm // 2 - 1)
    scale = _SCALE[scheme]
    ei = _axis_error(jnp.real(symbols), nof_levels, scale)
    eq = _axis_error(jnp.imag(symbols), nof_levels, scale)
    return jnp.sqrt(jnp.mean(ei * ei + eq * eq, axis=-1))
