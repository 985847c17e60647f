"""Saturating int8 LLR type (reference log_likelihood_ratio parity).

The reference carries LLRs as saturating int8 with the demodulator output
range-limited to +-20 before noise scaling
(include/srsran/phy/upper/log_likelihood_ratio.h,
demodulation_mapper_qam16.cpp:37).  Here f32 LLRs quantize to int8 with
the same +-20 <-> +-120 mapping; the decoders accept either (int8 inputs
dequantize on entry, keeping the VPU lanes dense if a memory-bound path
wants the 4x smaller type).
"""

from __future__ import annotations

import jax.numpy as jnp

LLR_RANGE = 20.0
LLR_INT_MAX = 120  # +-120 used, +-127 reserved for saturation semantics
_SCALE = LLR_INT_MAX / LLR_RANGE


def quantize(llrs: jnp.ndarray) -> jnp.ndarray:
    """f32 -> int8 with the reference's +-20 range mapping."""
    x = jnp.clip(jnp.round(llrs * _SCALE), -127, 127)
    return x.astype(jnp.int8)


def dequantize(llrs_i8: jnp.ndarray) -> jnp.ndarray:
    return llrs_i8.astype(jnp.float32) / _SCALE


def to_float(llrs: jnp.ndarray) -> jnp.ndarray:
    """Accept either representation."""
    if llrs.dtype == jnp.int8:
        return dequantize(llrs)
    return llrs.astype(jnp.float32)
