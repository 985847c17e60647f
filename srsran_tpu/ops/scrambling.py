"""Scrambling / descrambling with the Gold sequence (TS38.211).

Replaces the reference's pseudo_random_generator apply_xor paths
(lib/phy/upper/sequence_generators/): bit XOR on TX, LLR sign flip on RX.
The sequence itself comes from ops.gold (one MXU matmul per slot's worth).
"""

from __future__ import annotations

import jax.numpy as jnp

from .gold import gold_sequence


def scramble_bits(bits: jnp.ndarray, c_init, advance: int = 0) -> jnp.ndarray:
    """bits int8 [..., N] ^ c(c_init).  Static length."""
    seq = gold_sequence(c_init, bits.shape[-1], advance)
    return (bits ^ seq).astype(jnp.int8)


def descramble_llrs(llrs: jnp.ndarray, c_init, advance: int = 0) -> jnp.ndarray:
    """Flip LLR signs where the scrambling bit is 1."""
    seq = gold_sequence(c_init, llrs.shape[-1], advance)
    return jnp.where(seq.astype(bool), -llrs, llrs)
