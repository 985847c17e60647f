"""Gold pseudo-random sequence (TS38.211 §5.2.1) as GF(2) matmuls.

TPU-native replacement for the reference's pseudo_random_generator_impl +
_fast_advance (lib/phy/upper/sequence_generators/): the LFSR "fast advance"
trick generalises to generating *all* output bits with one matmul.  For a
length-N sequence starting at offset ``advance``:

    x2 bits = (T @ c_init_state) & 1     with T [N, 31] precomputed on host,
    x1 bits = constant (seed-independent),
    c      = x1 ^ x2.

Batched over seeds this is an [N, 31] x [31, S] int8 MXU matmul — the whole
scrambling sequence for a slot's worth of codewords in one op.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .gf2 import companion_from_taps, gf2_matpow, gf2_matmul

NC = 1600
_A1 = companion_from_taps([0, 3], 31)          # x1(n+31) = x1(n+3) + x1(n)
_A2 = companion_from_taps([0, 1, 2, 3], 31)    # x2(n+31) = x2(n+3)+x2(n+2)+x2(n+1)+x2(n)


@functools.lru_cache(maxsize=None)
def _x1_bits(length: int, advance: int = 0) -> np.ndarray:
    """Seed-independent x1 output bits [length] starting at n = Nc + advance."""
    n_total = NC + advance + length
    x = np.zeros(n_total + 31, dtype=np.uint8)
    x[0] = 1
    for i in range(n_total):
        x[i + 31] = x[i + 3] ^ x[i]
    return x[NC + advance: NC + advance + length].copy()


@functools.lru_cache(maxsize=None)
def _x2_transfer(length: int, advance: int = 0) -> np.ndarray:
    """T [length, 31] with bit_n = T[n] @ x2_init over GF(2).

    Row n is e0^T A2^(Nc+advance+n).  Computed in blocks: G = rows of A2^i
    for i < B gives B outputs per state; states advance by A2^B.
    """
    t = np.zeros((length, 31), dtype=np.int8)
    base = gf2_matpow(_A2, NC + advance)
    b = 256
    # G[i] = e0^T A2^i = row 0 of A2^i; build once for i < b.
    g = np.zeros((b, 31), dtype=np.uint8)
    acc = np.eye(31, dtype=np.uint8)
    for i in range(b):
        g[i] = acc[0]
        acc = gf2_matmul(_A2, acc).astype(np.uint8)
    a_b = gf2_matpow(_A2, b)
    state_m = base
    for j in range(0, length, b):
        nb = min(b, length - j)
        t[j: j + nb] = gf2_matmul(g[:nb], state_m)
        state_m = gf2_matmul(a_b, state_m).astype(np.uint8)
    return t


def c_init_state(c_init) -> jnp.ndarray:
    """x2 initial state bits [.., 31]: x2(i) = bit i of c_init (LSB first)."""
    c_init = jnp.asarray(c_init, dtype=jnp.uint32)
    shifts = jnp.arange(31, dtype=jnp.uint32)
    return ((c_init[..., None] >> shifts) & 1).astype(jnp.int8)


def gold_sequence(c_init, length: int, advance: int = 0) -> jnp.ndarray:
    """Gold bits c(advance .. advance+length) for one or many seeds.

    c_init: uint32 scalar or [S].  Returns int8 [length] or [S, length].
    """
    t = jnp.asarray(_x2_transfer(length, advance))      # [N, 31]
    x1 = jnp.asarray(_x1_bits(length, advance))         # [N]
    state = c_init_state(c_init)                        # [..., 31]
    x2 = jnp.matmul(state.astype(jnp.int8), t.T, preferred_element_type=jnp.int32) & 1
    return (x2.astype(jnp.int8) ^ x1.astype(jnp.int8))


def gold_sequence_np(c_init: int, length: int, advance: int = 0) -> np.ndarray:
    """Bit-serial reference implementation (host, for tests)."""
    n_total = NC + advance + length
    x1 = np.zeros(n_total + 31, dtype=np.uint8)
    x2 = np.zeros(n_total + 31, dtype=np.uint8)
    x1[0] = 1
    for i in range(31):
        x2[i] = (c_init >> i) & 1
    for i in range(n_total):
        x1[i + 31] = x1[i + 3] ^ x1[i]
        x2[i + 31] = x2[i + 3] ^ x2[i + 2] ^ x2[i + 1] ^ x2[i]
    c = x1[NC + advance: NC + advance + length] ^ x2[NC + advance: NC + advance + length]
    return c
