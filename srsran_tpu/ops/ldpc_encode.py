"""Batched LDPC encoder (TS38.212 §5.3.2) as an unrolled XLA program.

TPU-native replacement for the reference's ldpc_encoder_{generic,avx2,neon}
(lib/phy/upper/channel_coding/ldpc/ldpc_encoder_impl.h): instead of SIMD
lanes over one codeblock, we batch over a [codeblock] axis and express every
lifted-circulant product as a static jnp.roll.  The double-diagonal core
parity solve and the extension-parity back-substitution are resolved at
trace time from the graph structure, yielding a flat XOR dataflow XLA can
fuse.

Input  bits: int8 [B, K]   (K = 22Z or 10Z; filler bits must already be 0)
Output code: int8 [B, N+2Z] full codeword incl. the 2Z punctured systematic
             bits (callers slice [2Z:] for the transmitted part).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .ldpc_graph import LdpcGraph, get_graph


def _roll(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Circulant-lift product P^shift @ x == roll by -shift along last axis."""
    if shift == 0:
        return x
    return jnp.roll(x, -shift, axis=-1)


@functools.lru_cache(maxsize=None)
def _row_sum_plan(base_graph: int, z: int, rows: tuple, col_limit: int):
    """[len(rows), max_d, Z] gather plan: row edges with their circulant
    shifts folded in; padding points at a zero slot appended at col_limit."""
    g = get_graph(base_graph, z)
    j = np.arange(z)
    sel = [[c * z + (j + s) % z for c, s in g.rows[r] if c < col_limit]
           for r in rows]
    max_d = max(len(s) for s in sel)
    pad = col_limit * z + j
    plan = np.stack([np.concatenate(s + [pad] * (max_d - len(s)))
                     for s in sel])
    return plan.reshape(len(rows), max_d, z).astype(np.int32)


def _row_sums(flat_with_zero: jnp.ndarray, plan: np.ndarray) -> jnp.ndarray:
    """XOR-reduce each row's gathered edges: [B, R, Z] parities."""
    v = flat_with_zero[:, jnp.asarray(plan)]           # [B, R, max_d, Z]
    return (jnp.sum(v.astype(jnp.int32), axis=2) & 1).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnums=(1, 2))
def encode(bits: jnp.ndarray, base_graph: int, z: int) -> jnp.ndarray:
    """Encode a batch of codeblocks.  bits int8 [B, K] -> int8 [B, NV*Z].

    Every lifted-circulant product is an index-plan gather (shift folded
    into the indices); each check row's XOR is a popcount-parity reduce —
    the whole encoder is two gathers + two reduces + the core solve.
    """
    g = get_graph(base_graph, z)
    kb = g.nof_info_cols
    batch = bits.shape[0]
    assert bits.shape[1] == kb * z, (bits.shape, kb, z)
    info = bits.reshape(batch, kb, z).astype(jnp.uint8)

    # Core rows 0..3: XOR of info-column contributions, one gather+reduce.
    zero = jnp.zeros((batch, z), dtype=jnp.uint8)
    info_flat = jnp.concatenate([info.reshape(batch, kb * z), zero], axis=1)
    core_plan = _row_sum_plan(base_graph, z, (0, 1, 2, 3), kb)
    cs = _row_sums(info_flat, core_plan)                       # [B, 4, Z]
    core_sums = [cs[:, r] for r in range(4)]

    # Solve p0: summing the four core rows cancels the double-diagonal
    # (p1..p3 each appear twice with shift 0).  p0's contributions
    # XOR(roll(p0, -s_i)) cancel pairwise for repeated shifts; in the NR base
    # graphs exactly one shift survives, so p0 = roll(total, s_rem).
    p0_col = kb
    p0_shifts = [g.row_shift(r, p0_col) for r in range(4)
                 if p0_col in g.row_cols(r)]
    surviving = [s for s in set(p0_shifts) if p0_shifts.count(s) % 2 == 1]
    assert len(surviving) == 1, f"core p0 shifts {p0_shifts} don't reduce"
    total = core_sums[0] ^ core_sums[1] ^ core_sums[2] ^ core_sums[3]
    p0 = jnp.roll(total, surviving[0], axis=-1)

    # Back-substitute p1..p3: process core rows; each row has exactly one
    # yet-unknown parity (with shift 0 in the NR base graphs).
    parities = {0: p0}
    for _ in range(3):
        for r in range(4):
            unknown = [c for c in g.row_cols(r)
                       if kb <= c < kb + 4 and (c - kb) not in parities]
            if len(unknown) != 1:
                continue
            c_new = unknown[0]
            s_new = g.row_shift(r, c_new)
            acc = core_sums[r]
            for c in g.row_cols(r):
                if kb <= c < kb + 4 and c != c_new:
                    acc = acc ^ _roll(parities[c - kb], g.row_shift(r, c))
            assert s_new == 0, f"diagonal shift {s_new} != 0 at row {r}"
            parities[c_new - kb] = acc
    assert len(parities) == 4, parities

    core = jnp.stack([parities[i] for i in range(4)], axis=1)  # [B, 4, Z]
    known = jnp.concatenate([info, core], axis=1)              # [B, kb+4, Z]

    # Extension parities: row r >= 4 involves info/core-parity columns plus
    # one extension parity (column kb+r, shift 0) — all rows in one
    # gather+reduce.
    for r in range(4, g.nof_rows):
        own = [(c, s) for c, s in g.rows[r] if c >= kb + 4]
        assert own == [(kb + r, 0)], (r, own)
    known_flat = jnp.concatenate([known.reshape(batch, (kb + 4) * z), zero],
                                 axis=1)
    ext_plan = _row_sum_plan(base_graph, z, tuple(range(4, g.nof_rows)),
                             kb + 4)
    ext = _row_sums(known_flat, ext_plan)                      # [B, R-4, Z]
    full = jnp.concatenate([known, ext], axis=1)
    return full.reshape(batch, g.nof_cols * z).astype(jnp.int8)


def encode_graph(bits: jnp.ndarray, graph: LdpcGraph) -> jnp.ndarray:
    return encode(bits, graph.base_graph, graph.z)
