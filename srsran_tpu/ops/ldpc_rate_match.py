"""LDPC rate matching / dematching (TS38.212 §5.4.2) via index-plan gathers.

TPU-native replacement for ldpc_rate_matcher_impl / ldpc_rate_dematcher_*
(lib/phy/upper/channel_coding/ldpc/ldpc_rate_matcher_impl.cpp:46-101): the
bit-selection walk (start at k0, skip filler bits, wrap mod Ncb) and the
modulation-order interleaver are both pure index permutations, so we
precompute an int32 index plan on the host once per static config and run
a single gather (match) or segment-sum scatter-add (dematch, accumulating
repeated LLRs) on device.  Batched over codeblocks.

The codeword enters WITHOUT the first 2Z punctured systematic bits (the
rate-match circular buffer of TS38.212 starts after puncturing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ran.ldpc_params import rate_match_k0


@functools.lru_cache(maxsize=None)
def _selection_indices(e: int, k0: int, n_cb: int,
                       filler_start: int, filler_end: int) -> np.ndarray:
    """Positions in the circular buffer for each of the E output bits.

    filler_[start,end): filler-bit range within the buffer (indices relative
    to the buffer, i.e. already excluding the 2Z punctured bits).
    """
    idx = np.empty(e, dtype=np.int32)
    k = k0 % n_cb
    for j in range(e):
        while filler_start <= k < filler_end:
            k = (k + 1) % n_cb
        idx[j] = k
        k = (k + 1) % n_cb
    return idx


@functools.lru_cache(maxsize=None)
def _interleave_perm(e: int, qm: int) -> np.ndarray:
    """TS38.212 §5.4.2.2: f_{i+j*Qm} = e_{i*E/Qm + j}; returns src index per out pos."""
    rows = e // qm
    perm = np.arange(e, dtype=np.int32).reshape(qm, rows).T.reshape(-1)
    return perm


def rate_match(codeword: jnp.ndarray, e: int, rv: int, qm: int,
               base_graph: int, z: int, k_prime: int, k: int,
               n_ref: int = 0) -> jnp.ndarray:
    """Select+interleave E bits from a codeword batch.

    codeword: int8 [B, N] (N = 66Z/50Z, punctured bits already removed).
    k_prime/k: info bits before/after filler insertion (filler range is
    [k_prime - 2Z, k - 2Z) within the buffer).
    """
    n = codeword.shape[-1]
    n_cb = min(n_ref, n) if n_ref else n
    k0 = rate_match_k0(base_graph, rv, n_cb, z)
    sel = _selection_indices(e, k0, n_cb, k_prime - 2 * z, k - 2 * z)
    perm = _interleave_perm(e, qm)
    plan = jnp.asarray(sel[perm])
    return jnp.take(codeword, plan, axis=-1)


@functools.lru_cache(maxsize=None)
def _tb_plan(e_sizes: tuple, rv: int, qm: int, base_graph: int, z: int,
             k_prime: int, k: int, n: int, n_ref: int = 0) -> np.ndarray:
    """Flat [G] index plan over a whole transport block: output bit g of the
    concatenated codeword maps to flat position (cb * N + buffer_idx).

    This collapses the per-codeblock rate-match loop into ONE device gather
    (TX) / segment scatter-add (RX) — the per-CB thread fan-out of
    pdsch_processor_flexible_impl becomes a single indexed move."""
    n_cb = min(n_ref, n) if n_ref else n
    k0 = rate_match_k0(base_graph, rv, n_cb, z)
    parts = []
    for j, e in enumerate(e_sizes):
        sel = _selection_indices(e, k0, n_cb, k_prime - 2 * z, k - 2 * z)
        perm = _interleave_perm(e, qm)
        parts.append(sel[perm].astype(np.int64) + j * n)
    return np.concatenate(parts)


def rate_match_batch(codewords: jnp.ndarray, e_sizes, rv: int, qm: int,
                     base_graph: int, z: int, k_prime: int, k: int,
                     n_ref: int = 0) -> jnp.ndarray:
    """Rate-match all codeblocks of a TB in one gather.

    codewords: int8 [C, N] -> int8 [G = sum(e_sizes)]."""
    c, n = codewords.shape
    plan = _tb_plan(tuple(e_sizes), rv, qm, base_graph, z, k_prime, k, n,
                    n_ref)
    return jnp.take(codewords.reshape(-1), jnp.asarray(plan))


def rate_dematch_batch(llrs: jnp.ndarray, nof_codeblocks: int, e_sizes,
                       rv: int, qm: int, base_graph: int, z: int,
                       k_prime: int, k: int, n: int, n_ref: int = 0,
                       filler_llr: float = 1e4) -> jnp.ndarray:
    """Inverse of rate_match_batch: f32 [G] -> f32 [C, N] with LLR
    accumulation on repetitions and known-zero filler LLRs."""
    plan = _tb_plan(tuple(e_sizes), rv, qm, base_graph, z, k_prime, k, n,
                    n_ref)
    buf = jnp.zeros((nof_codeblocks * n,), dtype=llrs.dtype)
    buf = buf.at[jnp.asarray(plan)].add(llrs).reshape(nof_codeblocks, n)
    fs, fe = k_prime - 2 * z, k - 2 * z
    if fe > fs:
        buf = buf.at[:, fs:fe].set(filler_llr)
    return buf


def rate_dematch(llrs: jnp.ndarray, rv: int, qm: int,
                 base_graph: int, z: int, k_prime: int, k: int,
                 n: int, n_ref: int = 0,
                 filler_llr: float = 1e4) -> jnp.ndarray:
    """Inverse: deinterleave + scatter-accumulate E LLRs into an N buffer.

    llrs: f32 [B, E].  Repeated positions accumulate (soft combining of
    repetitions, as the reference dematcher does).  Filler positions get a
    strongly-positive LLR (known 0 bits).  Returns f32 [B, N].
    """
    e = llrs.shape[-1]
    n_cb = min(n_ref, n) if n_ref else n
    k0 = rate_match_k0(base_graph, rv, n_cb, z)
    sel = _selection_indices(e, k0, n_cb, k_prime - 2 * z, k - 2 * z)
    perm = _interleave_perm(e, qm)
    plan = jnp.asarray(sel[perm])  # out position for each input llr
    buf = jnp.zeros(llrs.shape[:-1] + (n,), dtype=llrs.dtype)
    buf = buf.at[..., plan].add(llrs)
    fs, fe = k_prime - 2 * z, k - 2 * z
    if fe > fs:
        buf = buf.at[..., fs:fe].set(filler_llr)
    return buf
