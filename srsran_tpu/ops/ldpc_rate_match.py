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
import os

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

    Kept as the reference semantics for the slice-based fast path below
    (tests assert equality) and for exotic configs it can't express."""
    n_cb = min(n_ref, n) if n_ref else n
    k0 = rate_match_k0(base_graph, rv, n_cb, z)
    parts = []
    for j, e in enumerate(e_sizes):
        sel = _selection_indices(e, k0, n_cb, k_prime - 2 * z, k - 2 * z)
        perm = _interleave_perm(e, qm)
        parts.append(sel[perm].astype(np.int64) + j * n)
    return np.concatenate(parts)


@functools.lru_cache(maxsize=None)
def _window_plan(rv: int, base_graph: int, z: int, k_prime: int, k: int,
                 n: int, n_ref: int = 0):
    """Host-side geometry for the slice-based rate (de)match.

    TS38.212 bit selection is a circular CONTIGUOUS window over the
    filler-free circular buffer: skipping filler bits while walking mod Ncb
    is equivalent to deleting the filler range once and reading n_nf-
    periodically from the adjusted start k0'.  Returns
    (fs, fe, n_nf, k0p): filler range [fs, fe) within [0, n_cb), the
    filler-free buffer length, and the window start in filler-free coords.
    """
    n_cb = min(n_ref, n) if n_ref else n
    k0 = rate_match_k0(base_graph, rv, n_cb, z)
    fs = min(k_prime - 2 * z, n_cb)
    fe = min(k - 2 * z, n_cb)
    n_nf = n_cb - (fe - fs)
    k0p = k0 - max(0, min(k0, fe) - fs)
    return fs, fe, n_nf, k0p


def _group_e_sizes(e_sizes: tuple):
    """Contiguous runs of equal E (TS38.212 yields at most two values)."""
    groups = []
    start = 0
    for j in range(1, len(e_sizes) + 1):
        if j == len(e_sizes) or e_sizes[j] != e_sizes[start]:
            groups.append((start, j, e_sizes[start]))
            start = j
    return groups


# Implementation selectors for the whole-TB rate match/dematch.  Both
# formulations are semantically equal (tests assert it); same-process A/B
# on the flagship shapes (tools/bench_rm_ab.py, TPU v5e via the tunnel)
# measured: TX gather-plan 27.6us vs slice 32.1us for the full DL slot
# (gathers with constant indices map well), but RX scatter-add 85.9us vs
# slice+sum 66.9us for the full UL slot (TPU scatters serialize) — so the
# defaults are split per direction.
RM_TX_IMPL = os.environ.get("SRSRAN_TPU_RM_TX_IMPL", "gather")
RM_RX_IMPL = os.environ.get("SRSRAN_TPU_RM_RX_IMPL", "slice")


def rate_match_batch(codewords: jnp.ndarray, e_sizes, rv: int, qm: int,
                     base_graph: int, z: int, k_prime: int, k: int,
                     n_ref: int = 0) -> jnp.ndarray:
    """Rate-match all codeblocks of a TB: int8 [C, N] -> int8 [G].

    'gather' impl: ONE device gather over a host index plan (_tb_plan).
    'slice' impl: tiled circular window + reshape/transpose interleaver.
    """
    c, n = codewords.shape
    if RM_TX_IMPL == "gather":
        plan = _tb_plan(tuple(e_sizes), rv, qm, base_graph, z, k_prime, k, n,
                        n_ref)
        return jnp.take(codewords.reshape(-1), jnp.asarray(plan))
    fs, fe, n_nf, k0p = _window_plan(rv, base_graph, z, k_prime, k, n, n_ref)
    nofill = jnp.concatenate(
        [codewords[:, :fs], codewords[:, fe:min(n_ref, n) if n_ref else n]],
        axis=1)                                               # [C, n_nf]
    outs = []
    for g0, g1, e in _group_e_sizes(tuple(e_sizes)):
        reps = -(-(k0p + e) // n_nf)                          # ceil
        tiled = jnp.tile(nofill[g0:g1], (1, reps))
        sel = jax.lax.slice(tiled, (0, k0p), (g1 - g0, k0p + e))
        inter = sel.reshape(g1 - g0, qm, e // qm)
        outs.append(jnp.transpose(inter, (0, 2, 1)).reshape(-1))
    return jnp.concatenate(outs) if len(outs) > 1 else outs[0]


def rate_dematch_batch(llrs: jnp.ndarray, nof_codeblocks: int, e_sizes,
                       rv: int, qm: int, base_graph: int, z: int,
                       k_prime: int, k: int, n: int, n_ref: int = 0,
                       filler_llr: float = 1e4) -> jnp.ndarray:
    """Inverse of rate_match_batch: f32 [G] -> f32 [C, N] with LLR
    accumulation on repetitions and known-zero filler LLRs.

    'scatter'/'gather' impl: one segment scatter-add over the host index
    plan.  'slice' impl: transpose de-interleave + static slice-set + sum
    over the repetition axis.
    """
    c = nof_codeblocks
    if RM_RX_IMPL in ("gather", "scatter"):
        plan = _tb_plan(tuple(e_sizes), rv, qm, base_graph, z, k_prime, k, n,
                        n_ref)
        buf = jnp.zeros((c * n,), dtype=llrs.dtype)
        buf = buf.at[jnp.asarray(plan)].add(llrs).reshape(c, n)
        fs0, fe0 = k_prime - 2 * z, k - 2 * z
        if fe0 > fs0:
            buf = buf.at[:, fs0:fe0].set(filler_llr)
        return buf
    fs, fe, n_nf, k0p = _window_plan(rv, base_graph, z, k_prime, k, n, n_ref)
    n_cb = min(n_ref, n) if n_ref else n
    accs = []
    off = 0
    for g0, g1, e in _group_e_sizes(tuple(e_sizes)):
        cg = g1 - g0
        seg = jax.lax.slice(llrs, (off,), (off + cg * e,)).reshape(cg, e)
        off += cg * e
        # inverse of reshape(qm, E/qm).T.flatten()
        sel = jnp.transpose(seg.reshape(cg, e // qm, qm), (0, 2, 1))
        sel = sel.reshape(cg, e)
        reps = -(-(k0p + e) // n_nf)
        buf = jnp.zeros((cg, reps * n_nf), dtype=llrs.dtype)
        buf = jax.lax.dynamic_update_slice(buf, sel, (0, k0p))
        accs.append(buf.reshape(cg, reps, n_nf).sum(axis=1))  # [cg, n_nf]
    acc = jnp.concatenate(accs, axis=0) if len(accs) > 1 else accs[0]
    out = jnp.zeros((c, n), dtype=llrs.dtype)
    out = jax.lax.dynamic_update_slice(out, acc[:, :fs], (0, 0))
    out = jax.lax.dynamic_update_slice(out, acc[:, fs:], (0, fe))
    if fe > fs:
        filler = jnp.full((c, fe - fs), filler_llr, dtype=llrs.dtype)
        out = jax.lax.dynamic_update_slice(out, filler, (0, fs))
    del n_cb
    return out


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
