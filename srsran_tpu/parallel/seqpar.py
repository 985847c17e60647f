"""Sequence-parallel (time-sharded) OFDM demodulation.

The reference's "long sequence" dimension is the continuous sample stream
(SURVEY §5): one cell's slot timeline can be split across devices, with
CP-straddling symbol windows needing the tail of the previous shard —
the halo exchange of BASELINE.json.  This module is the production
consumer of parallel.multihost.halo_exchange_time_axis: each shard
receives its predecessor's tail via ppermute over the mesh ring, computes
the OFDM symbols that END inside its sample range with host-precomputed
static window plans, and a psum assembles the full [S, K] grid.

Equality with ops.ofdm.demodulate_slot is pinned in tests/test_seqpar.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops import ofdm
from ..ran.cyclic_prefix import CyclicPrefix, symbols_per_slot
from .multihost import halo_exchange_time_axis


@functools.lru_cache(maxsize=None)
def _shard_plans(cp: CyclicPrefix, numerology: int, dft_size: int,
                 slot_in_subframe: int, window_offset: int,
                 n_shards: int):
    """Per-shard (symbol indices, local window starts, halo length).

    A symbol belongs to the shard containing its LAST sample; its FFT
    window may start inside the previous shard, covered by a halo of
    H = dft_size + max_cp samples.  Window starts are returned relative to
    the concatenated [halo | local] buffer.
    """
    lens, starts, total = ofdm._symbol_layout(cp, numerology, dft_size,
                                              slot_in_subframe)
    assert total % n_shards == 0, (total, n_shards)
    local = total // n_shards
    halo = dft_size + max(lens)
    assert halo <= local, "shard shorter than one symbol + CP"
    plans = []
    for sh in range(n_shards):
        lo, hi = sh * local, (sh + 1) * local
        syms, wstarts = [], []
        for l in range(symbols_per_slot(cp)):
            s0 = starts[l] - window_offset
            if lo <= s0 + dft_size - 1 < hi:
                syms.append(l)
                wstarts.append(s0 - lo + halo)
        plans.append((tuple(syms), tuple(wstarts)))
    return plans, halo, local


def demod_body(cell, mesh, axis: str = "cell", slot_in_subframe: int = 0,
               window_offset: int = 0):
    """Build the time-sharded OFDM demodulator as a jit-composable callable
    samples [P, T] -> grid [P, S, K] (replicated) — so production UL slot
    programs (parallel.mesh.single_cell_ul_time_sharded_fn) can fuse it
    with the rest of the receive chain in ONE compiled program."""
    n_shards = mesh.shape[axis]
    plans, halo, local = _shard_plans(cell.cp, cell.numerology,
                                      cell.dft_size, slot_in_subframe,
                                      window_offset, n_shards)
    nsym = symbols_per_slot(cell.cp)
    comp = ofdm.phase_compensation(cell.cp, cell.numerology, cell.dft_size,
                                   slot_in_subframe, cell.center_freq_hz)
    all_syms = np.concatenate([np.asarray(p[0], np.int32) for p in plans])
    all_starts = np.concatenate([np.asarray(p[1], np.int32) for p in plans])
    counts = [len(p[0]) for p in plans]
    max_cnt = max(counts)
    # pad every shard's plan to the same count (masked): uniform shard body
    sym_tab = np.zeros((n_shards, max_cnt), np.int32)
    start_tab = np.zeros((n_shards, max_cnt), np.int32)
    mask_tab = np.zeros((n_shards, max_cnt), np.float32)
    o = 0
    for sh, cnt in enumerate(counts):
        sym_tab[sh, :cnt] = all_syms[o:o + cnt]
        start_tab[sh, :cnt] = all_starts[o:o + cnt]
        mask_tab[sh, :cnt] = 1.0
        o += cnt

    def body(local_samples):
        # local_samples: [P, local]
        idx = jax.lax.axis_index(axis)
        tail = local_samples[..., -halo:]
        halo_in = halo_exchange_time_axis(tail, axis)       # from predecessor
        buf = jnp.concatenate([halo_in, local_samples], axis=-1)
        syms = jnp.asarray(sym_tab)[idx]
        wst = jnp.asarray(start_tab)[idx]
        msk = jnp.asarray(mask_tab)[idx]
        # gather the FFT windows: [P, max_cnt, N]
        win_idx = wst[:, None] + jnp.arange(cell.dft_size)[None, :]
        wins = buf[:, win_idx]
        bins = jnp.fft.fft(wins, axis=-1, norm="ortho")
        if window_offset:
            kbin = np.arange(cell.dft_size)
            kbin = np.where(kbin < cell.dft_size // 2, kbin,
                            kbin - cell.dft_size)
            rot = np.exp(1j * 2 * np.pi * window_offset * kbin
                         / cell.dft_size).astype(np.complex64)
            bins = bins * jnp.asarray(rot)
        cvec = jnp.conj(jnp.asarray(comp))[syms]
        bins = bins * cvec[None, :, None] * msk[None, :, None]
        grid_bins = jnp.zeros((local_samples.shape[0], nsym, cell.dft_size),
                              jnp.complex64)
        grid_bins = grid_bins.at[:, syms].add(bins)
        # every shard contributes its symbols; sum assembles the slot
        return jax.lax.psum(grid_bins, axis)

    sharded = jax.shard_map(body, mesh=mesh, in_specs=P(None, axis),
                            out_specs=P())

    def demod(samples):
        return ofdm._bins_to_grid(sharded(samples), cell.nof_sc)

    return demod


def demodulate_slot_timesharded(samples, cell, mesh, axis: str = "cell",
                                slot_in_subframe: int = 0,
                                window_offset: int = 0):
    """OFDM-demodulate one cell's slot with the SAMPLE TIMELINE sharded.

    samples: complex64 [P, T] with T sharded over `axis` of the mesh.
    Returns the full [P, S, K] grid (replicated).  The cross-shard data
    movement is ONE ppermute of the halo (dft+max_cp samples per port).
    """
    fn = demod_body(cell, mesh, axis, slot_in_subframe, window_offset)
    return jax.jit(fn)(samples)
