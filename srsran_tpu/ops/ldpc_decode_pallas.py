"""Pallas TPU kernel: batched layered min-sum LDPC decoder.

Hand-scheduled alternative to ops/ldpc_decode.py (same algorithm — layered
normalized min-sum, reference ldpc_decoder_impl.h semantics) that keeps the
whole decoder state resident in VMEM across all iterations:

- LLRs          [Bt, NV, Z]  f32   (~0.8 MB at Z=384)
- per-row compressed check messages (min1, min2, argmin, packed signs)
  [Bt, R, Z] x 4 arrays (~2.3 MB) — the 19-edge c2v tensor is never
  materialized; each edge message is reconstructed as
  alpha * sgn_prod * sgn_e * (e == argmin ? min2 : min1).

Circulant lifts are static per-edge `pltpu.roll`s along the Z axis.  The
grid tiles the codeblock batch; one kernel invocation runs all iterations,
so HBM traffic is one read + one write of the LLRs total.

Measured (TPU v5e, 37 CBs x Z=384 BG1, 13 layers x 6 iters): 40 us with
batch_tile=40 (one grid step; 5 sequential bt=8 tiles cost 133 us).  The
XLA gather-plan decoder in ops/ldpc_decode.py measures 31 us on the same
shape — per-edge roll issue overhead dominates here — so the XLA path
remains the production default and this kernel is the hand-scheduled
alternative.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ldpc_graph import get_graph
from .ldpc_decode import DEFAULT_MAX_ITER, DEFAULT_SCALING


def _make_kernel(bg: int, z: int, nrows: int, max_iter: int, scaling: float,
                 batch_tile: int):
    g = get_graph(bg, z)
    rows = g.rows[:nrows]
    nv = g.nof_cols

    def kernel(llr_in, llr_out, m1_ref, m2_ref, am_ref, sg_ref):
        llr_out[...] = llr_in[...]
        m1_ref[...] = jnp.zeros_like(m1_ref)
        m2_ref[...] = jnp.zeros_like(m2_ref)
        am_ref[...] = jnp.zeros_like(am_ref)
        sg_ref[...] = jnp.zeros_like(sg_ref)

        def sweep(_, carry):
            for r, row in enumerate(rows):
                d = len(row)
                word = sg_ref[:, r]                       # [Bt, Z] int32
                par = jax.lax.population_count(word) & 1
                row_sign = (1 - 2 * par).astype(jnp.float32)
                m1 = m1_ref[:, r]
                m2 = m2_ref[:, r]
                am = am_ref[:, r]

                ts = []
                new_m1 = None
                new_m2 = None
                new_am = None
                new_word = jnp.zeros_like(word)
                for e, (col, shift) in enumerate(row):
                    v = llr_out[:, col]
                    if shift:
                        v = pltpu.roll(v, z - shift, axis=1)
                    sgn_e = (1 - 2 * ((word >> e) & 1)).astype(jnp.float32)
                    mag = jnp.where(am == e, m2, m1)
                    c2v = scaling * row_sign * sgn_e * mag
                    t = v - c2v
                    ts.append(t)
                    neg = (t < 0)
                    new_word = new_word | (neg.astype(jnp.int32) << e)
                    a = jnp.abs(t)
                    if new_m1 is None:
                        new_m1, new_m2 = a, jnp.full_like(a, 1e30)
                        new_am = jnp.zeros_like(am)
                    else:
                        is_min = a < new_m1
                        new_m2 = jnp.where(is_min, new_m1,
                                           jnp.minimum(new_m2, a))
                        new_am = jnp.where(is_min, e, new_am)
                        new_m1 = jnp.minimum(new_m1, a)

                new_par = jax.lax.population_count(new_word) & 1
                new_sign = (1 - 2 * new_par).astype(jnp.float32)
                for e, (col, shift) in enumerate(row):
                    sgn_e = (1 - 2 * ((new_word >> e) & 1)).astype(jnp.float32)
                    mag = jnp.where(new_am == e, new_m2, new_m1)
                    c2v = scaling * new_sign * sgn_e * mag
                    upd = ts[e] + c2v
                    if shift:
                        upd = pltpu.roll(upd, shift, axis=1)  # inverse roll
                    llr_out[:, col] = upd
                m1_ref[:, r] = new_m1
                m2_ref[:, r] = new_m2
                am_ref[:, r] = new_am
                sg_ref[:, r] = new_word
            return carry

        jax.lax.fori_loop(0, max_iter, sweep, 0)

    return kernel, nv


@functools.lru_cache(maxsize=None)
def _rotation_schedule(bg: int, z: int, nrows: int):
    """Static rotation-state schedule: keep each column's LLR block stored
    in the rotation of the LAST edge that touched it, so each edge visit
    needs at most ONE roll (the delta from the previous rotation) instead of
    the v1 kernel's roll-in + inverse-roll-out pair.

    Returns (steady_rot[c], per-row [(col, shift, read_delta)]) where
    read_delta is the roll amount aligning the stored block to this edge's
    shift.  steady_rot is both the pre-loop rotation applied to every column
    and the (identical) state at the start of every subsequent sweep, which
    is what lets one traced sweep body serve all iterations.
    """
    g = get_graph(bg, z)
    rows = g.rows[:nrows]
    steady = {}
    for row in rows:
        for c, s in row:
            steady[c] = s                     # last writer in a sweep wins
    rot = dict(steady)
    sched = []
    for row in rows:
        entries = []
        for c, s in row:
            delta = (rot.get(c, 0) - s) % z
            entries.append((c, s, delta))
            rot[c] = s
        sched.append(tuple(entries))
    return steady, tuple(sched)


def _make_kernel_v2(bg: int, z: int, nrows: int, max_iter: int,
                    scaling: float, batch_tile: int):
    """v2: rotation-state schedule (one roll per edge visit, not two)."""
    g = get_graph(bg, z)
    nv = g.nof_cols
    steady, sched = _rotation_schedule(bg, z, nrows)

    def kernel(llr_in, llr_out, m1_ref, m2_ref, am_ref, sg_ref):
        # pre-rotate every touched column into its steady-state rotation
        for c in range(nv):
            v = llr_in[:, c]
            s = steady.get(c, 0)
            if s:
                v = pltpu.roll(v, z - s, axis=1)
            llr_out[:, c] = v
        m1_ref[...] = jnp.zeros_like(m1_ref)
        m2_ref[...] = jnp.zeros_like(m2_ref)
        am_ref[...] = jnp.zeros_like(am_ref)
        sg_ref[...] = jnp.zeros_like(sg_ref)

        def sweep(_, carry):
            for r, entries in enumerate(sched):
                word = sg_ref[:, r]                       # [Bt, Z] int32
                par = jax.lax.population_count(word) & 1
                row_sign = (1 - 2 * par).astype(jnp.float32)
                m1 = m1_ref[:, r]
                m2 = m2_ref[:, r]
                am = am_ref[:, r]

                ts = []
                new_m1 = None
                new_m2 = None
                new_am = None
                new_word = jnp.zeros_like(word)
                for e, (col, _s, delta) in enumerate(entries):
                    v = llr_out[:, col]
                    if delta:
                        v = pltpu.roll(v, delta, axis=1)
                    sgn_e = (1 - 2 * ((word >> e) & 1)).astype(jnp.float32)
                    mag = jnp.where(am == e, m2, m1)
                    c2v = scaling * row_sign * sgn_e * mag
                    t = v - c2v
                    ts.append(t)
                    neg = (t < 0)
                    new_word = new_word | (neg.astype(jnp.int32) << e)
                    a = jnp.abs(t)
                    if new_m1 is None:
                        new_m1, new_m2 = a, jnp.full_like(a, 1e30)
                        new_am = jnp.zeros_like(am)
                    else:
                        is_min = a < new_m1
                        new_m2 = jnp.where(is_min, new_m1,
                                           jnp.minimum(new_m2, a))
                        new_am = jnp.where(is_min, e, new_am)
                        new_m1 = jnp.minimum(new_m1, a)

                new_par = jax.lax.population_count(new_word) & 1
                new_sign = (1 - 2 * new_par).astype(jnp.float32)
                for e, (col, _s, _d) in enumerate(entries):
                    sgn_e = (1 - 2 * ((new_word >> e) & 1)).astype(jnp.float32)
                    mag = jnp.where(new_am == e, new_m2, new_m1)
                    upd = ts[e] + scaling * new_sign * sgn_e * mag
                    llr_out[:, col] = upd      # stays in this edge's rotation
                m1_ref[:, r] = new_m1
                m2_ref[:, r] = new_m2
                am_ref[:, r] = new_am
                sg_ref[:, r] = new_word
            return carry

        jax.lax.fori_loop(0, max_iter, sweep, 0)

        # un-rotate back to canonical storage
        for c in range(nv):
            s = steady.get(c, 0)
            if s:
                llr_out[:, c] = pltpu.roll(llr_out[:, c], s, axis=1)

    return kernel, nv


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 7, 8))
def decode(llrs: jnp.ndarray, bg: int, z: int, nof_layers: int = 0,
           max_iter: int = DEFAULT_MAX_ITER, scaling: float = DEFAULT_SCALING,
           batch_tile: int = 8, interpret: bool = False, version: int = 2):
    """Pallas layered min-sum decode.  llrs f32 [B, NV*Z] -> (bits, soft).

    The batch is padded to a multiple of ``batch_tile``; each grid step
    decodes one tile with all state in VMEM.  version=2 uses the
    rotation-state schedule (half the rolls of v1).
    """
    g = get_graph(bg, z)
    nrows = nof_layers if nof_layers > 0 else g.nof_rows
    b = llrs.shape[0]
    bt = max(1, min(batch_tile, b))
    pad = (-b) % bt
    x = jnp.pad(llrs.astype(jnp.float32), ((0, pad), (0, 0)))
    xb = x.reshape(-1, g.nof_cols, z)
    make = _make_kernel_v2 if version == 2 else _make_kernel
    kernel, nv = make(bg, z, nrows, max_iter, scaling, bt)
    grid = xb.shape[0] // bt

    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((bt, nv, z), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bt, nv, z), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xb.shape, jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bt, nrows, z), jnp.float32),
            pltpu.VMEM((bt, nrows, z), jnp.float32),
            pltpu.VMEM((bt, nrows, z), jnp.int32),
            pltpu.VMEM((bt, nrows, z), jnp.int32),
        ],
        interpret=interpret,
    )(xb)
    soft = out.reshape(-1, g.nof_cols * z)[:b]
    bits = (soft < 0).astype(jnp.int8)
    return bits, soft
