"""Resource grid storage (cbf16 packing) and buffer rings.

The reference stores grids as complex-bfloat16 (cbf16_t,
lib/phy/support/resource_grid_impl.h:40-64) to halve memory bandwidth.
JAX has no complex-bf16, so the cbf16 grid is a [..., 2] bfloat16 array
(real/imag planes); compute paths convert at the boundary.  The pool is a
ring of donated device buffers — the analogue of resource_grid_pool_impl's
slot-keyed double buffering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def to_cbf16(grid: jnp.ndarray) -> jnp.ndarray:
    """complex64 [...] -> bfloat16 [..., 2]."""
    return jnp.stack([grid.real.astype(jnp.bfloat16),
                      grid.imag.astype(jnp.bfloat16)], axis=-1)


def from_cbf16(packed: jnp.ndarray) -> jnp.ndarray:
    """bfloat16 [..., 2] -> complex64 [...]."""
    r = packed[..., 0].astype(jnp.float32)
    i = packed[..., 1].astype(jnp.float32)
    return (r + 1j * i).astype(jnp.complex64)


def _is_advanced_index(x) -> bool:
    """True for advanced (array) index elements; slices/Ellipsis/None and
    integer scalars (python or numpy, incl. 0-d arrays) are basic."""
    if isinstance(x, (slice, type(Ellipsis), type(None), int)):
        return False
    import numpy as _np
    if isinstance(x, _np.integer):
        return False
    if getattr(x, "ndim", None) == 0:       # 0-d array acts like a scalar
        return False
    return True        # ndarray / jnp array / list / anything array-like


def _norm_index(idx):
    """Prepend a full slice for the LEADING plane axis so channel-processor
    indices written against a complex [..., K] grid address the packed
    [2, ..., K] planes unchanged.  The plane axis leads (not trails)
    because the last axis must stay the subcarrier axis: a trailing
    size-2 axis lands in the TPU lane dimension and destroys tiling
    (measured 2x UL slowdown on the flagship cell).

    Advanced indices separated by a slice are rejected: NumPy/JAX move the
    broadcast dims of such an index to the FRONT of the result — ahead of
    the prepended plane axis — so _planes_to_complex would split real/imag
    along a data axis and silently return garbage.  Raising turns that
    silent-corruption hazard into an error (all channel processors use
    adjacent advanced indices)."""
    if not isinstance(idx, tuple):
        idx = (idx,)
    adv = [i for i, x in enumerate(idx) if _is_advanced_index(x)]
    if adv and adv[-1] - adv[0] + 1 != len(adv):
        raise IndexError(
            "PackedGrid does not support advanced indices separated by "
            "slices (broadcast dims would move ahead of the plane axis); "
            f"got advanced indices at positions {adv}")
    return (slice(None),) + idx


def _planes_to_complex(planes: jnp.ndarray) -> jnp.ndarray:
    r = planes[0].astype(jnp.float32)
    i = planes[1].astype(jnp.float32)
    return (r + 1j * i).astype(jnp.complex64)


def _complex_to_planes(v: jnp.ndarray) -> jnp.ndarray:
    v = jnp.asarray(v)
    return jnp.stack([v.real.astype(jnp.bfloat16),
                      v.imag.astype(jnp.bfloat16)], axis=0)


class _PackedAt:
    """`.at[idx]` proxy: scatters convert the (small) update patch to bf16
    planes; the full-grid tensor is only ever touched in bf16."""

    __slots__ = ("_planes", "_idx")

    def __init__(self, planes, idx):
        self._planes = planes
        self._idx = _norm_index(idx)

    def _planes_update(self, values):
        """Broadcast to the selection's complex shape BEFORE prepending the
        plane axis: with the leading [2, ...] layout, right-aligned numpy
        broadcasting would otherwise land the plane dim on a grid axis."""
        sel = jax.eval_shape(lambda p: p[self._idx], self._planes)
        return _complex_to_planes(
            jnp.broadcast_to(jnp.asarray(values), sel.shape[1:]))

    def add(self, values):
        return PackedGrid(self._planes.at[self._idx].add(
            self._planes_update(values)))

    def set(self, values):
        return PackedGrid(self._planes.at[self._idx].set(
            self._planes_update(values)))


class _PackedAtProxy:
    __slots__ = ("_planes",)

    def __init__(self, planes):
        self._planes = planes

    def __getitem__(self, idx):
        return _PackedAt(self._planes, idx)


@jax.tree_util.register_pytree_node_class
class PackedGrid:
    """Resource grid stored as complex-bf16 (the reference's cbf16_t,
    resource_grid_impl.h:40-64): bfloat16 real/imag planes [2, ..., K]
    (plane axis LEADS so the subcarrier axis stays in the lane dimension).

    Drop-in for the complex64 grid inside the jit slot programs: gathers
    (`grid[idx]`) pull the bf16 planes and convert ONLY the gathered patch
    to complex64; scatters (`grid.at[idx].add/set`) convert the update
    patch to bf16.  Every full-grid HBM materialization between pipeline
    stages is therefore half the bytes of the complex64 layout, which is
    the reference's stated reason for cbf16 storage.
    """

    __slots__ = ("planes",)

    def __init__(self, planes: jnp.ndarray):
        self.planes = planes

    @classmethod
    def zeros(cls, shape) -> "PackedGrid":
        return cls(jnp.zeros((2,) + tuple(shape), dtype=jnp.bfloat16))

    @property
    def shape(self):
        return self.planes.shape[1:]

    @property
    def dtype(self):
        return jnp.complex64

    @property
    def ndim(self):
        return self.planes.ndim - 1

    def __getitem__(self, idx) -> jnp.ndarray:
        return _planes_to_complex(self.planes[_norm_index(idx)])

    @property
    def at(self):
        return _PackedAtProxy(self.planes)

    def to_complex(self) -> jnp.ndarray:
        return _planes_to_complex(self.planes)

    def tree_flatten(self):
        return (self.planes,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])


def pack_grid(grid) -> "PackedGrid":
    """complex grid -> PackedGrid (no-op if already packed)."""
    if isinstance(grid, PackedGrid):
        return grid
    return PackedGrid(_complex_to_planes(grid))


def as_complex(grid) -> jnp.ndarray:
    """PackedGrid or complex ndarray -> complex64 ndarray."""
    if isinstance(grid, PackedGrid):
        return grid.to_complex()
    return grid


class GridPool:
    """Ring of per-slot grids (resource_grid_pool_impl analogue).

    Slots cycle through ``depth`` preallocated device buffers so slot N+1
    never overwrites a grid slot N's consumer still reads.
    """

    def __init__(self, nof_ports: int, nof_symbols: int, nof_sc: int,
                 depth: int = 4, cbf16: bool = False):
        shape = ((nof_ports, nof_symbols, nof_sc, 2) if cbf16
                 else (nof_ports, nof_symbols, nof_sc))
        dtype = jnp.bfloat16 if cbf16 else jnp.complex64
        self._bufs = [jnp.zeros(shape, dtype=dtype) for _ in range(depth)]
        self.depth = depth

    def get(self, slot_count: int) -> jnp.ndarray:
        return self._bufs[slot_count % self.depth]

    def put(self, slot_count: int, grid: jnp.ndarray):
        self._bufs[slot_count % self.depth] = grid
