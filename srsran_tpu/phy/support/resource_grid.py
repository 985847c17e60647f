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
