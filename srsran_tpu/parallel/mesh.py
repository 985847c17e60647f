"""Device-mesh construction and multi-cell sharded slot programs.

The gNB-PHY parallel axes on TPU (BASELINE.json north star):
- 'cell'  — sectors are embarrassingly parallel -> data-parallel axis;
- 'port'  — antenna ports/layers are independent through OFDM and most of
  the grid pipeline -> model-parallel-like axis.

Cells and ports shard over a 2-D mesh; XLA inserts any needed collectives
(the precoding einsum contracts layers -> psum over 'port' when the layer
axis is sharded).  Multi-host slot pipelining rides jax's async dispatch —
slot N+1 is launched while slot N executes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..phy.slot_programs import CellConfig, dl_slot_core, ul_slot_core


def make_mesh(n_devices: int | None = None) -> Mesh:
    """Build a ('cell', 'port') mesh over the available devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    # Prefer sharding cells; give the port axis a factor when n is even & >2.
    if n >= 8:
        shape = (n // 2, 2)
    elif n >= 4:
        shape = (n // 2, 2)
    else:
        shape = (n, 1)
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, ("cell", "port"))


@functools.lru_cache(maxsize=None)
def multi_cell_dl_fn(cell: CellConfig, plan, nof_cells: int, mesh: Mesh,
                     slot_in_subframe: int = 0):
    """Jitted DL slot program over [cell, ...] batches, sharded on the mesh.

    Input payload pytrees carry a leading cell axis; samples come back
    [cell, port, T] sharded (cell, port).
    """
    core = dl_slot_core(cell, plan, slot_in_subframe)
    vfn = jax.vmap(core)
    return jax.jit(
        vfn,
        in_shardings=NamedSharding(mesh, P("cell")),
        out_shardings=(NamedSharding(mesh, P("cell", "port")),
                       NamedSharding(mesh, P("cell", "port"))),
    )


@functools.lru_cache(maxsize=None)
def multi_cell_ul_fn(cell: CellConfig, plan, nof_cells: int, mesh: Mesh,
                     slot_in_subframe: int = 0):
    """Jitted UL slot program over [cell, ...] batches, sharded on the mesh."""
    core = ul_slot_core(cell, plan, slot_in_subframe)
    vfn = jax.vmap(core)
    return jax.jit(vfn, in_shardings=NamedSharding(mesh, P("cell")))


def shard_cells(mesh: Mesh, tree):
    """Device-put a [cell, ...] pytree sharded over the 'cell' axis."""
    sh = NamedSharding(mesh, P("cell"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
