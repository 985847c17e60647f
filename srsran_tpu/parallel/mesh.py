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


def make_mesh(n_devices: int | None = None,
              nof_ports: int | None = None) -> Mesh:
    """Build a ('cell', 'port') mesh over the available devices.

    nof_ports bounds the port-axis factor (a 4x4-port cell on 8+ chips may
    shard ports 4-way); by default the port axis takes the largest power-of-
    two factor <= min(nof_ports or 2, n // 2) so cells keep at least 2-way
    sharding on 4+ chips.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    port_cap = nof_ports or 2
    port = 1
    while (port * 2 <= port_cap and n // (port * 2) >= 2
           and n % (port * 2) == 0):
        port *= 2
    arr = np.array(devs).reshape((n // port, port))
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


@functools.lru_cache(maxsize=None)
def single_cell_ul_time_sharded_fn(cell: CellConfig, plan, mesh: Mesh,
                                   axis: str = "cell",
                                   slot_in_subframe: int = 0):
    """UL slot program for ONE fat cell with the SAMPLE TIMELINE sharded
    over a mesh axis: the OFDM demodulator runs time-sharded (one halo
    ppermute per slot, parallel.seqpar), then the receive chain processes
    the assembled grid — all ONE compiled program.

    This is the deployment shape for a cell whose slot deadline needs more
    than one chip (the analogue of the reference splitting one cell's UL
    across executor threads, SURVEY §2.6): samples [P, T] arrive with T
    sharded over `axis`; results are replicated.
    """
    from .seqpar import demod_body
    demod = demod_body(cell, mesh, axis, slot_in_subframe)
    core = ul_slot_core(cell, plan, slot_in_subframe, from_grid=True)

    def run(samples, prach_fd, soft_buffers, ctx=None):
        return core(demod(samples), prach_fd, soft_buffers, ctx)

    return jax.jit(run)


def shard_cells(mesh: Mesh, tree):
    """Device-put a [cell, ...] pytree sharded over the 'cell' axis."""
    sh = NamedSharding(mesh, P("cell"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
