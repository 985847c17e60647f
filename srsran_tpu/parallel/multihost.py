"""Multi-host deployment scaffold (DCN slot pipeline).

The BASELINE north star runs multi-cell workloads across N >= 2 hosts with
>= 80% weak-scaling efficiency.  The deployment model (SURVEY §2.7):

- each host owns a shard of cells on its local chips (ICI mesh from
  `parallel.mesh`), exactly as in single-host mode;
- hosts join one `jax.distributed` job so global meshes spanning hosts are
  available for cross-host IQ movement (e.g. CP/overlap halo exchange when
  a cell's sample timeline is split across hosts — `ppermute` over the
  'cell' axis);
- slot pipelining across hosts needs no special transport: every host's
  conductor runs the same TDD timeline, and the only cross-host data is the
  (tiny) FAPI control plane, carried by gRPC or the native sampio rings.

This environment has a single chip, so multi-host paths are validated in
dryrun form only (virtual meshes); this module is the production entry.
"""

from __future__ import annotations

import os

import jax


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None):
    """Join the jax.distributed job (idempotent).

    Arguments default to the standard JAX env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), so a
    launcher can configure everything through the environment.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return False  # single-process mode
    if num_processes is None:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None:          # NOT `or`: process 0 is falsy
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id)
    return True


def global_cell_mesh():
    """('cell', 'port') mesh over every chip of every host.

    Cells shard over hosts first (cheap DCN: cells are independent), ports
    over the intra-host ICI axis.
    """
    import numpy as np
    from jax.sharding import Mesh

    devs = np.array(jax.devices())
    nproc = jax.process_count()
    per_host = len(devs) // max(nproc, 1)
    port_axis = 2 if per_host % 2 == 0 else 1
    return Mesh(devs.reshape(len(devs) // port_axis, port_axis),
                ("cell", "port"))


def halo_exchange_time_axis(samples, axis_name: str = "cell"):
    """Pass each shard's trailing CP-length samples to the next shard
    (overlap-save / CP-straddling exchange) — `ppermute` over the ring.

    For use inside shard_map'ed sample-domain filters when one cell's
    timeline is split across devices.  samples: [..., T_local].
    """
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    return jax.lax.ppermute(samples, axis_name, perm)
