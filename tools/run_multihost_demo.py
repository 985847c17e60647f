#!/usr/bin/env python3
"""Two-process jax.distributed DCN demo on one machine (CPU backend).

Validates the multi-host deployment path (parallel/multihost.py) with a
REAL coordinator + two processes, not just a virtual mesh: each "host"
contributes 2 virtual CPU devices, a global ('cell','port') mesh spans
both, a sharded DL slot batch runs on it, and the halo exchange crosses
the process boundary.

Usage (launcher mode — spawns both workers and reports):
  PALLAS_AXON_POOL_IPS= PALLAS_AXON_REMOTE_COMPILE=0 \
      python tools/run_multihost_demo.py
"""

import os
import subprocess
import sys


def worker(pid: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from srsran_tpu.parallel import multihost

    ok = multihost.initialize("127.0.0.1:29511", 2, pid)
    assert ok and jax.process_count() == 2, jax.process_count()
    mesh = multihost.global_cell_mesh()
    assert mesh.devices.size == 4, mesh

    # a sharded compute + the DCN halo exchange across the 'cell' ring
    from jax.experimental.shard_map import shard_map

    def step(x):
        def body(lx):
            halo = multihost.halo_exchange_time_axis(lx[..., -2:], "cell")
            return jnp.concatenate([halo, lx[..., :-2]], axis=-1)
        return shard_map(body, mesh=mesh, in_specs=P("cell", None),
                         out_specs=P("cell", None))(x)

    n_cells = mesh.shape["cell"]
    x = jax.device_put(
        jnp.arange(n_cells * 8, dtype=jnp.float32).reshape(n_cells, 8),
        NamedSharding(mesh, P("cell", None)))
    y = jax.jit(step)(x)
    # ring shift: row r's tail lands at row (r+1) % n
    local = np.asarray(
        jax.experimental.multihost_utils.process_allgather(y, tiled=False))
    got = local.reshape(-1, n_cells, 8)[0]
    want_head = np.stack([np.arange(((r - 1) % n_cells) * 8 + 6,
                                    ((r - 1) % n_cells) * 8 + 8)
                          for r in range(n_cells)])
    assert np.array_equal(got[:, :2], want_head), (got, want_head)
    if pid == 0:
        print(f"multihost demo ok: processes={jax.process_count()} "
              f"devices={jax.device_count()} mesh={dict(mesh.shape)} "
              f"halo ring verified across the process boundary")


def main():
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
        return
    env = dict(os.environ)
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", str(p)],
        env=env) for p in range(2)]
    rcs = [p.wait(timeout=600) for p in procs]
    assert rcs == [0, 0], rcs


if __name__ == "__main__":
    main()
