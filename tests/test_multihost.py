"""Multi-host scaffold: halo exchange over a virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from srsran_tpu.parallel import multihost


def test_halo_exchange_ring():
    devs = jax.devices()[:4]
    mesh = Mesh(np.array(devs), ("cell",))
    x = jnp.arange(4 * 8, dtype=jnp.float32).reshape(4, 8)

    def body(local):
        # local [1, 8] per device; receive the left neighbor's tail
        halo = multihost.halo_exchange_time_axis(local[0, -2:], "cell")
        return jnp.concatenate([halo, local[0]])[None]

    out = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=P("cell"),
                                out_specs=P("cell")))(x)
    out = np.asarray(out)
    # device 1 should have received device 0's last two samples [6, 7]
    np.testing.assert_allclose(out[1, :2], [6.0, 7.0])
    np.testing.assert_allclose(out[0, :2], [30.0, 31.0])  # ring wrap


def test_initialize_single_process_noop():
    assert multihost.initialize() is False
