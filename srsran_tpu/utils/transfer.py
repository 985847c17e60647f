"""Device transfer helpers for the axon TPU tunnel.

Measured (r5, 2026-08-21): ONE host->device transfer of a complex64
array permanently breaks device->host reads for the rest of the process
on the tunnel backend (every later d2h raises UNIMPLEMENTED, and eager
complex allocation raises immediately).  This single behavior is why
indication resolve() "couldn't run on the tunnel" for three rounds — the
conductor's slot-context pilot uploads are complex64.

``device_put_complex`` uploads complex data as TWO float32 planes and
combines them ON DEVICE inside a tiny jitted program — no complex bytes
ever cross the tunnel h2d, and d2h (of real-typed results) stays alive.
Real-dtype arrays pass straight through ``jax.device_put``.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=1)
def _combine():
    import jax
    import jax.numpy as jnp
    return jax.jit(lambda r, i: (r + 1j * i).astype(jnp.complex64))


def device_put_complex(arr):
    """jax.device_put that never sends complex bytes over the wire."""
    import jax
    a = np.asarray(arr)
    if not np.iscomplexobj(a):
        return jax.device_put(a)
    r = jax.device_put(np.ascontiguousarray(a.real, dtype=np.float32))
    i = jax.device_put(np.ascontiguousarray(a.imag, dtype=np.float32))
    return _combine()(r, i)
