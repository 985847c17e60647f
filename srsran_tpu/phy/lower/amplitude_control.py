"""Amplitude control: scaling / soft clipping before the DAC.

TPU-native analogue of amplitude_controller_{clipping,scaling}_impl
(lib/phy/lower/amplitude_controller/): gain application with optional
ceiling clipping, reporting peak/RMS/clipping metrics like the reference's
amplitude_controller_metrics.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass
class AmplitudeMetrics:
    avg_power_db: jnp.ndarray
    peak_power_db: jnp.ndarray
    papr_db: jnp.ndarray
    clipped_ratio: jnp.ndarray


def scale(samples: jnp.ndarray, gain_db: float = 0.0):
    g = 10.0 ** (gain_db / 20.0)
    out = samples * g
    return out, _metrics(out, 0.0)


def clip(samples: jnp.ndarray, gain_db: float = 0.0,
         ceiling_dbfs: float = 0.0, full_scale: float = 1.0):
    """Scale then hard-clip the magnitude at the ceiling."""
    g = 10.0 ** (gain_db / 20.0)
    x = samples * g
    ceil_lin = full_scale * 10.0 ** (ceiling_dbfs / 20.0)
    mag = jnp.abs(x)
    over = mag > ceil_lin
    x = jnp.where(over, x * (ceil_lin / jnp.maximum(mag, 1e-12)), x)
    clipped = jnp.mean(over.astype(jnp.float32))
    return x.astype(jnp.complex64), _metrics(x, clipped)


def _metrics(x: jnp.ndarray, clipped) -> AmplitudeMetrics:
    p = jnp.abs(x) ** 2
    avg = jnp.maximum(jnp.mean(p), 1e-15)
    peak = jnp.maximum(jnp.max(p), 1e-15)
    return AmplitudeMetrics(
        avg_power_db=10 * jnp.log10(avg),
        peak_power_db=10 * jnp.log10(peak),
        papr_db=10 * jnp.log10(peak / avg),
        clipped_ratio=jnp.asarray(clipped, dtype=jnp.float32))
