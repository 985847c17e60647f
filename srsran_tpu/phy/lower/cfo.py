"""Baseband carrier-frequency-offset processor.

Analogue of baseband_cfo_processor / lower_phy_cfo_controller
(lib/phy/lower/processors/baseband_cfo_processor.h): scheduled CFO
commands (value + drift, effective from a given time) applied to baseband
sample blocks as a complex phase ramp.  The rotation itself is one fused
VPU expression; the command queue/drift bookkeeping is host-side exactly
like the reference's.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


def apply_cfo(samples: jnp.ndarray, cfo_norm, sample_offset: int = 0):
    """Rotate samples by exp(+j 2 pi cfo_norm (n + offset)).

    samples [..., T]; cfo_norm = cfo_Hz / sample_rate (may be traced).
    Mirrors the per-block sample_offset accumulation of the reference.
    """
    n = jnp.arange(samples.shape[-1]) + sample_offset
    rot = jnp.exp(2j * jnp.pi * cfo_norm * n).astype(samples.dtype)
    return samples * rot


@dataclasses.dataclass
class CfoCommand:
    time_s: float            # absolute time the command takes effect
    cfo_hz: float
    cfo_drift_hz_s: float = 0.0


class CfoProcessor:
    """Host-side controller: command queue + per-block phase continuity."""

    def __init__(self, sample_rate_hz: float):
        self.srate = float(sample_rate_hz)
        self._queue: list = []
        self._cfo_hz = 0.0
        self._drift = 0.0
        self._cfo_start_s = 0.0
        self._sample_offset = 0

    def schedule(self, cmd: CfoCommand) -> bool:
        self._queue.append(cmd)
        return True

    def next_command(self, now_s: float) -> None:
        """Per-block update (baseband_cfo_processor::next_cfo_command)."""
        self._sample_offset = 0
        if self._queue and now_s >= self._queue[0].time_s:
            cmd = self._queue.pop(0)
            self._cfo_hz = cmd.cfo_hz
            self._drift = cmd.cfo_drift_hz_s
            self._cfo_start_s = cmd.time_s
        if self._drift:
            self._cfo_hz = (self._cfo_hz
                            + self._drift * (now_s - self._cfo_start_s))
            self._cfo_start_s = now_s

    @property
    def cfo_norm(self) -> float:
        return self._cfo_hz / self.srate

    def process(self, samples: jnp.ndarray) -> jnp.ndarray:
        """Apply the current CFO to one block, advancing the sample phase."""
        if self._cfo_hz == 0.0:
            self._sample_offset += samples.shape[-1]
            return samples
        out = apply_cfo(samples, self.cfo_norm, self._sample_offset)
        self._sample_offset += samples.shape[-1]
        return out
