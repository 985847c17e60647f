"""SRS channel estimator (TS38.211 §6.4.1.4).

TPU-native analogue of srs_estimator_generic_impl
(lib/phy/upper/signal_processors/srs/srs_estimator_generic_impl.h:35-56):
correlate the received comb REs against the cyclic-shifted low-PAPR base
sequence per antenna port, average over symbols, IDFT-peak TA estimate,
wideband coefficient + noise per (rx port, tx port) pair.
"""

from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

from ...ops.low_papr import base_sequence
from ...ops import channel_estimate as chest


@dataclasses.dataclass(frozen=True)
class SrsConfig:
    """Static SRS occasion description (fapi ul_srs_pdu essentials)."""

    rb_start: int
    rb_count: int              # resolved m_SRS (from C_SRS/B_SRS tables)
    start_symbol: int
    nof_symbols: int           # 1, 2 or 4
    comb: int                  # K_TC: 2 or 4
    comb_offset: int
    cyclic_shift: int          # n_SRS_cs
    nof_ports: int             # N_ap: 1, 2 or 4
    sequence_id: int           # n_SRS_ID
    numerology: int = 0
    rnti: int = 0              # fapi ul_srs_pdu rnti (indication routing)

    @property
    def seq_len(self) -> int:
        return self.rb_count * 12 // self.comb

    @property
    def n_cs_max(self) -> int:
        return 8 if self.comb == 2 else 12


@functools.lru_cache(maxsize=None)
def port_sequence(cfg: SrsConfig, port: int) -> np.ndarray:
    """r^(alpha_p) for SRS port p (TS38.211 §6.4.1.4.2)."""
    u = cfg.sequence_id % 30
    m = cfg.seq_len
    base = base_sequence(u, 0, m)
    n_cs = (cfg.cyclic_shift + cfg.n_cs_max * port // cfg.nof_ports) % cfg.n_cs_max
    alpha = 2 * np.pi * n_cs / cfg.n_cs_max
    n = np.arange(m)
    return (np.exp(1j * alpha * n) * base).astype(np.complex64)


def sc_indices(cfg: SrsConfig) -> np.ndarray:
    return (cfg.rb_start * 12 + cfg.comb_offset
            + cfg.comb * np.arange(cfg.seq_len)).astype(np.int32)


def map_to_grid(grid: jnp.ndarray, cfg: SrsConfig) -> jnp.ndarray:
    """UE-side: place SRS for all ports (tests / UE emulation).

    Port p transmits on grid port p (identity mapping).
    """
    sc = jnp.asarray(sc_indices(cfg))
    for p in range(cfg.nof_ports):
        seq = jnp.asarray(port_sequence(cfg, p))
        for s in range(cfg.nof_symbols):
            grid = grid.at[p, cfg.start_symbol + s, sc].add(seq)
    return grid


def estimate(grid: jnp.ndarray, cfg: SrsConfig) -> chest.ChannelEstimate:
    """Estimate the [rx_port, srs_port] channel from a received grid."""
    sc = sc_indices(cfg)
    syms = np.arange(cfg.start_symbol, cfg.start_symbol + cfg.nof_symbols)
    rx = grid[:, jnp.asarray(syms), :][:, :, jnp.asarray(sc)]   # [P, S, K]
    expected = jnp.asarray(np.stack(
        [np.repeat(port_sequence(cfg, p)[None], cfg.nof_symbols, axis=0)
         for p in range(cfg.nof_ports)]))                        # [L, S, K]
    scs = 15_000 << cfg.numerology
    est = chest.estimate(
        rx, expected, sc - cfg.rb_start * 12 - cfg.comb_offset,
        cfg.seq_len * cfg.comb, cfg.nof_symbols, float(scs),
        stride=cfg.comb, smoothing="filter", estimate_cfo=False)

    # SRS-specific noise variance (srs_estimator_generic_impl.cpp:208-266):
    # the generic estimator's smoothing-filter residual leaks cyclic-shift
    # cross-talk between SRS ports into the noise term.  The reference
    # instead fits ONE TA-compensated wideband coefficient per (rx, tx)
    # port pair, reconstructs all ports' signals and subtracts them from
    # the symbol-accumulated received sequence — cyclic shifts are
    # orthogonal over the comb, so the residual is cross-talk-free.
    seq0 = expected[:, 0, :]                                     # [L, K]
    ls_mean = jnp.mean(rx[:, None] * jnp.conj(expected)[None],
                       axis=2)                                   # [P, L, K]
    k = jnp.arange(cfg.seq_len, dtype=jnp.float32)
    # per-comb-sample phase of a pure delay: 2*pi * ta * scs * comb
    phase = (2.0 * np.pi * float(scs) * cfg.comb
             * est.time_alignment_s.astype(jnp.float32)) * k
    ramp = jnp.exp(1j * phase).astype(jnp.complex64)
    wideband = jnp.mean(ls_mean * ramp[None, None, :], axis=-1)  # [P, L]
    recon = jnp.einsum("pl,lk->pk", wideband,
                       seq0 * jnp.conj(ramp)[None, :])           # [P, K]
    acc = jnp.sum(rx, axis=1)                                    # [P, K]
    resid = acc - cfg.nof_symbols * recon
    # each accumulated sample carries S*sigma^2 of noise; L wideband
    # coefficients were fit on the K samples -> K-L residual DOF
    dof = max(cfg.seq_len - cfg.nof_ports, 1)
    noise_var = jnp.sum(jnp.abs(resid) ** 2, axis=-1) / (
        float(cfg.nof_symbols) * dof)                            # [P]
    noise_var = jnp.maximum(noise_var, est.rsrp * 10 ** (-60 / 10))
    snr = est.rsrp / jnp.maximum(noise_var, 1e-12)
    return dataclasses.replace(est, noise_var=noise_var, snr=snr)
