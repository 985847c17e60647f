"""PRACH generation and detection (TS38.211 §6.3.3).

TPU-native analogue of prach_generator_impl + prach_detector_generic_impl
(lib/phy/upper/channel_processors/prach_detector_generic_impl.cpp:49-347):

1. derive N_cs, shifts per root, number of roots for 64 preambles;
2. per root (batched): multiply the frequency-domain rx preamble by the
   conjugate root, zero-pad into a power-of-two IDFT, modulus-square;
3. noncoherently combine ports / repetitions (optionally coherently combine
   symbol repetitions first, :226-255);
4. per cyclic-shift window: signal power in the window vs a noise reference
   (total energy minus the window), peak above threshold -> preamble index +
   timing advance.

Non-power-of-two DFTs (839/139) are direct DFT matmuls — on the MXU an
839x839 complex matmul is microseconds, no Bluestein needed.
"""

from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

from ...ran.prach_params import (LONG_FORMATS, PRACH_CP_KAPPA, SHORT_FORMATS,
                                 n_cs, restricted_cyclic_shifts,
                                 root_sequence_number, zc_sequence,
                                 LONG_SEQ, SHORT_SEQ)


@dataclasses.dataclass(frozen=True)
class PrachConfig:
    """Static PRACH occasion description (mirror of fapi ul_prach_pdu)."""

    format: str                  # '0'..'3', 'A1'.. 'C2'
    root_sequence_index: int     # logical index
    zero_correlation_zone: int
    nof_preambles: int = 64
    start_preamble: int = 0
    ra_scs_hz: int = 0           # short formats: 15000 << mu; long: from table
    # 'unrestricted' | 'type_a' | 'type_b' — restricted sets go beyond the
    # reference (its generator asserts them out, prach_generator_impl.cpp:260).
    restricted: str = "unrestricted"

    @property
    def is_long(self) -> bool:
        return self.format in LONG_FORMATS

    @property
    def l_ra(self) -> int:
        return LONG_SEQ if self.is_long else SHORT_SEQ

    @property
    def scs_hz(self) -> int:
        if self.is_long:
            return LONG_FORMATS[self.format][1]
        return self.ra_scs_hz or 15_000


@functools.lru_cache(maxsize=None)
def _root_set(cfg: PrachConfig):
    """(roots [R], preamble_map, ncs): preamble_map[p] = (root_idx, C_v).

    Unrestricted roots carry floor(L/N_cs) evenly spaced shifts; restricted
    roots carry the d_u-dependent C_v enumeration (TS38.211 §6.3.3.1), so
    the shift count varies per root and the walk continues across logical
    root indices until start_preamble + nof_preambles are assigned.
    """
    ncs = n_cs(cfg.zero_correlation_zone, cfg.scs_hz, cfg.restricted)
    roots: list = []
    pmap: list = []
    logical = cfg.root_sequence_index
    need = cfg.start_preamble + cfg.nof_preambles
    while len(pmap) < need:
        u = root_sequence_number(logical, cfg.is_long)
        shifts = restricted_cyclic_shifts(u, ncs, cfg.l_ra, cfg.restricted)
        if shifts:
            roots.append(u)
            ridx = len(roots) - 1
            pmap.extend((ridx, cs) for cs in shifts)
        logical += 1
        assert logical - cfg.root_sequence_index < 2 * cfg.l_ra, \
            "no restricted preambles available for this configuration"
    return tuple(roots), tuple(pmap[:need]), ncs


@functools.lru_cache(maxsize=None)
def _dft_matrix(n: int, inverse: bool = False) -> np.ndarray:
    k = np.arange(n)
    sign = 2j if inverse else -2j
    m = np.exp(sign * np.pi * np.outer(k, k) / n) / np.sqrt(n)
    return m.astype(np.complex64)


def dft_nonpow2(x: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Direct unitary DFT over the last axis via MXU matmul (any size)."""
    n = x.shape[-1]
    m = jnp.asarray(_dft_matrix(n, inverse))
    return jnp.matmul(x, m.T)


@functools.lru_cache(maxsize=None)
def _root_fd(cfg: PrachConfig) -> np.ndarray:
    """Frequency-domain root sequences [R, L] (unit-power bins)."""
    roots, _, _ = _root_set(cfg)
    tds = np.stack([zc_sequence(u, cfg.l_ra) for u in roots])
    fd = np.fft.fft(tds, axis=-1) / np.sqrt(cfg.l_ra)
    return fd.astype(np.complex64)


def generate_np(cfg: PrachConfig, preamble: int) -> np.ndarray:
    """Frequency-domain preamble [L], pure numpy (no device transfer —
    a complex64 h2d breaks the tunnel's d2h path, utils/transfer)."""
    roots, pmap, _ = _root_set(cfg)
    root_idx, cs = pmap[cfg.start_preamble + preamble]
    td = zc_sequence(roots[root_idx], cfg.l_ra, cs)
    fd = np.fft.fft(td) / np.sqrt(cfg.l_ra)
    return fd.astype(np.complex64)


def generate(cfg: PrachConfig, preamble: int) -> jnp.ndarray:
    """Frequency-domain preamble [L] for one preamble index (UE side / tests)."""
    return jnp.asarray(generate_np(cfg, preamble))


def cp_seq_samples(cfg: PrachConfig) -> float:
    """PRACH cyclic-prefix length in sequence-sample units (L_ra-rate).

    Long formats: N_CP * kappa*Tc seconds * (L_ra * ra_scs) samples/s.
    Short formats: the table's 2^-mu scaling cancels the 2^mu in the RA
    SCS, leaving N_CP * L_ra / 2048 for any numerology.
    """
    ncp = PRACH_CP_KAPPA[cfg.format]
    if cfg.is_long:
        return ncp / 30_720_000 * cfg.l_ra * cfg.scs_hz
    return ncp * cfg.l_ra / 2048.0


@dataclasses.dataclass
class PrachDetection:
    metrics: jnp.ndarray        # f32 [64] detection metric per preamble
    time_advance_s: jnp.ndarray  # f32 [64]
    detected: jnp.ndarray       # bool [64]
    rssi: jnp.ndarray           # f32 scalar


@functools.lru_cache(maxsize=None)
def _threshold_table() -> dict:
    import json
    from pathlib import Path
    path = (Path(__file__).resolve().parent.parent.parent / "data"
            / "prach_thresholds.json")
    if path.exists():
        return json.loads(path.read_text())
    return {}


def calibrated_threshold(cfg: PrachConfig, nof_ports: int,
                         default: float = 2.0) -> float:
    """Measured noise-floor threshold keyed (format, zcz, ports) — the
    analogue of prach_detector_generic_thresholds.h, produced by
    tools/calibrate_prach.py (0.1% false-alarm quantile + margin)."""
    tab = _threshold_table()
    key = f"{cfg.format}:{cfg.zero_correlation_zone}:{nof_ports}"
    if key in tab:
        return tab[key]
    # fall back to the nearest port count for this (format, zcz)
    for p in (4, 2, 1):
        k = f"{cfg.format}:{cfg.zero_correlation_zone}:{p}"
        if k in tab:
            return tab[k]
    return default


def detect(rx_fd: jnp.ndarray, cfg: PrachConfig,
           threshold: float | None = None,
           idft_size: int = 1024) -> PrachDetection:
    """Detect preambles.

    rx_fd: complex64 [ports, symbols, L] frequency-domain preamble captures.
    threshold: metric threshold; None uses the calibrated table
    (data/prach_thresholds.json) keyed by (format, zcz, rx ports).
    """
    if threshold is None:
        threshold = calibrated_threshold(cfg, rx_fd.shape[0])
    roots, pmap, ncs = _root_set(cfg)
    l_ra = cfg.l_ra
    rssi = jnp.mean(jnp.abs(rx_fd) ** 2)

    root_fd = jnp.asarray(_root_fd(cfg))                     # [R, L]
    # Correlate: [P, S, 1, L] * conj[1, 1, R, L]
    prod = rx_fd[:, :, None, :] * jnp.conj(root_fd)[None, None]
    # Pack the L bins into the IDFT input (split halves like the reference)
    half = (l_ra + 1) // 2
    buf = jnp.zeros(prod.shape[:-1] + (idft_size,), dtype=prod.dtype)
    buf = buf.at[..., :half].set(prod[..., :half])
    buf = buf.at[..., idft_size - (l_ra - half):].set(prod[..., half:])
    delay = jnp.fft.ifft(buf, axis=-1) * np.sqrt(idft_size)
    power = jnp.sum(jnp.abs(delay) ** 2, axis=(0, 1))        # [R, idft]

    # Delay search window, bounded by the PRACH cyclic prefix
    # (prach_detector_generic_impl.cpp:135-160: win_width = min(N_cs,
    # cp_prach), the whole CP when zeroCorrelationZone == 0).  Restricting
    # the search to physically possible delays is what keeps cross-root ZC
    # leakage (a chirp whose IDFT clusters at ARBITRARY delays) from firing
    # other preambles when one strong preamble is present.
    cp_lra = cp_seq_samples(cfg)
    cp_bins = max(1, int(cp_lra * idft_size / l_ra))
    ncs_bins = max(1, (ncs * idft_size) // l_ra) if ncs else idft_size
    win = min(ncs_bins if ncs else idft_size, cp_bins, idft_size)
    margin = min(max(4, win // 4), idft_size - win) if win < idft_size else 0
    # A cyclic shift C_v = v*ncs puts its correlation peak at delay bin
    # (N - C_v*N/L) + tau*scs*N (mod N): extend the power circularly so every
    # shift window (incl. its reference margin) is a contiguous slice.
    power3 = jnp.concatenate([power, power, power], axis=-1)

    metrics, tas, dets = [], [], []
    search = max(1, int(win * 0.8))
    for p in range(cfg.nof_preambles):
        root_idx, cs = pmap[cfg.start_preamble + p]
        start = (idft_size - (cs * idft_size) // l_ra) % idft_size
        base = idft_size + start - margin
        region = power3[root_idx, base:base + win + 2 * margin]
        seg = region[margin:margin + win]
        # Reference-style per-bin normalization
        # (prach_detector_generic_impl.cpp:272-299 + vector_noise_
        # estimation, prach_detector_generic_impl.h:76-86): the noise
        # reference is the LOCAL window +/- margin energy minus the bin's
        # own power — an isolated impulse (a real preamble) sees a noise
        # denominator, a leaked chirp cluster sees its own neighbors.
        ref = jnp.sum(region)
        den = jnp.maximum(ref - seg, 1e-12)
        metric_bins = (seg / den)[:search]
        peak_idx = jnp.argmax(metric_bins)
        metric = metric_bins[peak_idx] * win
        ta = peak_idx / (idft_size * cfg.scs_hz)
        metrics.append(metric)
        tas.append(ta)
        dets.append(metric > threshold)
    return PrachDetection(
        metrics=jnp.stack(metrics).astype(jnp.float32),
        time_advance_s=jnp.stack(tas).astype(jnp.float32),
        detected=jnp.stack(dets),
        rssi=rssi.astype(jnp.float32))
