"""DM-RS port channel estimation (LS + smoothing + interpolation + TA).

TPU-native replacement for port_channel_estimator_average_impl
(lib/phy/upper/signal_processors/port_channel_estimator_average_impl.h:38-165
and port_channel_estimator_helpers.cpp): per hop/layer/port,

1. extract received pilots, accumulate EPRE;
2. LS estimate = rx * conj(expected), CFO from phase slope between repeated
   DM-RS symbols, average across DM-RS symbols;
3. frequency-domain smoothing: 'none' | 'mean' | 'filter' (raised-cosine FIR,
   roll-off 0.2, truncated taps, renormalized — helpers.cpp:47-119);
4. RSRP from filtered pilots; TA from IDFT power peak; noise variance =
   power of (received - reconstructed) pilots;
5. linear interpolation comb -> all subcarriers, replicate across time.

All steps batched over [rx_port, layer]; fully fused under jit.
"""

from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np


import jax


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ChannelEstimate:
    """Per-(rx_port, layer) results over one allocation (a JAX pytree)."""

    # complex64 [P, L, S, nsc] channel per RE.  S == nof_symbols for the
    # 'interpolate' time strategy; S == 1 for 'average' (time-constant —
    # consumers index [:, :, 0] instead of forcing a broadcast through HBM).
    coeffs: jnp.ndarray
    noise_var: jnp.ndarray   # f32 [P]
    rsrp: jnp.ndarray        # f32 [P]
    epre: jnp.ndarray        # f32 [P]
    snr: jnp.ndarray         # f32 [P]
    time_alignment_s: jnp.ndarray  # f32 scalar
    cfo_hz: jnp.ndarray      # f32 scalar (0 if not estimated)


@functools.lru_cache(maxsize=None)
def _rc_filter(rolloff: float = 0.2, stride: int = 2,
               nof_rb: int = 3) -> np.ndarray:
    """Raised-cosine smoothing FIR (port_channel_estimator_helpers.cpp:47-119).

    The reference designs ONE full-rate pulse on the subcarrier lattice
    (10 samples per 'symbol', 31 taps = 3-RB span) that attenuates time
    components beyond Ts/10 (> the ~Ts/14 CP), then DOWNSAMPLES it by the
    pilot stride and renormalizes — so the continuous-time response (and
    hence the delay spread it tracks) is the same for any pilot density,
    including contiguous (stride 1) PUCCH F3/F4 pilots."""
    span_rb = min(nof_rb, 3)
    nof_full = span_rb * 10 + 1
    half = nof_full // 2 // stride
    k = np.arange(-half, half + 1) * stride / 10.0
    with np.errstate(divide="ignore", invalid="ignore"):
        h = np.sinc(k) * np.cos(np.pi * rolloff * k) / (1 - (2 * rolloff * k) ** 2)
    h[~np.isfinite(h)] = np.pi / 4 * np.sinc(1 / (2 * rolloff)) if rolloff else 0.0
    h = np.nan_to_num(h)
    return (h / h.sum()).astype(np.float32)


def _smooth(ls: jnp.ndarray, strategy: str, stride: int) -> jnp.ndarray:
    """Frequency smoothing over the pilot axis (last)."""
    if strategy == "none":
        return ls
    if strategy == "mean":
        return jnp.mean(ls, axis=-1, keepdims=True) * jnp.ones_like(ls)
    taps = _rc_filter(stride=stride)
    pad = len(taps) // 2
    ext = jnp.concatenate([
        jnp.repeat(ls[..., :1], pad, axis=-1), ls,
        jnp.repeat(ls[..., -1:], pad, axis=-1)], axis=-1)
    kern = jnp.asarray(taps)
    real = _conv1d(ext.real, kern)
    imag = _conv1d(ext.imag, kern)
    return (real + 1j * imag).astype(ls.dtype)


def _conv1d(x: jnp.ndarray, kern: jnp.ndarray) -> jnp.ndarray:
    """'valid' correlation along the last axis for arbitrary leading dims."""
    k = kern.shape[0]
    n = x.shape[-1] - k + 1
    idx = jnp.arange(n)[:, None] + jnp.arange(k)[None, :]
    windows = x[..., idx]                          # [..., n, k]
    return jnp.einsum("...nk,k->...n", windows, kern)


@functools.lru_cache(maxsize=None)
def _smooth_interp_matrix(pilot_scs_key: tuple, nof_sc: int, strategy: str,
                          stride: int) -> np.ndarray:
    """Host-precomputed [nof_sc, K_p] operator = (linear interpolation to the
    full lattice) ∘ (frequency smoothing).

    Collapses edge-pad + RC-filter correlation + per-target gather/lerp into
    ONE MXU matmul on device (the op-count, not FLOPs, dominates these small
    shapes).  Equality with the step-by-step path is pinned in tests.
    """
    x = np.asarray(pilot_scs_key, dtype=np.float32)
    k_p = len(x)
    # interpolation matrix I [nof_sc, K_p]
    xi = np.arange(nof_sc, dtype=np.float32)
    right = np.searchsorted(x, xi, side="left").clip(1, k_p - 1)
    left = right - 1
    denom = x[right] - x[left]
    w_r = np.where(denom > 0, (xi - x[left]) / np.maximum(denom, 1e-9), 0.0)
    w_r = np.clip(w_r, 0.0, 1.0).astype(np.float32)
    i_mat = np.zeros((nof_sc, k_p), np.float32)
    i_mat[np.arange(nof_sc), left] += 1.0 - w_r
    i_mat[np.arange(nof_sc), right] += w_r
    if strategy == "none":
        return i_mat
    if strategy == "mean":
        # interp of a constant is the constant: every row averages pilots
        return np.full((nof_sc, k_p), 1.0 / k_p, np.float32)
    taps = _rc_filter(stride=stride)
    pad = len(taps) // 2
    f_mat = np.zeros((k_p, k_p), np.float32)
    rows = np.arange(k_p)
    for t, h in enumerate(taps):
        src = rows - pad + t
        # Out-of-band sources: LINEAR extrapolation from the nearest two
        # pilots (the matrix analogue of the reference's virtual pilots,
        # port_channel_estimator_helpers.cpp compute_v_pilots — without it
        # edge-replication corrupts filter-span/2 subcarriers at each edge,
        # most of a small PUCCH allocation).
        low = src < 0
        high = src > k_p - 1
        mid = ~(low | high)
        np.add.at(f_mat, (rows[mid], src[mid]), h)
        if low.any() and k_p >= 2:
            s = src[low].astype(np.float32)          # negative
            np.add.at(f_mat, (rows[low], np.zeros(low.sum(), int)),
                      h * (1.0 - s))
            np.add.at(f_mat, (rows[low], np.ones(low.sum(), int)), h * s)
        elif low.any():
            np.add.at(f_mat, (rows[low], np.zeros(low.sum(), int)), h)
        if high.any() and k_p >= 2:
            d = (src[high] - (k_p - 1)).astype(np.float32)
            np.add.at(f_mat, (rows[high],
                              np.full(high.sum(), k_p - 1)), h * (1.0 + d))
            np.add.at(f_mat, (rows[high],
                              np.full(high.sum(), k_p - 2)), -h * d)
        elif high.any():
            np.add.at(f_mat, (rows[high], np.full(high.sum(), k_p - 1)), h)
    return (i_mat @ f_mat).astype(np.float32)


def _td_weights(dmrs_idx, nof_symbols: int):
    """Per-OFDM-symbol (slice index, weight) for time-domain linear
    interpolation between DM-RS symbols, with edge extrapolation
    (port_channel_estimator_average_impl.cpp:520-567).  Host-side: the
    DM-RS pattern is static per slot plan."""
    d = np.asarray(dmrs_idx, dtype=np.int64)
    i0 = np.zeros(nof_symbols, np.int32)
    w = np.zeros(nof_symbols, np.float32)
    if len(d) < 2:
        return i0, w                       # single DM-RS symbol: replicate
    for s in range(nof_symbols):
        prev = d[d < s]
        nxt = d[d >= s]
        if len(prev) == 0:                 # before the first DM-RS: use the
            before, after = d[0], d[1]     # first two (extrapolate)
        elif len(nxt) == 0:                # after the last DM-RS: use the
            before, after = d[-2], d[-1]   # last two (extrapolate)
        else:
            before, after = prev[-1], nxt[0]
        i0[s] = int(np.searchsorted(d, before))
        w[s] = (s - before) / float(after - before)
    return i0, w


def estimate(rx_pilots: jnp.ndarray, expected: jnp.ndarray,
             pilot_scs: np.ndarray, nof_sc: int, nof_symbols: int,
             scs_hz: float, stride: int = 2,
             smoothing: str = "filter",
             beta_scaling: float = 1.0,
             estimate_cfo: bool = True,
             dmrs_symbol_times_s: np.ndarray | None = None,
             td_strategy: str = "average",
             dmrs_symbol_idx: np.ndarray | None = None,
             cdm_pairs: bool = False) -> ChannelEstimate:
    """Estimate the channel for one allocation hop.

    rx_pilots: complex64 [P, S_dmrs, K_p] received REs at pilot positions.
    expected:  complex64 [L, S_dmrs, K_p] transmitted pilots (per layer).
    pilot_scs: int [K_p] subcarrier indices (within the allocation, 0-based).
    cdm_pairs: set when MULTIPLE layers share the comb under an fd-OCC
    cover (DM-RS type 1 w_f): the per-layer LS then carries the OTHER
    port as an alternating h_other*(-1)^k term at the comb Nyquist rate,
    which no lowpass fully rejects — despreading over adjacent pilot
    PAIRS (the CDM group, channel assumed pair-constant like the
    reference's cover-code removal) cancels it exactly.
    Returns coefficients on the full [P, L, nof_symbols, nof_sc] lattice.
    """
    p = rx_pilots.shape[0]
    l = expected.shape[0]
    epre = jnp.mean(jnp.abs(rx_pilots) ** 2, axis=(1, 2))           # [P]

    # LS per (port, layer, dmrs symbol, pilot)
    ls = rx_pilots[:, None] * jnp.conj(expected)[None] / (beta_scaling ** 2)

    if cdm_pairs:
        # fd-OCC despread: average adjacent pilot pairs (cancels the
        # co-scheduled CDM port), halving the pilot lattice.
        ls = 0.5 * (ls[..., 0::2] + ls[..., 1::2])
        scs_np = np.asarray(pilot_scs)
        pilot_scs_sm = (scs_np[0::2] + scs_np[1::2]) // 2
        stride_sm = stride * 2
    else:
        pilot_scs_sm = np.asarray(pilot_scs)
        stride_sm = stride

    # CFO from phase slope between consecutive DM-RS symbols.
    cfo = jnp.zeros((), dtype=jnp.float32)
    if estimate_cfo and ls.shape[2] >= 2 and dmrs_symbol_times_s is not None:
        dt = float(dmrs_symbol_times_s[1] - dmrs_symbol_times_s[0])
        xcorr = jnp.sum(ls[:, :, 1:] * jnp.conj(ls[:, :, :-1]))
        cfo = (jnp.angle(xcorr) / (2 * np.pi * dt)).astype(jnp.float32)
        # compensate each DM-RS symbol before averaging
        t = jnp.asarray(dmrs_symbol_times_s, dtype=jnp.float32)
        rot = jnp.exp(-2j * np.pi * cfo * t).astype(ls.dtype)
        ls = ls * rot[None, None, :, None]

    ls_avg = jnp.mean(ls, axis=2)                           # [P, L, K_sm]
    # Smoothing + frequency interpolation as ONE host-precomputed matmul
    # (op-count dominates at these sizes); the smoothed pilots are read back
    # off the interpolated lattice (linear interp is exact at pilot points).
    m_si = jnp.asarray(_smooth_interp_matrix(
        tuple(int(s) for s in pilot_scs_sm), nof_sc, smoothing,
        stride_sm))
    coeffs_f = jnp.einsum("plk,nk->pln", ls_avg, m_si)      # [P, L, nsc]
    pilot_idx = jnp.asarray(np.asarray(pilot_scs, dtype=np.int32))
    filtered = coeffs_f[..., pilot_idx]                     # [P, L, K_p]

    rsrp = jnp.mean(jnp.abs(filtered) ** 2, axis=(1, 2)) * (beta_scaling ** 2)

    # Noise variance: residual of raw pilots vs reconstructed.
    recon = filtered[:, :, None, :] * expected[None] * beta_scaling
    if estimate_cfo and ls.shape[2] >= 2 and dmrs_symbol_times_s is not None:
        t = jnp.asarray(dmrs_symbol_times_s, dtype=jnp.float32)
        rot = jnp.exp(2j * np.pi * cfo * t).astype(recon.dtype)
        recon = recon * rot[None, None, :, None]
    recon_sum = jnp.sum(recon, axis=1)                              # [P, S, K_p]
    resid = rx_pilots - recon_sum
    noise_var = jnp.mean(jnp.abs(resid) ** 2, axis=(1, 2))          # [P]
    noise_var = jnp.maximum(noise_var, rsrp * 10 ** (-60 / 10))     # MAX_SINR floor
    snr = rsrp / jnp.maximum(noise_var, 1e-12)

    # Time alignment: IDFT power peak over the (despread) pilot comb.
    ta = _time_alignment(ls_avg, pilot_scs_sm, nof_sc, scs_hz, stride_sm)

    # Interpolate to the full subcarrier lattice (linear), then across time:
    # 'average' replicates the symbol-averaged estimate; 'interpolate' blends
    # adjacent per-DM-RS-symbol estimates per OFDM symbol
    # (port_channel_estimator_td_interpolation_strategy).
    if td_strategy == "interpolate" and dmrs_symbol_idx is not None \
            and ls.shape[2] >= 2:
        f_sym = jnp.einsum("plsk,nk->plsn", ls, m_si)       # [P, L, S, nsc]
        i0, w = _td_weights(dmrs_symbol_idx, nof_symbols)
        i0j = jnp.asarray(i0)
        wj = jnp.asarray(w)[None, None, :, None].astype(jnp.float32)
        coeffs = (f_sym[:, :, i0j, :] * (1.0 - wj)
                  + f_sym[:, :, i0j + 1, :] * wj).astype(jnp.complex64)
    else:
        coeffs = coeffs_f[:, :, None, :].astype(jnp.complex64)      # S == 1
    return ChannelEstimate(coeffs=coeffs, noise_var=noise_var, rsrp=rsrp,
                           epre=epre, snr=snr, time_alignment_s=ta, cfo_hz=cfo)


def _interp_freq(vals: jnp.ndarray, pilot_scs: np.ndarray, nof_sc: int) -> jnp.ndarray:
    """Linear interpolation from pilot subcarriers to all subcarriers."""
    x = np.asarray(pilot_scs, dtype=np.float32)
    xi = np.arange(nof_sc, dtype=np.float32)
    # host-precomputed weights: for each target sc, two source pilots + weights
    right = np.searchsorted(x, xi, side="left").clip(1, len(x) - 1)
    left = right - 1
    denom = (x[right] - x[left])
    w_r = np.where(denom > 0, (xi - x[left]) / np.maximum(denom, 1e-9), 0.0)
    w_r = np.clip(w_r, 0.0, 1.0).astype(np.float32)
    li, ri = jnp.asarray(left), jnp.asarray(right)
    wr = jnp.asarray(w_r)
    return vals[..., li] * (1.0 - wr) + vals[..., ri] * wr


def _time_alignment(ls_avg: jnp.ndarray, pilot_scs: np.ndarray, nof_sc: int,
                    scs_hz: float, stride: int) -> jnp.ndarray:
    """IDFT power-peak TA estimate (time_alignment_estimator_dft_impl)."""
    nfft = 1
    while nfft < nof_sc * 2:
        nfft *= 2
    pilot_scs = np.asarray(pilot_scs)
    k_p = len(pilot_scs)
    regular = k_p > 1 and np.all(np.diff(pilot_scs) == stride)
    if regular:
        # Regular comb: zero-interleave via stack+reshape+pad (fusable ops)
        # instead of a scatter.  |ifft| is invariant to the comb's absolute
        # frequency offset (a pure time-domain phase ramp), so the global
        # shift by pilot_scs[0] is dropped.
        z = jnp.zeros(ls_avg.shape, ls_avg.dtype)
        inter = jnp.stack([ls_avg] + [z] * (stride - 1), axis=-1)
        inter = inter.reshape(ls_avg.shape[:-1] + (k_p * stride,))
        buf = jnp.pad(inter,
                      [(0, 0)] * (ls_avg.ndim - 1)
                      + [(0, nfft - k_p * stride)])
    else:
        buf = jnp.zeros(ls_avg.shape[:-1] + (nfft,), dtype=ls_avg.dtype)
        buf = buf.at[..., jnp.asarray(pilot_scs)].set(ls_avg)
    h_t = jnp.fft.ifft(buf, axis=-1)
    power = jnp.sum(jnp.abs(h_t) ** 2, axis=tuple(range(h_t.ndim - 1)))  # [nfft]
    # delays are cyclic: peak near 0 or wrap (negative). Search window
    # +-1/(2*stride) of the comb period to avoid aliases.
    max_delay = nfft // (2 * stride)
    idx = jnp.argmax(jnp.concatenate([power[:max_delay], power[-max_delay:]]))
    delay = jnp.where(idx < max_delay, idx, idx - 2 * max_delay)
    return (delay / (nfft * scs_hz)).astype(jnp.float32)
