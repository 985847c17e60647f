"""PRACH occasion OFDM demodulator (TS38.211 §5.3.2).

TPU-native analogue of ofdm_prach_demodulator_impl
(lib/phy/lower/modulation/): extracts the PRACH occasion window from the
baseband stream and computes the L_ra frequency bins at the RA subcarrier
spacing.  Only the L_ra needed bins are computed — a [L_ra, N_u] DFT matmul
on the MXU instead of a full N_u-point mixed-radix FFT (N_u = fs / ra_scs
can be 24576 for long preambles; the matmul is microseconds).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ...ran.prach_params import LONG_FORMATS, SHORT_FORMATS


@functools.lru_cache(maxsize=None)
def _bin_dft_matrix(n_u: int, first_bin: int, l_ra: int) -> np.ndarray:
    """Partial DFT: rows for bins first_bin..first_bin+L_ra of an N_u DFT."""
    k = (first_bin + np.arange(l_ra))[:, None]
    n = np.arange(n_u)[None, :]
    return (np.exp(-2j * np.pi * k * n / n_u) / np.sqrt(n_u)).astype(np.complex64)


def demodulate(samples: jnp.ndarray, fmt: str, sample_rate_hz: int,
               start_sample: int, freq_offset_hz: float,
               nof_fd_occasions: int = 1, ra_scs_hz: int = 0) -> jnp.ndarray:
    """Extract + DFT the PRACH occasion.

    samples: [ports, T] baseband at sample_rate_hz.
    ra_scs_hz: short-format RA subcarrier spacing (15000 << mu); 0 = 15 kHz.
    Returns [ports, nof_symbols, L_ra] frequency-domain preamble captures.
    """
    if fmt in LONG_FORMATS:
        l_ra, ra_scs, reps = LONG_FORMATS[fmt]
    else:
        l_ra, ra_scs, reps = 139, (ra_scs_hz or 15_000), SHORT_FORMATS[fmt]
    n_u = sample_rate_hz // ra_scs
    # CP length: for the capture we assume the caller positions start_sample
    # at the beginning of the preamble sequence part (post-CP).
    first_bin = int(round(freq_offset_hz / ra_scs)) % n_u
    m = jnp.asarray(_bin_dft_matrix(n_u, first_bin, l_ra))
    outs = []
    for r in range(reps):
        s0 = start_sample + r * n_u
        win = samples[..., s0:s0 + n_u]
        outs.append(jnp.einsum("kn,pn->pk", m, win.astype(jnp.complex64)))
    return jnp.stack(outs, axis=1)
