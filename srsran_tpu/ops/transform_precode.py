"""Transform precoding (DFT-s-OFDM, TS38.211 §6.3.1.4 / §6.3.2.6.1).

TPU-native replacement for transform_precoder_dft_impl
(lib/phy/generic_functions/transform_precoding/): the per-symbol DFT over
M_sc data REs runs as a direct unitary DFT matmul — PUSCH/PUCCH sizes
(multiples of 12, factors 2/3/5) are small enough that the MXU beats any
mixed-radix FFT plan, and one matrix serves every symbol of the slot.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _dft_mat(n: int, inverse: bool) -> np.ndarray:
    k = np.arange(n)
    sign = 2j if inverse else -2j
    return (np.exp(sign * np.pi * np.outer(k, k) / n) / np.sqrt(n)).astype(np.complex64)


def precode(x: jnp.ndarray) -> jnp.ndarray:
    """y = DFT(x) / sqrt(M) over the last axis (unitary)."""
    return jnp.matmul(x, jnp.asarray(_dft_mat(x.shape[-1], False)).T)


def deprecode(y: jnp.ndarray) -> jnp.ndarray:
    """x = IDFT(y) * sqrt(M) over the last axis (unitary inverse)."""
    return jnp.matmul(y, jnp.asarray(_dft_mat(y.shape[-1], True)).T)
