"""Channel precoding / layer mapping (TS38.211 §7.3.1.3-4) as einsums.

TPU-native replacement for channel_precoder_{generic,avx2,avx512,neon}
(lib/phy/generic_functions/precoding/) and the precode-while-mapping
resource_grid_mapper_impl (lib/phy/support/resource_grid_mapper_impl.cpp:
30-120): per-PRG layers x ports matrices applied to RE blocks become a
single batched einsum on the MXU (complex = two real matmuls).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def layer_map(symbols: jnp.ndarray, nof_layers: int) -> jnp.ndarray:
    """Codeword -> layers, TS38.211 §7.3.1.3: d(i) -> layer i%v, pos i//v.

    [..., S] -> [..., v, S/v].
    """
    s = symbols.shape[-1]
    assert s % nof_layers == 0
    x = symbols.reshape(symbols.shape[:-1] + (s // nof_layers, nof_layers))
    return jnp.swapaxes(x, -1, -2)


def layer_demap(layers: jnp.ndarray) -> jnp.ndarray:
    """Inverse of layer_map: [..., v, M] -> [..., v*M]."""
    x = jnp.swapaxes(layers, -1, -2)
    return x.reshape(x.shape[:-2] + (-1,))


def precode(layers: jnp.ndarray, matrix: jnp.ndarray) -> jnp.ndarray:
    """Apply precoding.  layers [..., L, S], matrix [P, L] -> [..., P, S]."""
    return jnp.einsum("pl,...ls->...ps", matrix.astype(layers.dtype), layers)


def precode_prg(layers: jnp.ndarray, matrices: jnp.ndarray,
                prg_of_re: jnp.ndarray) -> jnp.ndarray:
    """Per-PRG precoding (SURVEY §8.8 "per-PRG einsum"): the reference
    applies a layers x ports matrix per precoding RB group while mapping
    (resource_grid_mapper_impl.cpp:30-120); here the host-precomputed
    per-RE PRG index turns it into ONE gather + ONE batched einsum.

    layers [..., L, S], matrices [G, P, L] (traced — PMI changes do not
    recompile), prg_of_re int32 [S] -> [..., P, S].
    """
    w = matrices.astype(layers.dtype)[prg_of_re]          # [S, P, L]
    return jnp.einsum("spl,...ls->...ps", w, layers)


def identity_precoder(nof_ports: int, nof_layers: int) -> np.ndarray:
    """Reference default when no codebook is given: scaled port-mapping."""
    m = np.zeros((nof_ports, nof_layers), dtype=np.complex64)
    for l in range(nof_layers):
        m[l % nof_ports, l] = 1.0
    return m / np.sqrt(nof_layers)
