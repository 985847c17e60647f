"""EVM calculator (error vector magnitude from hard decisions).

TPU-native analogue of evm_calculator_generic_impl
(lib/phy/upper/channel_modulation/evm_*): re-modulate the hard-decided bits
and measure the RMS error vector against the equalized symbols.
"""

from __future__ import annotations

import jax.numpy as jnp

from .modulation import modulate, BITS_PER_SYMBOL


def evm(symbols: jnp.ndarray, llrs: jnp.ndarray, scheme: str) -> jnp.ndarray:
    """RMS EVM.  symbols [..., S] equalized; llrs [..., S*Qm]."""
    hard = (llrs < 0).astype(jnp.int8)
    ref = modulate(hard, scheme)
    err = jnp.mean(jnp.abs(symbols - ref) ** 2, axis=-1)
    return jnp.sqrt(err)
