"""CRC calculators per TS38.212 §5.1 as GF(2) matmuls.

TPU-native replacement for the reference's lib/phy/upper/channel_coding/
crc_calculator_{clmul,lut,neon}_impl: instead of carry-less multiplies, the
CRC of a front-zero-padded message is a single int8 matmul on the MXU
(crc = bits @ M mod 2), since leading zeros do not change a CRC remainder.
Works batched over codeblocks: bits [B, N] -> crc [B, L].
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

# Generator polynomials, TS38.212 §5.1 (low L bits; the x**L term is implicit).
POLYS = {
    "crc24A": (24, 0x864CFB),
    "crc24B": (24, 0x800063),
    "crc24C": (24, 0xB2B117),
    "crc16": (16, 0x1021),
    # 0x621: gCRC11 = D^11 + D^10 + D^9 + D^5 + 1 (reference LUT seed 0xE21,
    # crc_calculator_lut_impl.cpp:38; a 0x623 typo here was caught by the
    # spec-direct golden model in parity/numpy_model.py).
    "crc11": (11, 0x621),
    "crc6": (6, 0x21),
}


@functools.lru_cache(maxsize=None)
def _remainder_matrix(poly_name: str, nbits: int) -> np.ndarray:
    """M[nbits, L] with M[i] = remainder of x**(nbits-1-i+L) mod g(x).

    crc(bits) = bits @ M mod 2 for an MSB-first bit vector of length nbits.
    """
    length, poly = POLYS[poly_name]
    mask = (1 << length) - 1
    top = 1 << (length - 1)
    m = np.zeros((nbits, length), dtype=np.int8)
    # r = remainder of x**L (i.e. CRC contribution of the last message bit).
    r = poly & mask  # x**L mod g = g - x**L = poly
    for i in range(nbits - 1, -1, -1):
        m[i] = [(r >> (length - 1 - b)) & 1 for b in range(length)]
        # multiply by x
        carry = r & top
        r = (r << 1) & mask
        if carry:
            r ^= poly & mask
    return m


def crc_matrix(poly_name: str, nbits: int) -> jnp.ndarray:
    return jnp.asarray(_remainder_matrix(poly_name, nbits))


def crc(bits: jnp.ndarray, poly_name: str) -> jnp.ndarray:
    """CRC of MSB-first bit array; batched over leading dims.

    bits: int8 [..., N] in {0,1}.  Returns int8 [..., L].
    """
    n = bits.shape[-1]
    m = crc_matrix(poly_name, n)
    acc = jnp.matmul(bits.astype(jnp.int8), m, preferred_element_type=jnp.int32)
    return (acc & 1).astype(jnp.int8)


def crc_check(bits_with_crc: jnp.ndarray, poly_name: str) -> jnp.ndarray:
    """True where the trailing CRC matches; batched.  [..., N+L] -> [...]."""
    r = crc(bits_with_crc, poly_name)
    return jnp.all(r == 0, axis=-1)


def crc_value_np(bits: np.ndarray, poly_name: str) -> int:
    """Reference bit-serial CRC (host, for tests)."""
    length, poly = POLYS[poly_name]
    reg = 0
    mask = (1 << length) - 1
    for b in bits:
        top = (reg >> (length - 1)) & 1
        reg = ((reg << 1) & mask) | 0
        if top ^ int(b):
            reg ^= poly & mask
    # The above implements division of bits*x^L directly.
    return reg
