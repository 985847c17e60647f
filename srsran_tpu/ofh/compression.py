"""Block-floating-point IQ compression (O-RAN CUS §A.1.2).

TPU-native analogue of iq_compression_bfp_impl + its AVX2/AVX512/NEON
kernels (lib/ofh/compression/iq_compression_bfp_{impl,avx2,avx512,neon}.cpp):
per PRB (12 complex REs = 24 real values), scale float IQ to int16 full
range, find the shared block exponent that fits every value into a signed
``width``-bit mantissa, shift, and emit (exponent, mantissas).

Where the reference hand-vectorizes the max/CLZ/shift loop per ISA, here
the whole slot compresses as ONE array program over [..., nof_prb, 24]
int32 lanes — the VPU is the SIMD substrate.  Bit-packing mantissas into
the U-plane byte layout is host-side (uplane.py); this module's device
output is (exponents, mantissas) which round-trips exactly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# int16 full scale used by the reference's float->fixed conversion
# (srsvec cf->int16 with scale 2^15 - 1).
_FIXED_SCALE = np.float32(32767.0)


def bfp_compress(iq: jnp.ndarray, width: int = 9):
    """Compress IQ REs to BFP.

    iq: complex64 [..., nof_prb * 12] (or any last dim multiple of 12).
    Returns (exponents uint8 [..., nof_prb], mantissas int32
    [..., nof_prb, 24]) with mantissas in [-2^(width-1), 2^(width-1)-1].
    """
    assert iq.shape[-1] % 12 == 0
    nof_prb = iq.shape[-1] // 12
    re = jnp.round(jnp.real(iq) * _FIXED_SCALE).astype(jnp.int32)
    im = jnp.round(jnp.imag(iq) * _FIXED_SCALE).astype(jnp.int32)
    re = jnp.clip(re, -32768, 32767)
    im = jnp.clip(im, -32768, 32767)
    v = jnp.stack([re, im], axis=-1)                     # [..., K, 2]
    v = v.reshape(v.shape[:-2] + (nof_prb, 24))          # [..., P, 24]
    m = jnp.max(jnp.abs(v), axis=-1)                     # [..., P]
    # bits needed for the magnitude: 32 - count-leading-zeros (the
    # reference's BSR; lax.clz is the VPU equivalent)
    import jax.lax as lax
    nbits = (32 - lax.clz(m)).astype(jnp.int32)
    # signed width-bit mantissa holds magnitudes < 2^(width-1)
    exp = jnp.maximum(nbits - (width - 1), 0).astype(jnp.int32)
    mant = jnp.right_shift(v, exp[..., None])
    hi = (1 << (width - 1)) - 1
    mant = jnp.clip(mant, -hi - 1, hi)
    return exp.astype(jnp.uint8), mant


def bfp_decompress(exp: jnp.ndarray, mant: jnp.ndarray) -> jnp.ndarray:
    """Inverse: (exponents [..., P], mantissas [..., P, 24]) -> complex64
    [..., P*12] grid REs scaled back to float."""
    v = jnp.left_shift(mant.astype(jnp.int32), exp.astype(jnp.int32)[..., None])
    v = v.reshape(v.shape[:-2] + (v.shape[-2] * 12, 2))
    out = (v[..., 0].astype(jnp.float32)
           + 1j * v[..., 1].astype(jnp.float32)) / _FIXED_SCALE
    return out.astype(jnp.complex64)


# --------------------------------------------------------- host bit packing

def pack_section(exp: np.ndarray, mant: np.ndarray, width: int = 9) -> bytes:
    """Serialize one symbol's PRB run to the U-plane payload layout
    (per PRB: 1 exponent byte, then 24 ``width``-bit mantissas MSB-first —
    the reference's packer in iq_compression_bfp_impl.cpp)."""
    exp = np.asarray(exp, dtype=np.uint8)
    mant = np.asarray(mant, dtype=np.int64)
    nof_prb = exp.shape[0]
    out = bytearray()
    mask = (1 << width) - 1
    for p in range(nof_prb):
        out.append(int(exp[p]) & 0x0F)
        acc = 0
        nacc = 0
        for v in mant[p]:
            acc = (acc << width) | (int(v) & mask)
            nacc += width
            while nacc >= 8:
                nacc -= 8
                out.append((acc >> nacc) & 0xFF)
        if nacc:
            out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


def unpack_section(payload: bytes, nof_prb: int, width: int = 9):
    """Inverse of pack_section -> (exp uint8 [P], mant int32 [P, 24])."""
    prb_bytes = 1 + (24 * width + 7) // 8
    exp = np.zeros(nof_prb, dtype=np.uint8)
    mant = np.zeros((nof_prb, 24), dtype=np.int32)
    sign_bit = 1 << (width - 1)
    for p in range(nof_prb):
        off = p * prb_bytes
        exp[p] = payload[off] & 0x0F
        acc = int.from_bytes(payload[off + 1: off + prb_bytes], "big")
        total_bits = (prb_bytes - 1) * 8
        for i in range(24):
            shift = total_bits - (i + 1) * width
            v = (acc >> shift) & ((1 << width) - 1)
            mant[p, i] = v - (1 << width) if v & sign_bit else v
    return exp, mant
