"""int8 LLR type and cbf16 resource grid storage helpers."""

import numpy as np
import jax.numpy as jnp
from srsran_tpu.ops import llr as llr_mod
from srsran_tpu.phy.support import resource_grid as rg
from srsran_tpu.ops import ldpc_encode, ldpc_decode


def test_llr_quantize_roundtrip():
    x = jnp.asarray(np.linspace(-30, 30, 101, dtype=np.float32))
    q = llr_mod.quantize(x)
    assert int(jnp.max(q)) == 127 and int(jnp.min(q)) == -127
    d = llr_mod.dequantize(q)
    inside = np.abs(np.asarray(x)) <= 20
    np.testing.assert_allclose(np.asarray(d)[inside], np.asarray(x)[inside],
                               atol=0.2)


def test_decode_with_quantized_llrs():
    """int8 LLRs through the decoder behave like the reference's int8 path."""
    bg, z = 2, 32
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, size=(4, 10 * z)).astype(np.int8)
    code = np.asarray(ldpc_encode.encode(jnp.asarray(bits), bg, z))
    llr = 6.0 * (1 - 2.0 * code.astype(np.float32))
    llr += rng.normal(0, 1.2, llr.shape).astype(np.float32)
    llr[:, :2 * z] = 0.0
    q = llr_mod.to_float(llr_mod.quantize(jnp.asarray(llr)))
    dec, _ = ldpc_decode.decode(q, bg, z)
    np.testing.assert_array_equal(np.asarray(dec)[:, :10 * z], bits)


def test_cbf16_grid_roundtrip():
    rng = np.random.default_rng(1)
    g = (rng.normal(size=(2, 14, 48)) + 1j * rng.normal(size=(2, 14, 48))).astype(np.complex64)
    packed = rg.to_cbf16(jnp.asarray(g))
    assert packed.dtype == jnp.bfloat16 and packed.shape == (2, 14, 48, 2)
    back = np.asarray(rg.from_cbf16(packed))
    # bf16 has ~3 decimal digits; tolerance reflects cbf16 storage
    np.testing.assert_allclose(back, g, atol=0.02)


def test_grid_pool_ring():
    pool = rg.GridPool(1, 14, 12, depth=3)
    a = pool.get(0)
    pool.put(0, a + 1.0)
    assert np.asarray(pool.get(3))[0, 0, 0] == 1.0   # same ring slot
    assert np.asarray(pool.get(1))[0, 0, 0] == 0.0
