"""Modulation mapper/demapper: spec constellation values and LLR roundtrips."""

import numpy as np
import jax.numpy as jnp
import pytest

from srsran_tpu.ops import modulation, scrambling


def test_qpsk_points():
    bits = jnp.asarray(np.array([[0, 0, 0, 1, 1, 0, 1, 1]], dtype=np.int8))
    sym = np.asarray(modulation.modulate(bits, "qpsk"))[0]
    s = 1 / np.sqrt(2)
    np.testing.assert_allclose(sym, [s + 1j * s, s - 1j * s, -s + 1j * s, -s - 1j * s],
                               atol=1e-6)


def test_qam16_unit_power():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, size=(1, 4 * 4096)).astype(np.int8)
    sym = np.asarray(modulation.modulate(jnp.asarray(bits), "qam16"))
    assert abs(np.mean(np.abs(sym) ** 2) - 1.0) < 0.05


def test_qam16_spec_point():
    # TS38.211: b=0000 -> (1+1j)/sqrt(10); b=1010 -> (-3-3j)/sqrt(10)? b0,b1 sign I,Q;
    # b2,b3 select amplitude: 0 -> outer... NR: x = (1-2b0)[2-(1-2b2)] -> b2=0 gives 1.
    bits = jnp.asarray(np.array([[0, 0, 0, 0, 1, 1, 1, 1]], dtype=np.int8))
    sym = np.asarray(modulation.modulate(bits, "qam16"))[0]
    s = 1 / np.sqrt(10)
    np.testing.assert_allclose(sym[0], (1 + 1j) * s, atol=1e-6)
    np.testing.assert_allclose(sym[1], (-3 - 3j) * s, atol=1e-6)


@pytest.mark.parametrize("scheme", ["bpsk", "pi2bpsk", "qpsk", "qam16", "qam64", "qam256"])
def test_mod_demod_roundtrip(scheme):
    qm = modulation.BITS_PER_SYMBOL[scheme]
    rng = np.random.default_rng(qm)
    bits = rng.integers(0, 2, size=(3, qm * 128)).astype(np.int8)
    sym = modulation.modulate(jnp.asarray(bits), scheme)
    nv = jnp.full(sym.shape, 0.01, dtype=jnp.float32)
    llr = np.asarray(modulation.demodulate(sym, nv, scheme))
    hard = (llr < 0).astype(np.int8)
    np.testing.assert_array_equal(hard, bits)


@pytest.mark.parametrize("scheme", ["qpsk", "qam64"])
def test_demod_awgn_soft_quality(scheme):
    qm = modulation.BITS_PER_SYMBOL[scheme]
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, size=(1, qm * 4096)).astype(np.int8)
    sym = np.asarray(modulation.modulate(jnp.asarray(bits), scheme))
    sigma = 0.1
    noise = (rng.normal(0, sigma / np.sqrt(2), sym.shape)
             + 1j * rng.normal(0, sigma / np.sqrt(2), sym.shape))
    rx = jnp.asarray((sym + noise).astype(np.complex64))
    nv = jnp.full(rx.shape, sigma ** 2, dtype=jnp.float32)
    llr = np.asarray(modulation.demodulate(rx, nv, scheme))
    hard = (llr < 0).astype(np.int8)
    ber = np.mean(hard != bits)
    assert ber < 0.01, ber


def test_scramble_descramble():
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, size=(1, 600)).astype(np.int8)
    c_init = 0x1234
    sc = scrambling.scramble_bits(jnp.asarray(bits), c_init)
    llr = 3.0 * (1.0 - 2.0 * np.asarray(sc).astype(np.float32))
    de = np.asarray(scrambling.descramble_llrs(jnp.asarray(llr), c_init))
    hard = (de < 0).astype(np.int8)
    np.testing.assert_array_equal(hard, bits)
