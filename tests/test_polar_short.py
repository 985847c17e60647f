"""Polar chain and short-block codes: round trips and spec properties."""

import numpy as np
import jax.numpy as jnp
import pytest

from srsran_tpu.ran import polar_params
from srsran_tpu.ops import polar, short_block


def test_reliability_subsequence():
    q5 = polar_params.reliability_sequence(5)
    assert len(q5) == 32 and sorted(q5.tolist()) == list(range(32))
    # spot values from TS38.212 Table 5.3.1.2-1 head: 0,1,2,4,8,16,3,5,...
    np.testing.assert_array_equal(q5[:8], [0, 1, 2, 4, 8, 16, 3, 5])


def test_encode_is_butterfly():
    # single one at input position i yields row i of F^(xn)
    n = 3
    u = np.eye(8, dtype=np.int8)
    x = np.asarray(polar.encode(jnp.asarray(u), n))
    # F^(x3) row 0 = e0 encoded: [1,1,1,1,1,1,1,1]? row i = product structure.
    # Check involution: encoding twice = identity.
    x2 = np.asarray(polar.encode(jnp.asarray(x), n))
    np.testing.assert_array_equal(x2, u)
    # And known row: u = e_7 (all-ones row of F^(x3))
    np.testing.assert_array_equal(x[7], np.ones(8, dtype=np.int8))


@pytest.mark.parametrize("k,e,nmax,ibil", [
    (32, 864, 9, False),    # PBCH: A=32 payload + 24 CRC = 56? (use generic)
    (56, 864, 9, False),    # PBCH-like (payload+CRC24)
    (40, 100, 9, False),    # PDCCH-like puncture/shorten case
    (20, 256, 10, True),    # UCI-like with channel interleaver
    (100, 120, 10, True),   # high-rate shorten case
])
def test_polar_roundtrip_noiseless(k, e, nmax, ibil):
    code = polar_params.polar_code(k, e, nmax, ibil)
    rng = np.random.default_rng(k + e)
    msg = rng.integers(0, 2, size=(4, k)).astype(np.int8)
    u = polar.allocate(jnp.asarray(msg), code)
    x = polar.encode(u, code.n)
    tx = polar.rate_match(x, code)
    assert tx.shape == (4, e)
    llr = 8.0 * (1.0 - 2.0 * np.asarray(tx).astype(np.float32))
    lm = polar.rate_dematch(jnp.asarray(llr), code)
    dec = np.asarray(polar.sc_decode(lm, code))
    np.testing.assert_array_equal(dec, msg)


def test_polar_roundtrip_awgn():
    code = polar_params.polar_code(56, 864, 9, False)  # PBCH rate, strong code
    rng = np.random.default_rng(5)
    msg = rng.integers(0, 2, size=(8, 56)).astype(np.int8)
    u = polar.allocate(jnp.asarray(msg), code)
    tx = polar.rate_match(polar.encode(u, code.n), code)
    sym = 1.0 - 2.0 * np.asarray(tx).astype(np.float32)
    sigma = 0.9
    rx = sym + rng.normal(0, sigma, sym.shape).astype(np.float32)
    lm = polar.rate_dematch(jnp.asarray(2 * rx / sigma**2), code)
    dec = np.asarray(polar.sc_decode(lm, code))
    np.testing.assert_array_equal(dec, msg)


def test_polar_pc_bits():
    # UCI small-K: 12 <= K <= 19 uses n_pc = 3.
    code = polar_params.polar_code(18, 200, 10, True, n_pc=3)
    assert code.n_pc == 3 and len(code.pc_set) == 3
    rng = np.random.default_rng(9)
    msg = rng.integers(0, 2, size=(2, 18)).astype(np.int8)
    u = polar.allocate(jnp.asarray(msg), code)
    tx = polar.rate_match(polar.encode(u, code.n), code)
    llr = 8.0 * (1.0 - 2.0 * np.asarray(tx).astype(np.float32))
    dec = np.asarray(polar.sc_decode(polar.rate_dematch(jnp.asarray(llr), code), code))
    np.testing.assert_array_equal(dec, msg)


@pytest.mark.parametrize("k", [3, 7, 11])
def test_short_block_roundtrip(k):
    rng = np.random.default_rng(k)
    bits = rng.integers(0, 2, size=(6, k)).astype(np.int8)
    enc = short_block.encode(jnp.asarray(bits), 64, 2)
    llr = 5.0 * (1.0 - 2.0 * np.asarray(enc).astype(np.float32))
    llr += rng.normal(0, 1.0, llr.shape).astype(np.float32)
    dec, metric = short_block.detect(jnp.asarray(llr), k, 2)
    np.testing.assert_array_equal(np.asarray(dec), bits)
    assert (np.asarray(metric) > 0.2).all()


def test_short_block_1bit_2bit():
    bits1 = jnp.asarray(np.array([[0], [1]], dtype=np.int8))
    e1 = np.asarray(short_block.encode(bits1, 8, 2))
    assert e1.shape == (2, 8)
    llr = 4.0 * (1.0 - 2.0 * e1.astype(np.float32))
    dec, _ = short_block.detect(jnp.asarray(llr), 1, 2)
    np.testing.assert_array_equal(np.asarray(dec), [[0], [1]])

    bits2 = jnp.asarray(np.array([[0, 1], [1, 1]], dtype=np.int8))
    e2 = np.asarray(short_block.encode(bits2, 12, 2))
    llr2 = 4.0 * (1.0 - 2.0 * e2.astype(np.float32))
    dec2, _ = short_block.detect(jnp.asarray(llr2), 2, 2)
    np.testing.assert_array_equal(np.asarray(dec2), [[0, 1], [1, 1]])
