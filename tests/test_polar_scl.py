"""SCL polar decoder: L=1 degenerates to SC; CA-SCL beats SC at low SNR."""

import numpy as np
import jax.numpy as jnp
import pytest

from srsran_tpu.ran import polar_params
from srsran_tpu.ops import polar, polar_scl
from srsran_tpu.ops.crc import crc


def _tx(code, msg):
    u = polar.allocate(jnp.asarray(msg), code)
    return polar.rate_match(polar.encode(u, code.n), code)


def test_scl_l1_matches_sc_noiseless():
    code = polar_params.polar_code(40, 200, 9, False)
    rng = np.random.default_rng(0)
    msg = rng.integers(0, 2, size=(3, 40)).astype(np.int8)
    tx = _tx(code, msg)
    llr = 6.0 * (1.0 - 2.0 * np.asarray(tx).astype(np.float32))
    lm = polar.rate_dematch(jnp.asarray(llr), code)
    sc = np.asarray(polar.sc_decode(lm, code))
    scl, _ = polar_scl.scl_decode(lm, code, list_size=1)
    np.testing.assert_array_equal(sc, np.asarray(scl))
    np.testing.assert_array_equal(np.asarray(scl), msg)


def test_ca_scl_beats_sc_at_low_snr():
    """PBCH-like payload at an SNR where SC struggles; CA-SCL8 must win."""
    k_payload = 32
    code = polar_params.polar_code(k_payload + 24, 240, 9, False)
    rng = np.random.default_rng(7)
    n_blocks = 32
    payload = rng.integers(0, 2, size=(n_blocks, k_payload)).astype(np.int8)
    with_crc = np.concatenate(
        [payload, np.asarray(crc(jnp.asarray(payload), "crc24C"))], axis=1)
    tx = _tx(code, with_crc)
    sym = 1.0 - 2.0 * np.asarray(tx).astype(np.float32)
    sigma = 1.4
    rx = sym + rng.normal(0, sigma, sym.shape).astype(np.float32)
    lm = polar.rate_dematch(jnp.asarray(2 * rx / sigma ** 2), code)

    sc_bits = np.asarray(polar.sc_decode(lm, code))
    sc_errors = sum(1 for b in range(n_blocks)
                    if not np.array_equal(sc_bits[b, :k_payload], payload[b]))

    scl_bits, ok = polar_scl.scl_decode(lm, code, list_size=8,
                                        crc_poly="crc24C")
    scl_bits = np.asarray(scl_bits)
    scl_errors = sum(1 for b in range(n_blocks)
                     if not np.array_equal(scl_bits[b, :k_payload], payload[b]))
    assert sc_errors >= 8, f"SC unexpectedly strong: {sc_errors}"
    assert scl_errors < sc_errors // 2, (scl_errors, sc_errors)


def test_scl_with_pc_bits():
    code = polar_params.polar_code(18, 150, 10, True, n_pc=3)
    rng = np.random.default_rng(3)
    msg = rng.integers(0, 2, size=(4, 18)).astype(np.int8)
    tx = _tx(code, msg)
    llr = 5.0 * (1.0 - 2.0 * np.asarray(tx).astype(np.float32))
    llr += rng.normal(0, 0.7, llr.shape).astype(np.float32)
    lm = polar.rate_dematch(jnp.asarray(llr), code)
    out, _ = polar_scl.scl_decode(lm, code, list_size=4)
    np.testing.assert_array_equal(np.asarray(out), msg)
