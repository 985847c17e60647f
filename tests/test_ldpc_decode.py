"""LDPC decoder: noiseless + AWGN round trips through encode/rate-match."""

import numpy as np
import jax.numpy as jnp
import pytest

from srsran_tpu.ops import ldpc_encode, ldpc_decode, ldpc_rate_match, ldpc_graph
from srsran_tpu.ran import ldpc_params


@pytest.mark.parametrize("bg,z", [(1, 32), (2, 52)])
def test_noiseless_roundtrip(bg, z):
    g = ldpc_graph.get_graph(bg, z)
    rng = np.random.default_rng(7)
    k = g.nof_info_cols * z
    bits = rng.integers(0, 2, size=(4, k)).astype(np.int8)
    code = np.asarray(ldpc_encode.encode(jnp.asarray(bits), bg, z))
    # BPSK-ish LLRs: +4 for bit 0, -4 for bit 1; puncture first 2Z.
    llr = 4.0 * (1 - 2.0 * code.astype(np.float32))
    llr[:, : 2 * z] = 0.0
    dec, _ = ldpc_decode.decode(jnp.asarray(llr), bg, z)
    dec = np.asarray(dec)
    np.testing.assert_array_equal(dec[:, :k], bits)
    assert np.asarray(ldpc_decode.check_parity(jnp.asarray(dec), bg, z)).all()


def test_awgn_roundtrip_with_rate_matching():
    """Full TB-ish chain at moderate SNR: encode -> RM -> AWGN -> dematch -> decode."""
    bg, z = 1, 64
    g = ldpc_graph.get_graph(bg, z)
    k = g.nof_info_cols * z            # 1408
    k_prime = k - 100                  # pretend 100 filler bits
    rng = np.random.default_rng(11)
    bits = rng.integers(0, 2, size=(8, k)).astype(np.int8)
    bits[:, k_prime:] = 0              # filler bits are zeros
    full = np.asarray(ldpc_encode.encode(jnp.asarray(bits), bg, z))
    tx_buffer = full[:, 2 * z:]        # N = 66Z - 2Z punctured
    n = tx_buffer.shape[1]
    e = int(n * 0.7) // 2 * 2          # rate ~0.47 post-match, Qm=2
    qm = 2
    matched = np.asarray(ldpc_rate_match.rate_match(
        jnp.asarray(tx_buffer), e, 0, qm, bg, z, k_prime, k))
    # BPSK over AWGN at ~3 dB Eb/N0
    sym = 1.0 - 2.0 * matched.astype(np.float32)
    sigma = 0.7
    rx = sym + rng.normal(0, sigma, sym.shape).astype(np.float32)
    llr_e = 2.0 * rx / sigma**2
    llr_n = np.asarray(ldpc_rate_match.rate_dematch(
        jnp.asarray(llr_e), 0, qm, bg, z, k_prime, k, n))
    llr_full = np.concatenate([np.zeros((8, 2 * z), np.float32), llr_n], axis=1)
    nof_layers = max(4, (e // z))      # plenty of layers for this E
    dec, _ = ldpc_decode.decode(jnp.asarray(llr_full), bg, z, 0, 10)
    dec = np.asarray(dec)
    np.testing.assert_array_equal(dec[:, :k_prime], bits[:, :k_prime])


def test_rate_match_dematch_inverse_noiseless():
    bg, z = 2, 16
    g = ldpc_graph.get_graph(bg, z)
    k = g.nof_info_cols * z
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, size=(2, k)).astype(np.int8)
    full = np.asarray(ldpc_encode.encode(jnp.asarray(bits), bg, z))
    tx = full[:, 2 * z:]
    n = tx.shape[1]
    for rv in (0, 2):
        e = n + 100  # repetition: wraps the buffer
        m = np.asarray(ldpc_rate_match.rate_match(
            jnp.asarray(tx), e, rv, 4, bg, z, k, k))
        llr = 1.0 - 2.0 * m.astype(np.float32)
        dem = np.asarray(ldpc_rate_match.rate_dematch(
            jnp.asarray(llr), rv, 4, bg, z, k, k, n))
        # positions covered at least once must agree in sign with tx bits
        covered = dem != 0
        signs_ok = np.sign(dem[covered]) == (1.0 - 2.0 * tx[covered])
        assert signs_ok.all()


def test_segment_params_examples():
    p = ldpc_params.segment_tb(3840, 1)
    assert p.nof_codeblocks == 1 and p.tb_crc_bits == 24
    p2 = ldpc_params.segment_tb(20016, 1)
    assert p2.nof_codeblocks == 3 and p2.cb_crc_bits == 24
    assert p2.cb_info_bits * p2.nof_codeblocks == 20016 + 24 + 3 * 24
    p3 = ldpc_params.segment_tb(200, 2)
    assert p3.base_graph == 2 and p3.nof_codeblocks == 1
