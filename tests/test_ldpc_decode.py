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


def test_rate_match_batch_slice_path_matches_index_plan():
    """The slice/transpose fast path must reproduce the §5.4.2 index-plan
    semantics exactly, for both E classes, all rv, filler bits, and Ncb."""
    import jax.numpy as jnp
    from srsran_tpu.ops.ldpc_rate_match import (
        _tb_plan, rate_match_batch, rate_dematch_batch)
    rng = np.random.default_rng(5)
    cases = [
        # (bg, z, k_prime, c, qm, nl, g_total, n_ref)
        (1, 64, 64 * 20, 3, 8, 4, 8 * 4 * 3 * 700, 0),
        (2, 52, 52 * 9, 2, 4, 1, 4 * 2 * 1100, 0),
        (1, 384, 384 * 21, 4, 6, 2, 6 * 2 * 4 * 2000, 20000),
    ]
    for bg, z, k_prime, c, qm, nl, g_total, n_ref in cases:
        k = (22 if bg == 1 else 10) * z
        n = (66 if bg == 1 else 50) * z - 2 * z
        unit = nl * qm
        base = unit * (g_total // (unit * c))
        gamma = (g_total // unit) % c
        e_sizes = tuple(base if j < c - gamma else base + unit
                        for j in range(c))
        cws = rng.integers(0, 2, (c, n)).astype(np.int8)
        for rv in range(4):
            plan = _tb_plan(e_sizes, rv, qm, bg, z, k_prime, k, n, n_ref)
            want = cws.reshape(-1)[plan]
            got = np.asarray(rate_match_batch(
                jnp.asarray(cws), e_sizes, rv, qm, bg, z, k_prime, k, n_ref))
            np.testing.assert_array_equal(got, want)
            # dematch: scatter-add semantics vs the slice path
            llrs = rng.normal(size=sum(e_sizes)).astype(np.float32)
            want_buf = np.zeros(c * n, np.float32)
            np.add.at(want_buf, plan, llrs)
            want_buf = want_buf.reshape(c, n)
            fs, fe = k_prime - 2 * z, k - 2 * z
            if fe > fs:
                want_buf[:, fs:fe] = 1e4
            got_buf = np.asarray(rate_dematch_batch(
                jnp.asarray(llrs), c, e_sizes, rv, qm, bg, z, k_prime, k, n,
                n_ref))
            np.testing.assert_allclose(got_buf, want_buf, rtol=1e-5, atol=1e-5)
