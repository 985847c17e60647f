"""LDPC decoder CRC early stop (ldpc_decoder.h:73 semantics)."""

import numpy as np
import jax.numpy as jnp

from srsran_tpu.ops import ldpc_decode, ldpc_encode
from srsran_tpu.ops.crc import crc


def _encoded_with_crc(rng, bg, z, c):
    kb = 22 if bg == 1 else 10
    payload = rng.integers(0, 2, (c, kb * z - 24)).astype(np.int8)
    cb_crc = np.asarray(crc(jnp.asarray(payload), "crc24B"))
    msgs = np.concatenate([payload, cb_crc], axis=-1)
    code = np.asarray(ldpc_encode.encode(jnp.asarray(msgs), bg, z))
    return msgs, code


def test_early_stop_clean_channel_uses_few_iterations():
    rng = np.random.default_rng(0)
    bg, z, c = 2, 64, 4
    msgs, code = _encoded_with_crc(rng, bg, z, c)
    llr = 8.0 * (1 - 2 * code.astype(np.float32))
    llr += rng.normal(0, 0.3, llr.shape).astype(np.float32)
    llr[:, :2 * z] = 0.0
    bits, _, iters = ldpc_decode.decode_early_stop(
        jnp.asarray(llr), bg, z, 0, 6, 0.8, "crc24B", 10 * z)
    assert int(iters) <= 2, int(iters)
    np.testing.assert_array_equal(np.asarray(bits)[:, :10 * z], msgs)


def test_early_stop_noise_runs_to_max():
    rng = np.random.default_rng(1)
    z = 64
    llr = jnp.asarray(rng.normal(0, 4, (4, 52 * z)).astype(np.float32))
    _, _, iters = ldpc_decode.decode_early_stop(
        llr, 2, z, 0, 6, 0.8, "crc24B", 10 * z)
    assert int(iters) == 6


def test_early_stop_matches_fixed_iterations_on_noise():
    """With random (failing) input, results equal the fixed-6 decoder."""
    rng = np.random.default_rng(2)
    z = 32
    llr = jnp.asarray(rng.normal(0, 3, (3, 52 * z)).astype(np.float32))
    b_fix, s_fix = ldpc_decode.decode(llr, 2, z, 0, 6)
    b_es, s_es, _ = ldpc_decode.decode_early_stop(
        llr, 2, z, 0, 6, 0.8, "crc24B", 10 * z)
    np.testing.assert_array_equal(np.asarray(b_fix), np.asarray(b_es))
    np.testing.assert_allclose(np.asarray(s_fix), np.asarray(s_es),
                               rtol=1e-5, atol=1e-5)


def test_sch_decoder_reports_iterations():
    from srsran_tpu.phy.upper import pdsch, pusch

    cfg = pusch.PuschConfig(rnti=0x17, rb_start=0, rb_count=12,
                            first_symbol=0, nof_symbols=14,
                            modulation="qam16", target_code_rate=0.5,
                            tbs=1320, nof_layers=1, n_id=5,
                            dmrs_symbols=(2, 7, 11))
    tx_cfg = pdsch.PdschConfig(
        rnti=cfg.rnti, rb_start=0, rb_count=12, first_symbol=0,
        nof_symbols=14, modulation="qam16", target_code_rate=0.5,
        tbs=cfg.tbs, nof_layers=1, n_id=cfg.n_id,
        dmrs_symbols=cfg.dmrs_symbols)
    rng = np.random.default_rng(3)
    payload = rng.integers(0, 2, cfg.tbs).astype(np.int8)
    grid = jnp.zeros((1, 14, 144), dtype=jnp.complex64)
    tx = np.asarray(pdsch.process(grid, jnp.asarray(payload), tx_cfg,
                                  precoding=np.eye(1, dtype=np.complex64)))
    rx = np.stack([tx[0], 0.7 * tx[0]])
    rx = rx + 0.02 * (rng.normal(size=rx.shape)
                      + 1j * rng.normal(size=rx.shape))
    res = pusch.process(jnp.asarray(rx.astype(np.complex64)), cfg)
    assert bool(res.tb_crc_ok)
    # clean channel: the decoder exits well before the 6-sweep cap
    # (reference behavior: iteration count is reported per decode)
    assert 1 <= int(res.nof_iterations) <= 3