"""Multi-layer (3-4) ZF/MMSE equalization — beyond the reference's caps."""

import numpy as np
import jax.numpy as jnp
import pytest

from srsran_tpu.ops.equalizer import equalize


def _mimo_case(rng, n_re, p, l, snr_db=25.0):
    h = (rng.normal(size=(n_re, p, l)) + 1j * rng.normal(size=(n_re, p, l))
         ).astype(np.complex64) / np.sqrt(2 * l)
    x = np.exp(2j * np.pi * rng.random((n_re, l))).astype(np.complex64)
    nv = 10 ** (-snr_db / 10)
    noise = (rng.normal(size=(n_re, p)) + 1j * rng.normal(size=(n_re, p))
             ).astype(np.complex64) * np.sqrt(nv / 2)
    y = np.einsum("rpl,rl->rp", h, x) + noise
    return y, h, x, nv


@pytest.mark.parametrize("l,method", [(2, "mmse"), (3, "zf"), (3, "mmse"),
                                      (4, "zf"), (4, "mmse")])
def test_multilayer_recovers_symbols(l, method):
    rng = np.random.default_rng(l * 7 + (method == "mmse"))
    y, h, x, nv = _mimo_case(rng, 512, 4, l)
    xe, nve = equalize(jnp.asarray(y), jnp.asarray(h),
                       jnp.full((512,), nv, jnp.float32), l, method)
    xe = np.asarray(xe)
    err = np.abs(xe - x)
    # at 25 dB with a well-conditioned random channel most REs equalize well
    assert np.median(err) < 0.25, (l, method, np.median(err))
    assert np.all(np.asarray(nve) > 0)


def test_matches_closed_form_2layer_zf():
    rng = np.random.default_rng(0)
    y, h, x, nv = _mimo_case(rng, 256, 4, 2)
    from srsran_tpu.ops.equalizer import equalize_lxn, equalize_zf_2xn
    xa, nva = equalize_zf_2xn(jnp.asarray(y), jnp.asarray(h),
                              jnp.full((256,), nv, jnp.float32))
    xb, nvb = equalize_lxn(jnp.asarray(y), jnp.asarray(h),
                           jnp.full((256,), nv, jnp.float32), "zf")
    np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), atol=2e-3)
    np.testing.assert_allclose(np.asarray(nva), np.asarray(nvb), rtol=2e-2)


def test_pusch_four_layer_decode():
    """End-to-end 4-layer PUSCH — the reference caps PUSCH at 1 layer."""
    import dataclasses
    from srsran_tpu.phy.upper import pdsch, pusch

    cfg = pusch.PuschConfig(rnti=0x17, rb_start=0, rb_count=16,
                            first_symbol=0, nof_symbols=14,
                            modulation="qam16", target_code_rate=0.5,
                            tbs=11272, nof_layers=4, n_id=5,
                            dmrs_symbols=(2, 7, 11))
    tx_cfg = pdsch.PdschConfig(
        rnti=cfg.rnti, rb_start=cfg.rb_start, rb_count=cfg.rb_count,
        first_symbol=cfg.first_symbol, nof_symbols=cfg.nof_symbols,
        modulation=cfg.modulation, target_code_rate=cfg.target_code_rate,
        tbs=cfg.tbs, nof_layers=4, n_id=cfg.n_id,
        dmrs_symbols=cfg.dmrs_symbols)
    rng = np.random.default_rng(9)
    payload = rng.integers(0, 2, cfg.tbs).astype(np.int8)
    grid = jnp.zeros((4, 14, 16 * 12), dtype=jnp.complex64)
    tx = np.asarray(pdsch.process(grid, jnp.asarray(payload), tx_cfg,
                                  precoding=np.eye(4, dtype=np.complex64)))
    # well-conditioned 4x4 channel: identity + small random coupling
    rng2 = np.random.default_rng(1)
    hmat = (np.eye(4) + 0.25 * (rng2.normal(size=(4, 4))
                                + 1j * rng2.normal(size=(4, 4)))
            ).astype(np.complex64)
    rx = np.einsum("pl,lsk->psk", hmat, tx)
    sigma = 0.02
    rx = rx + (rng.normal(0, sigma / np.sqrt(2), rx.shape)
               + 1j * rng.normal(0, sigma / np.sqrt(2), rx.shape))
    res = pusch.process(jnp.asarray(rx.astype(np.complex64)), cfg)
    assert bool(res.tb_crc_ok)
    np.testing.assert_array_equal(np.asarray(res.tb_bits), payload)
