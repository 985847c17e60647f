"""Receive-chain VALUE parity vs spec-direct numpy goldens.

Round-trip/BLER tests can hide calibrated-in-pairs bugs (a consistent
scaling error on both TX and RX); these tests pin estimator, equalizer,
demapper and whole-processor OUTPUT VALUES against independent numpy
models (SURVEY §4.1 tolerance style)."""

import numpy as np
import jax.numpy as jnp
import pytest

from srsran_tpu.parity import numpy_model as M


def test_ldpc_encode_matches_numpy_golden():
    from srsran_tpu.ops import ldpc_encode
    from srsran_tpu.ops.ldpc_graph import get_graph
    rng = np.random.default_rng(0)
    for bg, z in ((1, 96), (2, 52)):
        g = get_graph(bg, z)
        info = rng.integers(0, 2, (1, g.nof_info_cols * z)).astype(np.int8)
        ours = np.asarray(ldpc_encode.encode(jnp.asarray(info), bg, z))[0]
        golden = M.ldpc_encode(info[0].astype(np.uint8), bg, z)
        np.testing.assert_array_equal(ours % 2, golden % 2)


def test_zf_mmse_equalizer_values():
    from srsran_tpu.ops.equalizer import equalize
    rng = np.random.default_rng(1)
    n_re, p = 64, 4
    for layers in (1, 2, 3, 4):
        h = (rng.normal(size=(n_re, p, layers))
             + 1j * rng.normal(size=(n_re, p, layers))).astype(np.complex64)
        x = (rng.normal(size=(n_re, layers))
             + 1j * rng.normal(size=(n_re, layers))).astype(np.complex64)
        nv = 0.01
        y = np.einsum("rpl,rl->rp", h, x).astype(np.complex64)
        y += np.sqrt(nv / 2) * (rng.normal(size=y.shape)
                                + 1j * rng.normal(size=y.shape))
        gx, gnv = M.zf_equalize(y, h, nv)
        ox, onv = equalize(jnp.asarray(y), jnp.asarray(h),
                           jnp.full((n_re,), nv, jnp.float32), layers, "zf")
        np.testing.assert_allclose(np.asarray(ox), gx, rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(onv), gnv, rtol=2e-2)
        # MMSE (layers >= 2 is beyond the reference; still golden-checked)
        gx, gnv = M.mmse_equalize(y, h, nv)
        ox, onv = equalize(jnp.asarray(y), jnp.asarray(h),
                           jnp.full((n_re,), nv, jnp.float32), layers, "mmse")
        np.testing.assert_allclose(np.asarray(ox), gx, rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(onv), gnv, rtol=2e-2)


@pytest.mark.parametrize("scheme", ["qpsk", "qam16", "qam64", "qam256"])
def test_maxlog_llr_values(scheme):
    from srsran_tpu.ops.modulation import demodulate
    rng = np.random.default_rng(2)
    syms = (rng.normal(size=48) + 1j * rng.normal(size=48)
            ).astype(np.complex64) * 0.7
    nv = np.full(48, 0.05, np.float32)
    ours = np.asarray(demodulate(jnp.asarray(syms)[None],
                                 jnp.asarray(nv)[None], scheme))[0]
    golden = M.maxlog_llr(syms, nv.astype(np.float64), scheme)
    np.testing.assert_allclose(ours, golden.reshape(-1), rtol=2e-3, atol=2e-3)


def test_ls_estimate_values_on_selective_channel():
    """LS estimate values (smoothing 'none') on a frequency-selective
    2-port channel with per-port gains — NOT a round trip."""
    from srsran_tpu.ops import channel_estimate as chest
    rng = np.random.default_rng(3)
    k_p, n_sym = 72, 2
    pilot_scs = np.arange(0, 2 * k_p, 2, dtype=np.int32)
    expected = (rng.normal(size=(1, n_sym, k_p))
                + 1j * rng.normal(size=(1, n_sym, k_p))
                ).astype(np.complex64)
    expected /= np.abs(expected)                      # unit-power pilots
    # true channel: two taps -> frequency-selective, distinct per port
    k = pilot_scs / (2.0 * k_p)
    h_true = np.stack([
        1.0 + 0.5 * np.exp(-2j * np.pi * 3 * k),
        0.7 * np.exp(1j * 0.4) * (1 - 0.3 * np.exp(-2j * np.pi * 5 * k)),
    ]).astype(np.complex64)                           # [P, K]
    rx = h_true[:, None, :] * expected[0][None] \
        + 0.001 * (rng.normal(size=(2, n_sym, k_p))
                   + 1j * rng.normal(size=(2, n_sym, k_p)))
    est = chest.estimate(jnp.asarray(rx.astype(np.complex64)),
                         jnp.asarray(expected), pilot_scs, 2 * k_p, 14,
                         30e3, stride=2, smoothing="none",
                         estimate_cfo=False)
    golden_h = M.ls_estimate(rx, expected)            # [P, 1, K]
    got = np.asarray(est.coeffs)[:, 0, 0, :]          # [P, nsc] at pilots
    np.testing.assert_allclose(got[:, pilot_scs], golden_h[:, 0],
                               rtol=5e-3, atol=5e-3)
    # rsrp golden: mean |h|^2 over layers/pilots per port
    rsrp_golden = np.mean(np.abs(golden_h) ** 2, axis=(1, 2))
    np.testing.assert_allclose(np.asarray(est.rsrp), rsrp_golden, rtol=2e-2)


def test_whole_pusch_processor_vs_numpy_waveform():
    """The PUSCH processor decodes a waveform built ENTIRELY from numpy
    spec models (Gold, CRC, LDPC encode via GF(2) solve, rate-match walk,
    QPSK, DM-RS, per-sample-DFT OFDM) — no shared code with the receiver.

    Config shape follows the reference's pusch_processor_test_data.h grids
    (single layer, full-slot allocation, type-1 DM-RS)."""
    from srsran_tpu.phy.slot_programs import CellConfig, ul_slot_fn
    from srsran_tpu.phy.upper.pusch import PuschConfig
    from srsran_tpu.ran.ldpc_params import (segment_tb, select_base_graph,
                                            rate_match_k0)

    rng = np.random.default_rng(4)
    nof_rb, tbs = 24, 2152
    cfg = PuschConfig(rnti=0x4D, rb_start=0, rb_count=nof_rb, first_symbol=0,
                      nof_symbols=14, modulation="qpsk",
                      target_code_rate=0.4, tbs=tbs, nof_layers=1,
                      n_id=17, dmrs_symbols=(2, 7, 11),
                      dmrs_scrambling_id=17)
    cell = CellConfig(nof_ports=1, nof_rb=nof_rb, dft_size=512, numerology=1,
                      center_freq_hz=0.0)
    payload = rng.integers(0, 2, tbs).astype(np.uint8)

    # --- numpy TX ---------------------------------------------------------
    bg = select_base_graph(tbs, 0.4)
    seg = segment_tb(tbs, bg)
    assert seg.nof_codeblocks == 1
    b = np.concatenate([payload, M.crc(payload, "crc16")])
    k, k_prime, z = seg.full_block_bits, seg.cb_info_bits, seg.lifting_size
    info = np.concatenate([b, np.zeros(k - k_prime, np.uint8)])
    cw_full = M.ldpc_encode(info, bg, z)
    cw = cw_full[2 * z:]                                  # puncture 2z
    n = cw.shape[0]
    # rate match: circular walk skipping fillers (spec §5.4.2.1)
    qm = 2
    n_data_re = 11 * nof_rb * 12                          # 14 - 3 DMRS syms
    e = n_data_re * qm
    k0 = rate_match_k0(bg, 0, n, z)
    sel = []
    pos = k0 % n
    fs, fe = k_prime - 2 * z, k - 2 * z
    while len(sel) < e:
        if not (fs <= pos < fe):
            sel.append(pos)
        pos = (pos + 1) % n
    bits = cw[np.asarray(sel)]
    # interleave f_{i+j*Qm} = e_{i*E/Qm+j}
    bits = bits.reshape(qm, e // qm).T.reshape(-1)
    # scramble with c_init = rnti*2^15 + n_id
    scr = (bits ^ M.gold((cfg.rnti << 15) + cfg.n_id, e)).astype(np.uint8)
    syms = M.modulate(scr, "qpsk")
    # grid: frequency-first data mapping skipping DM-RS symbols
    grid = np.zeros((1, 14, nof_rb * 12), np.complex64)
    di = 0
    for l in range(14):
        if l in cfg.dmrs_symbols:
            continue
        grid[0, l, :] = syms[di:di + nof_rb * 12]
        di += nof_rb * 12
    # type-1 DM-RS on even subcarriers, port 0 (wf = ++)
    for l in cfg.dmrs_symbols:
        c_init = ((1 << 17) * (14 * 0 + l + 1) * (2 * 17 + 1)
                  + 2 * 17) % (1 << 31)
        pil = M.modulate(M.gold(c_init, 12 * nof_rb), "qpsk")
        grid[0, l, 0::2] = pil
    # per-sample-DFT OFDM modulate (numpy golden)
    chunks = [M.ofdm_modulate_symbol(grid[0, l], cell.dft_size,
                                     cp_len, 1.0)
              for l, cp_len in zip(range(14), _cp_lens(cell))]
    tx = np.concatenate(chunks)[None, :]

    # --- jax RX -----------------------------------------------------------
    ul = ul_slot_fn(cell, ((cfg,), (), (), (), ()))
    out = ul(jnp.asarray(tx.astype(np.complex64)), (), None)
    r = out["pusch"][0]
    assert bool(r["tb_crc_ok"]), "numpy-golden waveform must decode"
    np.testing.assert_array_equal(
        (np.asarray(r["tb_bits"]) > 0).astype(np.uint8), payload)
    assert float(jnp.mean(r["snr"])) > 1e3        # essentially noiseless
    assert float(r["evm"]) < 1e-2


def _cp_lens(cell):
    from srsran_tpu.ran.cyclic_prefix import cp_lengths, CyclicPrefix
    return cp_lengths(CyclicPrefix.NORMAL, cell.numerology, cell.dft_size)
