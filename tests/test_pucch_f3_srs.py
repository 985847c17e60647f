"""PUCCH F3/F4 DFT-s-OFDM loopback and SRS estimation."""

import numpy as np
import jax.numpy as jnp
import pytest

from srsran_tpu.phy.upper import pucch, srs
from srsran_tpu.ops.transform_precode import precode, deprecode


def test_transform_precode_roundtrip():
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(3, 144)) + 1j * rng.normal(size=(3, 144))).astype(np.complex64)
    y = deprecode(precode(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-4)


@pytest.mark.parametrize("k,pi2,occ", [(8, False, 1), (16, False, 1),
                                       (22, True, 1), (6, False, 2)])
def test_pucch_f3_f4_loopback(k, pi2, occ):
    cfg = pucch.PucchF3Config(
        rb_start=4, nof_rb=1 if occ > 1 else 3, start_symbol=0,
        nof_symbols=10, rnti=0x55, n_id=7, n_id_hopping=21,
        nof_uci_bits=k, slot=6, pi2_bpsk=pi2, occ_length=occ, occ_index=occ - 1)
    rng = np.random.default_rng(k)
    uci = rng.integers(0, 2, k).astype(np.int8)
    tx = np.asarray(pucch.f3_encode(jnp.asarray(uci), cfg))   # [S, M]

    nsc = 120
    g = np.zeros((2, 14, nsc), dtype=np.complex64)
    ch = np.array([0.9 * np.exp(0.2j), 0.7 * np.exp(-0.7j)])
    m = cfg.nof_rb * 12
    sc = slice(cfg.rb_start * 12, cfg.rb_start * 12 + m)
    for s in range(cfg.nof_symbols):
        g[:, cfg.start_symbol + s, sc] = ch[:, None] * tx[s][None, :]
    g += 0.03 * (rng.normal(size=g.shape) + 1j * rng.normal(size=g.shape))

    res = pucch.process_format3(jnp.asarray(g.astype(np.complex64)), cfg)
    assert bool(res["valid"])
    np.testing.assert_array_equal(np.asarray(res["uci_bits"]), uci)


@pytest.mark.parametrize("nports", [1, 2])
def test_srs_estimate(nports):
    cfg = srs.SrsConfig(rb_start=2, rb_count=16, start_symbol=10,
                        nof_symbols=2, comb=2, comb_offset=0, cyclic_shift=3,
                        nof_ports=nports, sequence_id=17, numerology=1)
    rng = np.random.default_rng(nports)
    nsc = 240
    ue = jnp.zeros((nports, 14, nsc), dtype=jnp.complex64)
    ue = np.asarray(srs.map_to_grid(ue, cfg))
    # channel: rx_p = sum_t H[p,t] ue_t with per-pair gains
    hmat = np.array([[0.9 * np.exp(0.5j), 0.3 * np.exp(-0.2j)],
                     [0.2 * np.exp(1.0j), 0.8 * np.exp(0.1j)]])[:, :nports]
    rx = np.einsum("pt,tsk->psk", hmat, ue)
    rx += 0.02 * (rng.normal(size=rx.shape) + 1j * rng.normal(size=rx.shape))
    est = srs.estimate(jnp.asarray(rx.astype(np.complex64)), cfg)
    h = np.asarray(est.coeffs)      # [P, L, S, K]
    wide = h.mean(axis=(2, 3))
    for p in range(2):
        for t in range(nports):
            assert abs(wide[p, t] - hmat[p, t]) < 0.12, (p, t, wide[p, t], hmat[p, t])
    assert abs(float(est.time_alignment_s)) < 2e-7
