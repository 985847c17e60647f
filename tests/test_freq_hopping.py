"""PUSCH intra-slot frequency hopping + CSI-RS row 5."""

import numpy as np
import jax.numpy as jnp

from srsran_tpu.phy.upper import pusch, csi_rs
from srsran_tpu.phy.upper.pdsch import PdschConfig, process as pdsch_process


def test_pusch_frequency_hopping_loopback():
    cfg = pusch.PuschConfig(
        rnti=0x21, rb_start=0, rb_count=12, first_symbol=0, nof_symbols=14,
        modulation="qpsk", target_code_rate=0.3, tbs=1544, nof_layers=1,
        n_id=3, dmrs_symbols=(2, 9), second_hop_prb=24)
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 2, cfg.tbs).astype(np.int8)

    # UE TX per hop via the DL chain blocks with a shared codeword: easiest
    # is to build the full non-hopped grid then relocate hop 2's symbols.
    base = PdschConfig(rnti=cfg.rnti, rb_start=0, rb_count=12,
                       first_symbol=0, nof_symbols=14, modulation="qpsk",
                       target_code_rate=0.3, tbs=cfg.tbs, nof_layers=1,
                       n_id=cfg.n_id, dmrs_symbols=(2, 9))
    g0 = np.asarray(pdsch_process(
        jnp.zeros((1, 14, 480), dtype=jnp.complex64), jnp.asarray(payload),
        base, precoding=np.eye(1, dtype=np.complex64)))
    tx = np.zeros_like(g0)
    n1 = cfg.nof_symbols // 2
    tx[:, :n1, :144] = g0[:, :n1, :144]                       # hop 1 PRBs 0-11
    tx[:, n1:, 24 * 12:24 * 12 + 144] = g0[:, n1:, :144]      # hop 2 PRBs 24-35
    # DM-RS sequences are CRB-anchored: regenerate hop-2 pilots for rb 24.
    from srsran_tpu.phy.upper.dmrs import (DmrsConfig, pilots_for_port,
                                           _type1_sc_indices)
    d2 = DmrsConfig(rb_start=24, rb_count=12, symbols=(9,), ports=(0,),
                    scrambling_id=0, n_scid=0)
    pil = np.asarray(pilots_for_port(d2, 0))[0]
    sc2 = _type1_sc_indices(24, 12, 0)
    tx[0, 9, :] *= 0
    tx[0, 9, sc2] = pil

    # distinct per-hop channels
    rx = np.zeros((2, 14, 480), dtype=np.complex64)
    h1 = np.array([0.9 * np.exp(0.4j), 0.6 * np.exp(-0.2j)])
    h2 = np.array([0.5 * np.exp(1.2j), 0.8 * np.exp(0.9j)])
    rx[:, :n1] = h1[:, None, None] * tx[0, :n1][None]
    rx[:, n1:] = h2[:, None, None] * tx[0, n1:][None]
    rx += 0.04 / np.sqrt(2) * (rng.normal(size=rx.shape)
                               + 1j * rng.normal(size=rx.shape))

    res = pusch.process(jnp.asarray(rx), cfg)
    assert bool(res.tb_crc_ok)
    np.testing.assert_array_equal(np.asarray(res.tb_bits), payload)


def test_csi_rs_row5_two_symbols():
    cfg = csi_rs.CsiRsConfig(row=5, rb_start=0, rb_count=4, symbol=5, k0=2,
                             scrambling_id=9)
    g = np.asarray(csi_rs.process(
        jnp.zeros((4, 14, 48), dtype=jnp.complex64), cfg))
    # ports 0/1 on symbol 5, ports 2/3 on symbol 6, subcarriers k0,k0+1
    for p, l in ((0, 5), (1, 5), (2, 6), (3, 6)):
        nz = set(np.nonzero(g[p, l])[0].tolist())
        assert nz == {2, 3, 14, 15, 26, 27, 38, 39}, (p, l, nz)
    assert np.count_nonzero(g[0, 6]) == 0 and np.count_nonzero(g[2, 5]) == 0
