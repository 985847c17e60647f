"""PDSCH processor: RE accounting, grid mapping, and decode loopback."""

import numpy as np
import jax.numpy as jnp
import pytest

from srsran_tpu.phy.upper import pdsch, sch_decoder
from srsran_tpu.ops.modulation import demodulate, BITS_PER_SYMBOL
from srsran_tpu.ops.scrambling import descramble_llrs
from srsran_tpu.ran.ldpc_params import segment_tb, select_base_graph


def _mk_cfg(**kw):
    base = dict(rnti=0x4601, rb_start=2, rb_count=24, first_symbol=1,
                nof_symbols=12, modulation="qam16", target_code_rate=0.5,
                tbs=3624, nof_layers=1, n_id=1, dmrs_symbols=(2, 11))
    base.update(kw)
    return pdsch.PdschConfig(**base)


def test_re_plan_counts():
    cfg = _mk_cfg()
    n_re = pdsch.nof_data_re(cfg)
    # 12 symbols, 2 are full DM-RS (reserved): 10 data symbols * 24 RB * 12
    assert n_re == 10 * 24 * 12


def test_codeword_length_matches_capacity():
    cfg = _mk_cfg()
    rng = np.random.default_rng(0)
    payload = jnp.asarray(rng.integers(0, 2, cfg.tbs).astype(np.int8))
    cw, seg = pdsch.encode_transport_block(payload, cfg)
    qm = BITS_PER_SYMBOL[cfg.modulation]
    assert cw.shape[0] == pdsch.nof_data_re(cfg) * qm * cfg.nof_layers


@pytest.mark.parametrize("layers,ports", [(1, 1), (2, 2), (4, 4)])
def test_grid_occupancy(layers, ports):
    cfg = _mk_cfg(nof_layers=layers, modulation="qpsk", tbs=1800)
    rng = np.random.default_rng(1)
    payload = jnp.asarray(rng.integers(0, 2, cfg.tbs).astype(np.int8))
    grid = jnp.zeros((ports, 14, 26 * 12), dtype=jnp.complex64)
    out = np.asarray(pdsch.process(grid, payload, cfg))
    # data symbols of allocated RBs are non-zero on all ports
    assert np.count_nonzero(out[:, 5, 24:312]) == ports * 288
    # symbols outside the allocation stay empty
    assert np.count_nonzero(out[:, 0]) == 0
    assert np.count_nonzero(out[:, :, :24]) == 0


def test_pdsch_decode_loopback_awgn():
    """1-layer PDSCH through identity channel + AWGN; decode & CRC check."""
    cfg = _mk_cfg(modulation="qam16", tbs=3624, rb_count=24)
    rng = np.random.default_rng(7)
    payload = rng.integers(0, 2, cfg.tbs).astype(np.int8)
    grid = jnp.zeros((1, 14, 26 * 12), dtype=jnp.complex64)
    grid = pdsch.process(grid, jnp.asarray(payload), cfg)

    # extract data REs
    plan = pdsch._data_re_plan(cfg.rb_start, cfg.rb_count, cfg.first_symbol,
                               cfg.nof_symbols, cfg.dmrs_symbols, 2)
    rx = np.asarray(grid)[0, plan[:, 0], plan[:, 1]]
    sigma = 0.12
    rx = rx + (rng.normal(0, sigma / np.sqrt(2), rx.shape)
               + 1j * rng.normal(0, sigma / np.sqrt(2), rx.shape))
    nv = np.full(rx.shape, sigma ** 2, dtype=np.float32)
    llr = demodulate(jnp.asarray(rx.astype(np.complex64))[None],
                     jnp.asarray(nv)[None], cfg.modulation)
    llr = descramble_llrs(llr, (cfg.rnti << 15) + cfg.n_id)[0]

    bg = select_base_graph(cfg.tbs, cfg.target_code_rate)
    seg = segment_tb(cfg.tbs, bg)
    qm = BITS_PER_SYMBOL[cfg.modulation]
    g = llr.shape[0]
    e_sizes = pdsch._cb_rate_match_sizes(g, seg.nof_codeblocks, qm, 1)
    res = sch_decoder.decode(llr, seg, e_sizes, cfg.rv, qm, cfg.tbs)
    assert bool(res.tb_crc_ok), "TB CRC failed"
    np.testing.assert_array_equal(np.asarray(res.tb_bits), payload)


def test_pdsch_harq_combining():
    """rv0 at very low SNR fails; combining rv0+rv2 soft buffers succeeds."""
    # 2880 data REs * 6 bits = 17280 bits capacity; tbs+CRC = 15624 -> R ~ 0.9
    cfg = _mk_cfg(modulation="qam64", tbs=15576, rb_count=24,
                  target_code_rate=0.9)
    rng = np.random.default_rng(3)
    payload = rng.integers(0, 2, cfg.tbs).astype(np.int8)
    bg = select_base_graph(cfg.tbs, cfg.target_code_rate)
    seg = segment_tb(cfg.tbs, bg)
    qm = BITS_PER_SYMBOL[cfg.modulation]
    sigma = 0.2  # ~14 dB: too little for rate-0.9 qam64 alone, enough combined

    def llr_for_rv(rv):
        c = pdsch.PdschConfig(**{**cfg.__dict__, "rv": rv})
        grid = jnp.zeros((1, 14, 26 * 12), dtype=jnp.complex64)
        grid = pdsch.process(grid, jnp.asarray(payload), c)
        plan = pdsch._data_re_plan(c.rb_start, c.rb_count, c.first_symbol,
                                   c.nof_symbols, c.dmrs_symbols, 2)
        rx = np.asarray(grid)[0, plan[:, 0], plan[:, 1]]
        rx = rx + (rng.normal(0, sigma / np.sqrt(2), rx.shape)
                   + 1j * rng.normal(0, sigma / np.sqrt(2), rx.shape))
        nv = np.full(rx.shape, sigma ** 2, dtype=np.float32)
        llr = demodulate(jnp.asarray(rx.astype(np.complex64))[None],
                         jnp.asarray(nv)[None], c.modulation)
        return descramble_llrs(llr, (c.rnti << 15) + c.n_id)[0], c

    llr0, c0 = llr_for_rv(0)
    e_sizes = pdsch._cb_rate_match_sizes(llr0.shape[0], seg.nof_codeblocks, qm, 1)
    r0 = sch_decoder.decode(llr0, seg, e_sizes, 0, qm, cfg.tbs)
    assert not bool(r0.tb_crc_ok), "expected rv0-only failure at this SNR"

    llr2, c2 = llr_for_rv(2)
    r2 = sch_decoder.decode(llr2, seg, e_sizes, 2, qm, cfg.tbs,
                            soft_buffer=r0.new_soft, nof_iterations=8)
    assert bool(r2.tb_crc_ok), "HARQ combining should recover the TB"
    np.testing.assert_array_equal(np.asarray(r2.tb_bits), payload)
