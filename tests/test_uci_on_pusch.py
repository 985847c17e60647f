"""UCI multiplexed on PUSCH: rate-matched and punctured HARQ-ACK + CSI."""

import numpy as np
import jax.numpy as jnp
import pytest

from srsran_tpu.phy.upper import pusch, uci as uci_codec
from srsran_tpu.ops import ulsch_demux, ofdm
from srsran_tpu.ops.modulation import modulate, BITS_PER_SYMBOL
from srsran_tpu.ops.scrambling import scramble_bits
from srsran_tpu.phy.upper.pdsch import encode_transport_block, PdschConfig, _data_re_plan
from srsran_tpu.phy.upper.dmrs import DmrsConfig, map_to_grid
from srsran_tpu.ran.uci_on_pusch import UciOnPuschConfig


def _build_ul_grid(cfg: pusch.PuschConfig, payload, ack=None, csi1=None,
                   csi2=None):
    """UE-side TX with UCI multiplexing."""
    qm = BITS_PER_SYMBOL[cfg.modulation]
    dcfg = pusch.demux_plan(cfg)
    tx_cfg = PdschConfig(
        rnti=cfg.rnti, rb_start=cfg.rb_start, rb_count=cfg.rb_count,
        first_symbol=cfg.first_symbol, nof_symbols=cfg.nof_symbols,
        modulation=cfg.modulation, target_code_rate=cfg.target_code_rate,
        tbs=cfg.tbs, nof_layers=cfg.nof_layers, rv=cfg.rv, n_id=cfg.n_id,
        dmrs_symbols=cfg.dmrs_symbols, slot_in_frame=cfg.slot_in_frame)
    if dcfg is None:
        cw, _ = encode_transport_block(jnp.asarray(payload), tx_cfg)
        cw = np.asarray(cw)
    else:
        f = ulsch_demux.field_positions(dcfg)
        bpre = qm * cfg.nof_layers
        # data coded to fill data positions
        data_e = len(f["data"]) * bpre
        # encode_transport_block sizes E from the full RE plan; recompute by
        # monkey-building a cfg whose capacity matches data_e is complex —
        # instead call the pieces directly:
        from srsran_tpu.ops import ldpc_encode, ldpc_rate_match
        from srsran_tpu.ops.crc import crc
        from srsran_tpu.ran.ldpc_params import segment_tb, select_base_graph
        bg = select_base_graph(cfg.tbs, cfg.target_code_rate)
        seg = segment_tb(cfg.tbs, bg)
        b = np.concatenate([
            payload,
            np.asarray(crc(jnp.asarray(payload[None]),
                           "crc24A" if seg.tb_crc_bits == 24 else "crc16"))[0]])
        c, z = seg.nof_codeblocks, seg.lifting_size
        per_cb = seg.cb_info_bits - seg.cb_crc_bits
        cbs = b.reshape(c, per_cb)
        if seg.cb_crc_bits:
            cbs = np.concatenate(
                [cbs, np.asarray(crc(jnp.asarray(cbs), "crc24B"))], axis=-1)
        full = np.concatenate(
            [cbs, np.zeros((c, seg.full_block_bits - seg.cb_info_bits),
                           np.int8)], axis=-1)
        code = np.asarray(ldpc_encode.encode(jnp.asarray(full), bg, z))
        from srsran_tpu.phy.upper.pdsch import _cb_rate_match_sizes
        e_sizes = _cb_rate_match_sizes(data_e, c, qm, cfg.nof_layers)
        outs = [np.asarray(ldpc_rate_match.rate_match(
            jnp.asarray(code[j:j + 1, 2 * z:]), e_sizes[j], cfg.rv, qm, bg, z,
            seg.cb_info_bits, seg.full_block_bits))[0] for j in range(c)]
        data_coded = np.concatenate(outs)
        ack_coded = csi1_coded = csi2_coded = None
        u = cfg.uci
        if ack is not None:
            pos = f["ack_punct"] if len(f["ack_punct"]) else f["ack"]
            ack_coded = np.asarray(uci_codec.encode_uci(
                jnp.asarray(ack), len(pos) * bpre, qm))
        if csi1 is not None:
            csi1_coded = np.asarray(uci_codec.encode_uci(
                jnp.asarray(csi1), len(f["csi1"]) * bpre, qm))
        if csi2 is not None:
            csi2_coded = np.asarray(uci_codec.encode_uci(
                jnp.asarray(csi2), len(f["csi2"]) * bpre, qm))
        cw = ulsch_demux.mux_codeword(dcfg, data_coded, ack_coded,
                                      csi1_coded, csi2_coded)
    from srsran_tpu.ops.gold import gold_sequence
    seq = np.asarray(gold_sequence((cfg.rnti << 15) + cfg.n_id, len(cw)))
    if dcfg is not None:
        cls = ulsch_demux.placeholder_bit_classes(
            dcfg, cfg.uci.o_ack, cfg.uci.o_csi1)
        scr = ulsch_demux.scramble_with_placeholders(np.asarray(cw), seq, cls)
    else:
        scr = (np.asarray(cw).astype(np.int8) ^ seq).astype(np.int8)
    syms = np.asarray(modulate(jnp.asarray(scr[None]), cfg.modulation))[0]
    grid = np.zeros((1, 14, cfg.rb_count * 12 + cfg.rb_start * 12),
                    dtype=np.complex64)
    plan = _data_re_plan(cfg.rb_start, cfg.rb_count, cfg.first_symbol,
                         cfg.nof_symbols, cfg.dmrs_symbols, 2)
    grid[0, plan[:, 0], plan[:, 1]] = syms
    dmrs_cfg = DmrsConfig(rb_start=cfg.rb_start, rb_count=cfg.rb_count,
                          symbols=cfg.dmrs_symbols, ports=(0,),
                          scrambling_id=cfg.dmrs_scrambling_id,
                          n_scid=cfg.n_scid, slot_in_frame=cfg.slot_in_frame)
    g = map_to_grid(jnp.asarray(grid), dmrs_cfg,
                    np.eye(1, dtype=np.complex64))
    return np.asarray(g)


@pytest.mark.parametrize("o_ack,o_csi1", [(4, 0), (4, 7), (11, 4)])
def test_uci_rate_matched(o_ack, o_csi1):
    cfg = pusch.PuschConfig(
        rnti=0x31, rb_start=0, rb_count=12, first_symbol=0, nof_symbols=14,
        modulation="qam16", target_code_rate=0.4, tbs=2152, nof_layers=1,
        n_id=3, dmrs_symbols=(2, 7, 11),
        uci=UciOnPuschConfig(o_ack=o_ack, o_csi1=o_csi1))
    rng = np.random.default_rng(o_ack * 10 + o_csi1)
    payload = rng.integers(0, 2, cfg.tbs).astype(np.int8)
    ack = rng.integers(0, 2, o_ack).astype(np.int8)
    csi1 = rng.integers(0, 2, o_csi1).astype(np.int8) if o_csi1 else None
    tx = _build_ul_grid(cfg, payload, ack, csi1)[0]
    rx = np.stack([0.9 * tx, 0.6 * np.exp(0.4j) * tx])
    sigma = 0.05
    rx = rx + (rng.normal(0, sigma / np.sqrt(2), rx.shape)
               + 1j * rng.normal(0, sigma / np.sqrt(2), rx.shape))
    res = pusch.process(jnp.asarray(rx.astype(np.complex64)), cfg)
    assert bool(res.tb_crc_ok)
    np.testing.assert_array_equal(np.asarray(res.tb_bits), payload)
    assert bool(res.harq_ack_valid)
    np.testing.assert_array_equal(np.asarray(res.harq_ack_bits), ack)
    if o_csi1:
        assert bool(res.csi1_valid)
        np.testing.assert_array_equal(np.asarray(res.csi1_bits), csi1)


def test_uci_punctured_one_bit_ack():
    cfg = pusch.PuschConfig(
        rnti=0x32, rb_start=0, rb_count=12, first_symbol=0, nof_symbols=14,
        modulation="qpsk", target_code_rate=0.3, tbs=1096, nof_layers=1,
        n_id=3, dmrs_symbols=(2, 7, 11), uci=UciOnPuschConfig(o_ack=1))
    rng = np.random.default_rng(44)
    payload = rng.integers(0, 2, cfg.tbs).astype(np.int8)
    ack = rng.integers(0, 2, 1).astype(np.int8)
    tx = _build_ul_grid(cfg, payload, ack)[0]
    rx = np.stack([tx, 0.7 * tx])
    sigma = 0.05
    rx = rx + (rng.normal(0, sigma / np.sqrt(2), rx.shape)
               + 1j * rng.normal(0, sigma / np.sqrt(2), rx.shape))
    res = pusch.process(jnp.asarray(rx.astype(np.complex64)), cfg)
    assert bool(res.tb_crc_ok)       # data survives the puncturing
    np.testing.assert_array_equal(np.asarray(res.tb_bits), payload)
    assert bool(res.harq_ack_valid)
    np.testing.assert_array_equal(np.asarray(res.harq_ack_bits), ack)


def test_uci_placeholder_repair_one_bit_qam16():
    """1-bit ACK on QAM16: y/x placeholders are scrambled per TS38.211
    §6.3.1.1 on TX and repaired on RX (ulsch_demultiplex_impl.cpp:105-194)."""
    cfg = pusch.PuschConfig(
        rnti=0x41, rb_start=0, rb_count=12, first_symbol=0, nof_symbols=14,
        modulation="qam16", target_code_rate=0.4, tbs=2152, nof_layers=1,
        n_id=7, dmrs_symbols=(2, 7, 11), uci=UciOnPuschConfig(o_ack=1))
    rng = np.random.default_rng(91)
    payload = rng.integers(0, 2, cfg.tbs).astype(np.int8)
    for ack_val in (0, 1):
        ack = np.array([ack_val], dtype=np.int8)
        tx = _build_ul_grid(cfg, payload, ack)[0]
        rx = np.stack([tx, 0.8 * tx])
        sigma = 0.04
        rx = rx + (rng.normal(0, sigma / np.sqrt(2), rx.shape)
                   + 1j * rng.normal(0, sigma / np.sqrt(2), rx.shape))
        res = pusch.process(jnp.asarray(rx.astype(np.complex64)), cfg)
        assert bool(res.tb_crc_ok)
        assert bool(res.harq_ack_valid)
        np.testing.assert_array_equal(np.asarray(res.harq_ack_bits), ack)


def test_uci_placeholder_repair_two_bit_qam64():
    cfg = pusch.PuschConfig(
        rnti=0x42, rb_start=0, rb_count=12, first_symbol=0, nof_symbols=14,
        modulation="qam64", target_code_rate=0.4, tbs=3240, nof_layers=1,
        n_id=9, dmrs_symbols=(2, 7, 11),
        uci=UciOnPuschConfig(o_ack=2, o_csi1=2))
    rng = np.random.default_rng(92)
    payload = rng.integers(0, 2, cfg.tbs).astype(np.int8)
    ack = np.array([1, 0], dtype=np.int8)
    csi1 = np.array([0, 1], dtype=np.int8)
    tx = _build_ul_grid(cfg, payload, ack, csi1)[0]
    rx = np.stack([tx, 0.8 * tx])
    sigma = 0.03
    rx = rx + (rng.normal(0, sigma / np.sqrt(2), rx.shape)
               + 1j * rng.normal(0, sigma / np.sqrt(2), rx.shape))
    res = pusch.process(jnp.asarray(rx.astype(np.complex64)), cfg)
    assert bool(res.tb_crc_ok)
    np.testing.assert_array_equal(np.asarray(res.harq_ack_bits), ack)
    np.testing.assert_array_equal(np.asarray(res.csi1_bits), csi1)


def test_csi_part2_size_from_part1():
    from srsran_tpu.ran.uci_on_pusch import (
        Part2Entry, Part2Parameter, Part2SizeDescription, uci_part2_get_size)
    # RI (1 bit at offset 0) selects part-2 size: RI=0 -> 4 bits, RI=1 -> 7.
    descr = Part2SizeDescription(
        (Part2Entry((Part2Parameter(0, 1),), (4, 7)),))
    assert uci_part2_get_size(np.array([0, 1, 1, 0, 1]), descr) == 4
    assert uci_part2_get_size(np.array([1, 1, 1, 0, 1]), descr) == 7
    assert descr.possible_sizes() == (4, 7)
    # MSB-first multi-bit parameter
    d2 = Part2SizeDescription(
        (Part2Entry((Part2Parameter(0, 2),), (1, 2, 3, 4)),))
    assert uci_part2_get_size(np.array([1, 0]), d2) == 3   # index 0b10
    assert uci_part2_get_size(np.array([0, 1]), d2) == 2   # index 0b01


def test_pusch_part2_feedback_end_to_end():
    from srsran_tpu.ran.uci_on_pusch import (
        Part2Entry, Part2Parameter, Part2SizeDescription)
    rng = np.random.default_rng(93)
    descr = Part2SizeDescription(
        (Part2Entry((Part2Parameter(0, 1),), (4, 7)),))
    for csi1_first_bit in (0, 1):
        csi1 = np.array([csi1_first_bit, 1, 0, 1], dtype=np.int8)
        o_csi2 = 4 if csi1_first_bit == 0 else 7
        csi2 = rng.integers(0, 2, o_csi2).astype(np.int8)
        cfg = pusch.PuschConfig(
            rnti=0x43, rb_start=0, rb_count=12, first_symbol=0,
            nof_symbols=14, modulation="qam16", target_code_rate=0.4,
            tbs=2152, nof_layers=1, n_id=5, dmrs_symbols=(2, 7, 11),
            uci=UciOnPuschConfig(o_ack=0, o_csi1=4, o_csi2=o_csi2))
        payload = rng.integers(0, 2, cfg.tbs).astype(np.int8)
        tx = _build_ul_grid(cfg, payload, None, csi1, csi2)[0]
        rx = np.stack([tx, 0.8 * tx])
        sigma = 0.04
        rx = rx + (rng.normal(0, sigma / np.sqrt(2), rx.shape)
                   + 1j * rng.normal(0, sigma / np.sqrt(2), rx.shape))
        # Receiver does NOT know o_csi2; it derives it from decoded part 1.
        rx_cfg = pusch.PuschConfig(
            rnti=0x43, rb_start=0, rb_count=12, first_symbol=0,
            nof_symbols=14, modulation="qam16", target_code_rate=0.4,
            tbs=2152, nof_layers=1, n_id=5, dmrs_symbols=(2, 7, 11),
            uci=UciOnPuschConfig(o_ack=0, o_csi1=4, o_csi2=0))
        res = pusch.process_with_part2_feedback(
            jnp.asarray(rx.astype(np.complex64)), rx_cfg, descr)
        assert bool(res.tb_crc_ok)
        np.testing.assert_array_equal(np.asarray(res.tb_bits), payload)
        np.testing.assert_array_equal(np.asarray(res.csi1_bits), csi1)
        assert res.csi2_bits is not None
        assert res.csi2_bits.shape[-1] == o_csi2
        np.testing.assert_array_equal(np.asarray(res.csi2_bits), csi2)
