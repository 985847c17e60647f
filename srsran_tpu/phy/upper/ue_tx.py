"""UE-side PUSCH transmit with UCI multiplexing (TS38.212 §6.2.7).

The gNB receive chain (phy/upper/pusch.py) needs a faithful counterpart
to close loops in emulation: data LDPC-coded and rate-matched around the
UCI fields, HARQ-ACK/CSI encoded into their §6.2.7 positions
(ulsch_demux mux plan), placeholder-aware scrambling, and type-1 DM-RS.
The reference keeps this in its test doubles (pusch_processor test
vectors); here it is a package utility used by the UE emulator and
tests.  Single layer (the UL scheduler default); host-side numpy grid.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ...ops import ldpc_encode, ldpc_rate_match, ulsch_demux
from ...ops.crc import crc
from ...ops.gold import gold_sequence
from ...ops.modulation import modulate, BITS_PER_SYMBOL
from ...ran.ldpc_params import segment_tb, select_base_graph
from . import pusch as pusch_mod
from . import uci as uci_codec
from .dmrs import DmrsConfig, map_to_grid
from .pdsch import _cb_rate_match_sizes, _data_re_plan


def pusch_transmit(cfg: "pusch_mod.PuschConfig", payload: np.ndarray,
                   ack=None, csi1=None, csi2=None,
                   nof_sc: int | None = None) -> np.ndarray:
    """Build the UE's transmitted grid [1, 14, nof_sc] for one PUSCH PDU.

    ack/csi1/csi2: raw UCI bit arrays matching cfg.uci's o_* sizes (None
    when the PDU carries none).  The data codeword is rate-matched to the
    DATA field only, exactly inverse to the gNB demultiplexer.
    """
    qm = BITS_PER_SYMBOL[cfg.modulation]
    nof_sc = nof_sc or (cfg.rb_start + cfg.rb_count) * 12
    dcfg = pusch_mod.demux_plan(cfg)
    payload = np.asarray(payload).astype(np.int8)

    if dcfg is None:
        from .pdsch import PdschConfig, encode_transport_block
        tx_cfg = PdschConfig(
            rnti=cfg.rnti, rb_start=cfg.rb_start, rb_count=cfg.rb_count,
            first_symbol=cfg.first_symbol, nof_symbols=cfg.nof_symbols,
            modulation=cfg.modulation,
            target_code_rate=cfg.target_code_rate, tbs=cfg.tbs,
            nof_layers=cfg.nof_layers, rv=cfg.rv, n_id=cfg.n_id,
            dmrs_symbols=cfg.dmrs_symbols,
            slot_in_frame=cfg.slot_in_frame)
        cw, _ = encode_transport_block(jnp.asarray(payload), tx_cfg)
        cw = np.asarray(cw)
    else:
        f = ulsch_demux.field_positions(dcfg)
        bpre = qm * cfg.nof_layers
        data_e = len(f["data"]) * bpre
        bg = select_base_graph(cfg.tbs, cfg.target_code_rate)
        seg = segment_tb(cfg.tbs, bg)
        b = np.concatenate([
            payload,
            np.asarray(crc(jnp.asarray(payload[None]),
                           "crc24A" if seg.tb_crc_bits == 24
                           else "crc16"))[0]])
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
        e_sizes = _cb_rate_match_sizes(data_e, c, qm, cfg.nof_layers)
        outs = [np.asarray(ldpc_rate_match.rate_match(
            jnp.asarray(code[j:j + 1, 2 * z:]), e_sizes[j], cfg.rv, qm,
            bg, z, seg.cb_info_bits, seg.full_block_bits))[0]
            for j in range(c)]
        data_coded = np.concatenate(outs)
        ack_coded = csi1_coded = csi2_coded = None
        if ack is not None:
            pos = f["ack_punct"] if len(f["ack_punct"]) else f["ack"]
            ack_coded = np.asarray(uci_codec.encode_uci(
                jnp.asarray(np.asarray(ack).astype(np.int8)),
                len(pos) * bpre, qm))
        if csi1 is not None:
            csi1_coded = np.asarray(uci_codec.encode_uci(
                jnp.asarray(np.asarray(csi1).astype(np.int8)),
                len(f["csi1"]) * bpre, qm))
        if csi2 is not None:
            csi2_coded = np.asarray(uci_codec.encode_uci(
                jnp.asarray(np.asarray(csi2).astype(np.int8)),
                len(f["csi2"]) * bpre, qm))
        cw = ulsch_demux.mux_codeword(dcfg, data_coded, ack_coded,
                                      csi1_coded, csi2_coded)

    seq = np.asarray(gold_sequence((cfg.rnti << 15) + cfg.n_id, len(cw)))
    if dcfg is not None:
        cls = ulsch_demux.placeholder_bit_classes(
            dcfg, cfg.uci.o_ack, cfg.uci.o_csi1)
        scr = ulsch_demux.scramble_with_placeholders(np.asarray(cw), seq,
                                                     cls)
    else:
        scr = (np.asarray(cw).astype(np.int8) ^ seq).astype(np.int8)
    syms = np.asarray(modulate(jnp.asarray(scr[None]), cfg.modulation))[0]
    grid = np.zeros((1, 14, nof_sc), dtype=np.complex64)
    plan = _data_re_plan(cfg.rb_start, cfg.rb_count, cfg.first_symbol,
                         cfg.nof_symbols, cfg.dmrs_symbols, 2)
    grid[0, plan[:, 0], plan[:, 1]] = syms
    dmrs_cfg = DmrsConfig(rb_start=cfg.rb_start, rb_count=cfg.rb_count,
                          symbols=cfg.dmrs_symbols, ports=(0,),
                          scrambling_id=cfg.dmrs_scrambling_id,
                          n_scid=cfg.n_scid,
                          slot_in_frame=cfg.slot_in_frame)
    g = map_to_grid(jnp.asarray(grid), dmrs_cfg,
                    np.eye(1, dtype=np.complex64))
    return np.asarray(g)
