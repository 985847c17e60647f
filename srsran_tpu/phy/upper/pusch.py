"""PUSCH receive processor (TS38.211 §6.3.1, TS38.212 §6.2).

TPU-native analogue of pusch_processor_impl + pusch_demodulator_impl +
pusch_decoder_impl (lib/phy/upper/channel_processors/pusch/
pusch_processor_impl.h:42-87, demod loop pusch_demodulator_impl.cpp:275-400):

  DM-RS channel estimate -> per-RE equalize (ZF/MMSE) -> soft demap ->
  descramble -> [UL-SCH demux] -> rate dematch + HARQ combine + LDPC decode.

Instead of the reference's per-symbol streaming loop, all data REs of the
allocation are gathered once and equalized/demapped as a single fused array
program.  The codeblock axis batches the LDPC decode.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import channel_estimate as chest
from ...ops.equalizer import equalize
from ...ops.modulation import demodulate, BITS_PER_SYMBOL
from ...ops.scrambling import descramble_llrs
from ...ops import ulsch_demux
from ...ran.cyclic_prefix import CyclicPrefix, cp_lengths
from ...ran.ldpc_params import segment_tb, select_base_graph
from ...ran.uci_on_pusch import UciOnPuschConfig, uci_symbol_budget
from .dmrs import DmrsConfig, pilots_for_port, _type1_sc_indices, TYPE1_PORT_CONFIG
from .pdsch import _data_re_plan, _cb_rate_match_sizes
from . import sch_decoder
from . import uci as uci_codec
from ...ops import evm as evm_ops


@dataclasses.dataclass(frozen=True)
class PuschConfig:
    """Static PUSCH PDU description (mirror of fapi ul_pusch_pdu essentials)."""

    rnti: int
    rb_start: int
    rb_count: int
    first_symbol: int
    nof_symbols: int
    modulation: str
    target_code_rate: float
    tbs: int
    nof_layers: int = 1
    rv: int = 0
    n_id: int = 0
    dmrs_symbols: tuple = (2,)
    dmrs_scrambling_id: int = 0
    n_scid: int = 0
    slot_in_frame: int = 0
    numerology: int = 0
    reserved_cdm_groups: int = 2
    equalizer: str = "zf"      # 'zf' | 'mmse' (mmse only 1 layer)
    # time-domain channel interpolation between DM-RS symbols
    # (port_channel_estimator_td_interpolation_strategy): 'average' |
    # 'interpolate'
    td_interpolation: str = "average"
    uci: UciOnPuschConfig = UciOnPuschConfig()
    transform_precoding: bool = False  # DFT-s-OFDM (single layer only)
    # Intra-slot frequency hopping (TS38.214 §6.3): PRB start of the second
    # hop; None disables.  Hop 1 covers the first floor(N/2) symbols.
    second_hop_prb: int | None = None


def hop_configs(cfg: PuschConfig):
    """Split a hopping PUSCH into per-hop single-allocation configs."""
    if cfg.second_hop_prb is None:
        return (cfg,)
    n1 = cfg.nof_symbols // 2
    hop1_syms = tuple(s for s in cfg.dmrs_symbols
                      if s < cfg.first_symbol + n1)
    hop2_syms = tuple(s for s in cfg.dmrs_symbols
                      if s >= cfg.first_symbol + n1)
    assert hop1_syms and hop2_syms, \
        "frequency hopping needs DM-RS in both hops"
    h1 = dataclasses.replace(cfg, nof_symbols=n1, dmrs_symbols=hop1_syms,
                             second_hop_prb=None)
    h2 = dataclasses.replace(cfg, rb_start=cfg.second_hop_prb,
                             first_symbol=cfg.first_symbol + n1,
                             nof_symbols=cfg.nof_symbols - n1,
                             dmrs_symbols=hop2_syms, second_hop_prb=None)
    return (h1, h2)


@dataclasses.dataclass
class PuschResult:
    tb_bits: jnp.ndarray
    tb_crc_ok: jnp.ndarray
    cb_crc_ok: jnp.ndarray
    new_soft: jnp.ndarray
    csi: chest.ChannelEstimate
    evm: jnp.ndarray            # RMS EVM from hard decisions (ops.evm)
    harq_ack_bits: jnp.ndarray | None = None
    harq_ack_valid: jnp.ndarray | None = None
    csi1_bits: jnp.ndarray | None = None
    csi1_valid: jnp.ndarray | None = None
    csi2_bits: jnp.ndarray | None = None
    csi2_valid: jnp.ndarray | None = None
    nof_iterations: jnp.ndarray | None = None  # LDPC sweeps used (early stop)


def demux_plan(cfg: PuschConfig):
    """Build the §6.2.7 class-map plan for this PUSCH (None without UCI)."""
    u = cfg.uci
    if u.o_ack == 0 and u.o_csi1 == 0 and u.o_csi2 == 0:
        return None
    qm = BITS_PER_SYMBOL[cfg.modulation]
    syms = range(cfg.first_symbol, cfg.first_symbol + cfg.nof_symbols)
    re_per_symbol = tuple(
        0 if l in cfg.dmrs_symbols else cfg.rb_count * 12 for l in syms)
    m_total = sum(re_per_symbol)
    # anchor l1: first symbol after the first DM-RS symbol
    first_dmrs = min(cfg.dmrs_symbols)
    m_from_l1 = sum(r for l, r in zip(syms, re_per_symbol) if l > first_dmrs)
    seg = segment_tb(cfg.tbs, select_base_graph(cfg.tbs, cfg.target_code_rate))
    sum_kr = cfg.tbs + seg.tb_crc_bits + seg.nof_codeblocks * seg.cb_crc_bits
    q_ack = uci_symbol_budget(u.o_ack, u.beta_ack, u.alpha, m_total,
                              m_from_l1, sum_kr, qm, cfg.nof_layers)
    q_csi1 = uci_symbol_budget(u.o_csi1, u.beta_csi1, u.alpha, m_total,
                               m_total, sum_kr, qm, cfg.nof_layers,
                               already_used=q_ack)
    q_csi2 = uci_symbol_budget(u.o_csi2, u.beta_csi2, u.alpha, m_total,
                               m_total, sum_kr, qm, cfg.nof_layers,
                               already_used=q_ack + q_csi1)
    dcfg = ulsch_demux.DemuxConfig(
        nof_symbols=cfg.nof_symbols, first_symbol=cfg.first_symbol,
        re_per_symbol=re_per_symbol, dmrs_symbols=cfg.dmrs_symbols,
        qm=qm, nof_layers=cfg.nof_layers, q_ack=q_ack, q_csi1=q_csi1,
        q_csi2=q_csi2, ack_reserved=u.o_ack <= 2)
    return dcfg


def dmrs_config(cfg: PuschConfig) -> DmrsConfig:
    return DmrsConfig(
        rb_start=cfg.rb_start, rb_count=cfg.rb_count, symbols=cfg.dmrs_symbols,
        ports=tuple(range(cfg.nof_layers)), scrambling_id=cfg.dmrs_scrambling_id,
        n_scid=cfg.n_scid, numerology=cfg.numerology,
        slot_in_frame=cfg.slot_in_frame)


def estimate_channel(grid: jnp.ndarray, cfg: PuschConfig,
                     dmrs_cinits=None) -> chest.ChannelEstimate:
    """Estimate [P, L, nsym_slot, nsc_alloc] channel from DM-RS.

    Layers 1-2 ride DM-RS type-1 CDM group 0 (delta 0); layers 3-4 add CDM
    group 1 (delta 1), estimated separately and concatenated on the layer
    axis (beyond the reference, whose PUSCH caps at 1 layer)."""
    if cfg.nof_layers > 2:
        e0 = _estimate_group(grid, cfg, dmrs_cinits, (0, 1), 0)
        e1 = _estimate_group(grid, cfg, dmrs_cinits,
                             tuple(range(2, cfg.nof_layers)), 1)
        nv = (e0.noise_var + e1.noise_var) / 2
        rsrp = (e0.rsrp + e1.rsrp) / 2
        return chest.ChannelEstimate(
            coeffs=jnp.concatenate([e0.coeffs, e1.coeffs], axis=1),
            noise_var=nv, rsrp=rsrp, epre=(e0.epre + e1.epre) / 2,
            snr=rsrp / jnp.maximum(nv, 1e-12),
            time_alignment_s=(e0.time_alignment_s + e1.time_alignment_s) / 2,
            cfo_hz=(e0.cfo_hz + e1.cfo_hz) / 2)
    return _estimate_group(grid, cfg, dmrs_cinits,
                           tuple(range(cfg.nof_layers)), 0)


def _estimate_group(grid: jnp.ndarray, cfg: PuschConfig, dmrs_cinits,
                    ports: tuple, delta: int) -> chest.ChannelEstimate:
    """Single-CDM-group estimate for the given DM-RS ports."""
    dmrs_cfg = dmrs_config(cfg)
    sc_abs = _type1_sc_indices(cfg.rb_start, cfg.rb_count, delta)
    rx_pilots = grid[:, jnp.asarray(np.asarray(cfg.dmrs_symbols)), :][:, :, jnp.asarray(sc_abs)]
    if cfg.transform_precoding:
        # DFT-s-OFDM DM-RS uses low-PAPR sequences (TS38.211 §6.4.1.1.1.2).
        from ...ops.low_papr import base_sequence
        assert cfg.nof_layers == 1
        seq = jnp.asarray(base_sequence(cfg.dmrs_scrambling_id % 30, 0,
                                        6 * cfg.rb_count))
        expected = jnp.broadcast_to(
            seq, (1, len(cfg.dmrs_symbols), 6 * cfg.rb_count)).astype(jnp.complex64)
    else:
        expected = jnp.stack([pilots_for_port(dmrs_cfg, p, dmrs_cinits)
                              for p in ports])                      # [L, S, K]
    # symbol start times for CFO estimation
    lens = cp_lengths(CyclicPrefix.NORMAL, cfg.numerology, 2048)
    scs = 15_000 << cfg.numerology
    fs = 2048 * scs
    starts = np.cumsum(np.concatenate([[0], (lens + 2048)[:-1]])) + lens
    times = (starts / fs).astype(np.float64)
    pilot_rel = sc_abs - cfg.rb_start * 12
    return chest.estimate(
        rx_pilots, expected, pilot_rel, cfg.rb_count * 12, 14,
        float(scs), stride=2, smoothing="filter",
        dmrs_symbol_times_s=times[np.asarray(cfg.dmrs_symbols)],
        td_strategy=cfg.td_interpolation,
        dmrs_symbol_idx=np.asarray(cfg.dmrs_symbols),
        cdm_pairs=len(ports) > 1)


def _frontend_hop(grid: jnp.ndarray, cfg: PuschConfig, dmrs_cinits=None):
    """Single-hop front end: estimate -> gather -> equalize.

    Returns (x [RE, L], out_nv [RE, L], est)."""
    with jax.named_scope("channel_estimate"):
        est = estimate_channel(grid, cfg, dmrs_cinits)
    plan = _data_re_plan(cfg.rb_start, cfg.rb_count, cfg.first_symbol,
                         cfg.nof_symbols, cfg.dmrs_symbols,
                         cfg.reserved_cdm_groups)
    sym_idx, sc_idx = jnp.asarray(plan[:, 0]), jnp.asarray(plan[:, 1])
    y = grid[:, sym_idx, sc_idx].T                       # [RE, P]
    sc_rel = jnp.asarray(plan[:, 1] - cfg.rb_start * 12)
    if est.coeffs.shape[2] == 1:                         # time-constant est
        h = est.coeffs[:, :, 0, sc_rel]                  # [P, L, RE]
    else:
        h = est.coeffs[:, :, sym_idx, sc_rel]            # [P, L, RE]
    h = jnp.transpose(h, (2, 0, 1))                      # [RE, P, L]
    nv = jnp.mean(est.noise_var)
    with jax.named_scope("equalize"):
        x, out_nv = equalize(y, h, jnp.broadcast_to(nv, y.shape[:1]),
                             cfg.nof_layers, cfg.equalizer)
    return x, out_nv, est


def _repair_placeholders(llr_field, pos_re, o_field: int, qm: int, bpre: int,
                         c_init, total_bits: int):
    """Undo scrambling on UCI placeholder bits (TS38.212 x/y placeholders;
    ulsch_demultiplex_impl.cpp:105-194): for 1-bit payloads bit 1 ('y') is
    re-descrambled with bit 0's scrambling bit; bits 2..Qm-1 ('x') were
    never scrambled, so the uniform descramble is reverted."""
    if qm == 1 or o_field == 0 or o_field > 2 or len(pos_re) == 0:
        return llr_field
    if qm == 2 and o_field == 2:
        return llr_field  # no placeholders: both bits carry payload
    from ...ops.gold import gold_sequence
    bit_idx = (np.asarray(pos_re)[:, None].astype(np.int64) * bpre
               + np.arange(bpre)).reshape(-1)
    seq = gold_sequence(c_init, total_bits)            # CSE'd with descramble
    c = seq[jnp.asarray(bit_idx)].reshape(-1, qm)
    cols = [jnp.ones((c.shape[0], 1), llr_field.dtype)]
    if o_field == 1:
        cols.append(jnp.where((c[:, 0] ^ c[:, 1]) == 1, -1.0, 1.0
                              ).astype(llr_field.dtype)[:, None])
    else:
        cols.append(jnp.ones((c.shape[0], 1), llr_field.dtype))
    if qm > 2:
        cols.append(jnp.where(c[:, 2:] == 1, -1.0, 1.0).astype(llr_field.dtype))
    signs = jnp.concatenate(cols, axis=1)
    return (llr_field.reshape(-1, qm) * signs).reshape(-1)


def codeword_llrs(grid: jnp.ndarray, cfg: PuschConfig, dmrs_cinits=None):
    """Front end through descrambling: (codeword LLRs, channel estimate).

    Intra-slot frequency hopping runs the front end per hop (each hop has
    its own DM-RS estimate and PRB range), concatenating equalized symbols
    in codeword order."""
    hops = hop_configs(cfg)
    if len(hops) == 1:
        x, out_nv, est = _frontend_hop(grid, cfg, dmrs_cinits)
    else:
        xs, nvs_h, ests = [], [], []
        off = 0
        for h_cfg in hops:
            nsym = len(h_cfg.dmrs_symbols)
            ci = None if dmrs_cinits is None else dmrs_cinits[off:off + nsym]
            off += nsym
            xh, nvh, eh = _frontend_hop(grid, h_cfg, ci)
            xs.append(xh)
            nvs_h.append(nvh)
            ests.append(eh)
        x = jnp.concatenate(xs, axis=0)
        out_nv = jnp.concatenate(nvs_h, axis=0)
        est = ests[0]  # report hop-1 CSI (reference reports merged stats)
    if cfg.transform_precoding:
        # Inverse DFT-s-OFDM: IDFT each data symbol's M_sc block
        # (pusch_demodulator_impl's inv transform precode step).
        from ...ops.transform_precode import deprecode
        m_sc = cfg.rb_count * 12
        blocks = x[:, 0].reshape(-1, m_sc)
        x = deprecode(blocks).reshape(-1, 1)
        out_nv = jnp.mean(out_nv.reshape(-1, m_sc), axis=-1,
                          keepdims=True).repeat(m_sc, axis=-1).reshape(-1, 1)
    # layer demap: [RE, L] -> codeword order d(i): i-th symbol = (re, layer)
    syms = x.reshape(-1)                                 # RE-major, layer-minor
    nvs = out_nv.reshape(-1)
    with jax.named_scope("demodulate"):
        llr = demodulate(syms[None], nvs[None], cfg.modulation)
    with jax.named_scope("evm"):
        # real EVM from hard decisions on the equalized symbols (the
        # reference's evm_calculator_generic_impl hook inside the
        # demodulator, pusch_demodulator_impl.cpp)
        evm_val = evm_ops.evm(syms, llr[0], cfg.modulation)
    c_init = (cfg.rnti << 15) + cfg.n_id
    with jax.named_scope("descramble"):
        llr = descramble_llrs(llr, c_init)[0]
    return llr, est, evm_val


def decode_from_llrs(llr: jnp.ndarray, est, cfg: PuschConfig,
                     soft_buffer: jnp.ndarray | None = None,
                     nof_iterations: int = 6,
                     evm_val: jnp.ndarray | None = None) -> PuschResult:
    """UL-SCH demux + UCI decode + rate dematch + LDPC decode from
    descrambled codeword LLRs (the back half of process())."""
    c_init = (cfg.rnti << 15) + cfg.n_id
    qm = BITS_PER_SYMBOL[cfg.modulation]
    bpre = qm * cfg.nof_layers                     # bits per RE
    uci_out = {}
    dcfg = demux_plan(cfg)
    if dcfg is not None:
        fields = ulsch_demux.field_positions(dcfg)
        llr_re = llr.reshape(-1, bpre)
        u = cfg.uci
        if u.o_ack:
            pos = fields["ack_punct"] if len(fields["ack_punct"]) else fields["ack"]
            ack_llr = llr_re[jnp.asarray(pos)].reshape(-1)
            ack_llr = _repair_placeholders(ack_llr, pos, u.o_ack, qm, bpre,
                                           c_init, llr.shape[0])
            b, ok, met = uci_codec.decode_uci(ack_llr, u.o_ack, qm)
            uci_out.update(harq_ack_bits=b, harq_ack_valid=ok)
        if u.o_csi1:
            c1 = llr_re[jnp.asarray(fields["csi1"])].reshape(-1)
            c1 = _repair_placeholders(c1, fields["csi1"], u.o_csi1, qm, bpre,
                                      c_init, llr.shape[0])
            b, ok, _ = uci_codec.decode_uci(c1, u.o_csi1, qm)
            uci_out.update(csi1_bits=b, csi1_valid=ok)
        if u.o_csi2:
            c2 = llr_re[jnp.asarray(fields["csi2"])].reshape(-1)
            b, ok, _ = uci_codec.decode_uci(c2, u.o_csi2, qm)
            uci_out.update(csi2_bits=b, csi2_valid=ok)
        # data = DATA + reserved positions, with punctured-ACK REs zeroed
        data_llr_re = llr_re[jnp.asarray(fields["data"])]
        if len(fields["ack_punct"]):
            punct_mask = np.isin(fields["data"], fields["ack_punct"])
            data_llr_re = jnp.where(jnp.asarray(punct_mask)[:, None], 0.0,
                                    data_llr_re)
        llr = data_llr_re.reshape(-1)

    bg = select_base_graph(cfg.tbs, cfg.target_code_rate)
    seg = segment_tb(cfg.tbs, bg)
    e_sizes = _cb_rate_match_sizes(llr.shape[0], seg.nof_codeblocks, qm,
                                   cfg.nof_layers)
    with jax.named_scope("sch_decode"):
        res = sch_decoder.decode(llr, seg, e_sizes, cfg.rv, qm, cfg.tbs,
                                 soft_buffer=soft_buffer,
                                 nof_iterations=nof_iterations)
    return PuschResult(tb_bits=res.tb_bits, tb_crc_ok=res.tb_crc_ok,
                       cb_crc_ok=res.cb_crc_ok, new_soft=res.new_soft,
                       csi=est,
                       evm=(jnp.mean(jnp.abs(llr)) if evm_val is None
                            else evm_val),
                       nof_iterations=res.nof_iterations, **uci_out)


def process(grid: jnp.ndarray, cfg: PuschConfig,
            soft_buffer: jnp.ndarray | None = None,
            nof_iterations: int = 6,
            dmrs_cinits=None) -> PuschResult:
    """Full PUSCH receive.  grid: complex64 [P, nsym, nsc] rx resource grid."""
    llr, est, evm_val = codeword_llrs(grid, cfg, dmrs_cinits)
    return decode_from_llrs(llr, est, cfg, soft_buffer, nof_iterations,
                            evm_val=evm_val)


def process_with_part2_feedback(grid: jnp.ndarray, cfg: PuschConfig,
                                part2_descr,
                                soft_buffer: jnp.ndarray | None = None,
                                nof_iterations: int = 6,
                                dmrs_cinits=None) -> PuschResult:
    """PUSCH receive where the CSI part-2 size is derived from the decoded
    part-1 payload (pusch_processor_csi_part1_feedback,
    pusch_processor_impl.cpp:52-104 + uci_part2_size_calculator.cpp).

    TPU-native shape: the front end runs once; CSI part 1 is decoded and
    synced to host; the part-2 size selects the final (static-shape) demux
    plan, whose compiled program is cached per distinct size — the dynamic
    decision is a host branch between compiled programs, like the
    reference's callback re-configuring the demultiplexer mid-PDU.
    """
    from ...ran.uci_on_pusch import uci_part2_get_size
    u = cfg.uci
    assert u.o_csi1 > 0, "part-2 feedback needs CSI part 1 on PUSCH"
    llr, est, evm_val = codeword_llrs(grid, cfg, dmrs_cinits)
    # Phase 1: CSI1 placement is independent of the part-2 size (CSI2 fills
    # strictly later free REs), so decode part 1 under an o_csi2=0 plan.
    cfg1 = dataclasses.replace(cfg, uci=dataclasses.replace(u, o_csi2=0))
    dcfg1 = demux_plan(cfg1)
    fields1 = ulsch_demux.field_positions(dcfg1)
    qm = BITS_PER_SYMBOL[cfg.modulation]
    bpre = qm * cfg.nof_layers
    c_init = (cfg.rnti << 15) + cfg.n_id
    c1 = llr.reshape(-1, bpre)[jnp.asarray(fields1["csi1"])].reshape(-1)
    c1 = _repair_placeholders(c1, fields1["csi1"], u.o_csi1, qm, bpre,
                              c_init, llr.shape[0])
    csi1_bits, csi1_ok, _ = uci_codec.decode_uci(c1, u.o_csi1, qm)
    # Host sync: the part-1 payload gates the part-2 size.
    o_csi2 = uci_part2_get_size(np.asarray(csi1_bits), part2_descr)
    cfg2 = dataclasses.replace(cfg, uci=dataclasses.replace(u, o_csi2=o_csi2))
    res = decode_from_llrs(llr, est, cfg2, soft_buffer, nof_iterations,
                           evm_val=evm_val)
    return dataclasses.replace(res, csi1_bits=csi1_bits, csi1_valid=csi1_ok)
