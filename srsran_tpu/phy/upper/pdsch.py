"""PDSCH transmit processor: full DL-SCH chain (TS38.212 §7.2, TS38.211 §7.3.1).

TPU-native replacement for pdsch_processor_{impl,flexible_impl}
(lib/phy/upper/channel_processors/pdsch/pdsch_processor_impl.h:35,
pdsch_processor_flexible_impl.h:35-71): TB CRC attach -> LDPC segmentation
(CB CRC24B) -> batched LDPC encode over the codeblock axis (the reference's
fork_cb_batches thread fan-out becomes the natural batch dimension) ->
rate match -> concatenate -> scramble -> modulate -> layer map -> precode ->
scatter into the resource grid alongside type-1 DM-RS.

Static per-config index plans (RE mapping, per-CB rate-match sizes) are
precomputed on the host; the array program is jit-compiled per
(TBS, MCS, allocation) shape bucket.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import ldpc_encode, ldpc_rate_match
from ...ops.crc import crc
from ...ops.modulation import modulate, BITS_PER_SYMBOL
from ...ops.scrambling import scramble_bits
from ...ops.precoding import (layer_map, precode, precode_prg,
                              identity_precoder)
from ...ran.ldpc_params import segment_tb, select_base_graph
from ...ran.precoding_codebooks import (PrecodingConfig, nof_prgs,
                                        resolve_matrices)
from .dmrs import DmrsConfig, map_to_grid as map_dmrs, TYPE1_PORT_CONFIG


@dataclasses.dataclass(frozen=True)
class PdschPtrs:
    """PT-RS parameters riding inside the PDSCH PDU (the reference nests
    ptrs fields in dl_pdsch_pdu and maps them in
    lib/phy/upper/signal_processors/ptrs/ptrs_pdsch_generator_impl.cpp)."""

    time_density: int = 1      # L_PT-RS: 1, 2, 4
    freq_density: int = 2      # K_PT-RS: 2 or 4 (every K-th RB)
    re_offset: int = 0         # k_RE_ref
    port: int = 0              # antenna port carrying PT-RS


@dataclasses.dataclass(frozen=True)
class PdschConfig:
    """Static PDSCH PDU description (mirror of fapi dl_pdsch_pdu essentials)."""

    rnti: int
    rb_start: int
    rb_count: int
    first_symbol: int
    nof_symbols: int
    modulation: str            # 'qpsk' | 'qam16' | 'qam64' | 'qam256'
    target_code_rate: float    # R (for base-graph selection)
    tbs: int                   # transport block size in bits
    nof_layers: int = 1
    rv: int = 0
    n_id: int = 0              # scrambling identity (cell id or configured)
    dmrs_symbols: tuple = (2,)
    dmrs_scrambling_id: int = 0
    n_scid: int = 0
    slot_in_frame: int = 0
    numerology: int = 0
    reserved_cdm_groups: int = 2  # DM-RS CDM groups without data (1 or 2)
    ptrs: PdschPtrs | None = None  # PT-RS on, with these params
    # FAPI txPrecodingAndBeamforming: per-PRG codebook matrices resolved
    # through ran/precoding_codebooks (the reference's precoding_matrix_
    # mapper path, lib/fapi_adaptor/precoding_matrix_mapper.cpp).  None =
    # identity port mapping (existing plans unchanged).
    precoding: PrecodingConfig | None = None
    # Resource allocation beyond contiguous type 1 (rb_allocation.cpp):
    # prbs = RA type 0 (explicit sorted PRB index tuple, overrides
    # rb_start/rb_count for the RE plans); vrb_prb_interleaved = type-1
    # VRBs through the TS38.211 7.3.1.6 interleaver over [0, bwp_size).
    prbs: tuple | None = None
    vrb_prb_interleaved: bool = False
    bwp_size: int | None = None


def alloc_prbs(cfg: "PdschConfig") -> np.ndarray:
    """Resolve the PDU's allocation to sorted absolute PRB indices
    (ran/rb_allocation: type 0 bitmap / interleaved / contiguous)."""
    from ...ran.rb_allocation import allocated_prbs
    return allocated_prbs(cfg.rb_start, cfg.rb_count, cfg.prbs,
                          cfg.vrb_prb_interleaved, 0, cfg.bwp_size)


@functools.lru_cache(maxsize=None)
def _data_re_plan(rb_start: int, rb_count: int, first_symbol: int,
                  nof_symbols: int, dmrs_symbols: tuple,
                  reserved_cdm_groups: int,
                  ptrs: "PdschPtrs | None" = None,
                  prbs: tuple | None = None) -> np.ndarray:
    """(symbol, subcarrier) positions of data REs in mapping order.

    Frequency-first within each symbol, symbols ascending (TS38.211
    §7.3.1.5).  On DM-RS symbols, CDM groups without data are excluded
    (group 0 = even REs, group 1 = odd REs for type 1).  PT-RS REs (when
    configured) are excluded on every layer — data maps around them.
    """
    ptrs_re = set()
    if ptrs is not None:
        from .ptrs_prs import PtrsConfig, ptrs_positions
        pos = ptrs_positions(PtrsConfig(
            rb_start=rb_start, rb_count=rb_count, first_symbol=first_symbol,
            nof_symbols=nof_symbols, dmrs_symbols=dmrs_symbols,
            time_density=ptrs.time_density, freq_density=ptrs.freq_density,
            re_offset=ptrs.re_offset, port=ptrs.port))
        ptrs_re = {(int(l), int(k)) for l, k in pos}
    out = []
    if prbs is not None:
        scs = np.concatenate([np.arange(p * 12, (p + 1) * 12)
                              for p in sorted(prbs)]).astype(np.int32)
    else:
        scs = np.arange(rb_start * 12, (rb_start + rb_count) * 12,
                        dtype=np.int32)
    for l in range(first_symbol, first_symbol + nof_symbols):
        if l in dmrs_symbols:
            if reserved_cdm_groups >= 2:
                continue                      # whole symbol reserved
            keep = scs[scs % 2 == 1]          # group 0 (even comb) is DM-RS
            out.extend((l, int(k)) for k in keep
                       if (l, int(k)) not in ptrs_re)
        else:
            out.extend((l, int(k)) for k in scs
                       if (l, int(k)) not in ptrs_re)
    return np.array(out, dtype=np.int32)


def _plan_prbs_key(cfg: PdschConfig) -> tuple | None:
    """Hashable PRB tuple for the RE-plan cache; None = contiguous."""
    if cfg.prbs is None and not cfg.vrb_prb_interleaved:
        return None
    return tuple(int(p) for p in alloc_prbs(cfg))


def nof_data_re(cfg: PdschConfig) -> int:
    return len(_data_re_plan(cfg.rb_start, cfg.rb_count, cfg.first_symbol,
                             cfg.nof_symbols, cfg.dmrs_symbols,
                             cfg.reserved_cdm_groups, cfg.ptrs,
                             _plan_prbs_key(cfg)))


def _cb_rate_match_sizes(g_total: int, c: int, qm: int, nl: int) -> list:
    """TS38.212 §5.4.2.1 E_r distribution over codeblocks."""
    unit = nl * qm
    base = unit * (g_total // (unit * c))
    gamma = (g_total // unit) % c
    return [base if j < c - gamma else base + unit for j in range(c)]


def encode_transport_block(payload_bits: jnp.ndarray, cfg: PdschConfig):
    """TB bits [tbs] -> rate-matched+concatenated codeword bits [G].

    Returns (codeword int8 [G], SegmentParams).
    """
    qm = BITS_PER_SYMBOL[cfg.modulation]
    g_total = nof_data_re(cfg) * qm * cfg.nof_layers
    bg = select_base_graph(cfg.tbs, cfg.target_code_rate)
    seg = segment_tb(cfg.tbs, bg)
    tb_crc = crc(payload_bits[None], "crc24A" if seg.tb_crc_bits == 24 else "crc16")
    b = jnp.concatenate([payload_bits[None], tb_crc], axis=-1)[0]   # [B]

    c, z = seg.nof_codeblocks, seg.lifting_size
    k_prime, k = seg.cb_info_bits, seg.full_block_bits
    payload_per_cb = k_prime - seg.cb_crc_bits
    total_needed = payload_per_cb * c
    pad = total_needed - b.shape[0]
    if pad:
        b = jnp.concatenate([b, jnp.zeros(pad, dtype=b.dtype)])
    cbs = b.reshape(c, payload_per_cb)
    if seg.cb_crc_bits:
        cb_crc = crc(cbs, "crc24B")
        cbs = jnp.concatenate([cbs, cb_crc], axis=-1)               # [C, K']
    # filler bits to K
    filler = jnp.zeros((c, k - k_prime), dtype=cbs.dtype)
    cbs_full = jnp.concatenate([cbs, filler], axis=-1)              # [C, K]
    code = ldpc_encode.encode(cbs_full, bg, z)                      # [C, NV*Z]
    tx_buf = code[:, 2 * z:]                                        # [C, N]
    e_sizes = _cb_rate_match_sizes(g_total, c, qm, cfg.nof_layers)
    codeword = ldpc_rate_match.rate_match_batch(
        tx_buf, e_sizes, cfg.rv, qm, bg, z, k_prime, k)             # [G]
    return codeword, seg


def prg_index_of_sc(sc: np.ndarray, rb_start: int, prg_size: int
                    ) -> np.ndarray:
    """Per-subcarrier PRG index (into the PDU's pm_indices), PRG boundaries
    aligned to CRB 0 (TS38.214 §5.1.2.3)."""
    return (sc // 12 // prg_size - rb_start // prg_size).astype(np.int32)


def dmrs_config(cfg: PdschConfig) -> DmrsConfig:
    return DmrsConfig(
        rb_start=cfg.rb_start, rb_count=cfg.rb_count, symbols=cfg.dmrs_symbols,
        ports=tuple(range(cfg.nof_layers)), scrambling_id=cfg.dmrs_scrambling_id,
        n_scid=cfg.n_scid, numerology=cfg.numerology,
        slot_in_frame=cfg.slot_in_frame, prbs=_plan_prbs_key(cfg))


def process(grid: jnp.ndarray, payload_bits: jnp.ndarray, cfg: PdschConfig,
            precoding: np.ndarray | None = None,
            dmrs_cinits=None, ptrs_cinits=None,
            pm_matrices=None) -> jnp.ndarray:
    """Run the full PDSCH chain into a [P, nsym, nsc] resource grid.

    dmrs_cinits: optional traced uint32 [nof_dmrs_symbols] so the compiled
    program is slot-independent (see dmrs.c_inits_for).
    pm_matrices: traced per-PRG [G, P, L] matrices when cfg.precoding is
    set (the conductor resolves PM indices through the codebook repository
    and uploads them as slot context — PMI changes never recompile).
    """
    nof_ports = grid.shape[0]
    if cfg.precoding is not None:
        if pm_matrices is None:         # direct (non-conductor) callers
            pm_matrices = jnp.asarray(
                resolve_matrices(nof_ports, cfg.precoding))
    elif precoding is None:
        precoding = identity_precoder(nof_ports, cfg.nof_layers)
    with jax.named_scope("sch_encode"):
        codeword, _ = encode_transport_block(payload_bits, cfg)
    c_init = (cfg.rnti << 15) + cfg.n_id
    with jax.named_scope("scramble"):
        scrambled = scramble_bits(codeword[None], c_init)
    with jax.named_scope("modulate"):
        symbols = modulate(scrambled, cfg.modulation)               # [1, S]
    layers = layer_map(symbols[0], cfg.nof_layers)                  # [L, S/L]
    plan = _data_re_plan(cfg.rb_start, cfg.rb_count, cfg.first_symbol,
                         cfg.nof_symbols, cfg.dmrs_symbols,
                         cfg.reserved_cdm_groups, cfg.ptrs,
                         _plan_prbs_key(cfg))
    sym_idx = jnp.asarray(plan[:, 0])
    sc_idx = jnp.asarray(plan[:, 1])
    with jax.named_scope("precode"):
        if cfg.precoding is not None:
            base_prb = int(alloc_prbs(cfg)[0])
            prg = prg_index_of_sc(plan[:, 1], base_prb,
                                  cfg.precoding.prg_size)
            ports = precode_prg(layers, pm_matrices,
                                jnp.asarray(prg))       # [P, S/L]
        else:
            ports = precode(layers, jnp.asarray(precoding))  # [P, S/L]
    with jax.named_scope("map_to_grid"):
        grid = grid.at[:, sym_idx, sc_idx].add(ports)
    with jax.named_scope("dmrs"):
        if cfg.precoding is not None:
            grid = map_dmrs(grid, dmrs_config(cfg), None, dmrs_cinits,
                            prg_matrices=pm_matrices,
                            prg_of_sc=lambda sc: prg_index_of_sc(
                                sc, int(alloc_prbs(cfg)[0]),
                                cfg.precoding.prg_size))
        else:
            grid = map_dmrs(grid, dmrs_config(cfg), precoding, dmrs_cinits)
    if cfg.ptrs is not None:
        from .ptrs_prs import PtrsConfig, map_ptrs
        with jax.named_scope("ptrs"):
            grid = map_ptrs(grid, PtrsConfig(
                rb_start=cfg.rb_start, rb_count=cfg.rb_count,
                first_symbol=cfg.first_symbol, nof_symbols=cfg.nof_symbols,
                dmrs_symbols=cfg.dmrs_symbols,
                time_density=cfg.ptrs.time_density,
                freq_density=cfg.ptrs.freq_density,
                re_offset=cfg.ptrs.re_offset, port=cfg.ptrs.port,
                scrambling_id=cfg.dmrs_scrambling_id, n_scid=cfg.n_scid,
                slot_in_frame=cfg.slot_in_frame), cinits=ptrs_cinits)
    return grid
