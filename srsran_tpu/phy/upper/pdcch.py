"""PDCCH processor: DCI polar chain + CORESET mapping (TS38.211 §7.3.2).

TPU-native analogue of pdcch_processor_impl / pdcch_encoder_impl /
pdcch_modulator_impl (lib/phy/upper/channel_processors/pdcch/): DCI CRC24C
with leading-ones and RNTI masking (TS38.212 §7.3.2), polar nmax=9 with DL
input interleaver, E = 108 * aggregation_level, QPSK, Gold scrambling, and
REG/CCE mapping with per-RB DM-RS at subcarriers 1/5/9.

Non-interleaved CCE-to-REG mapping (bundle 6) is implemented; the CORESET is
described by (rb_start, nof_rb multiple of 6, duration 1-3 symbols).
"""

from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

from ...ops import polar as polar_ops
from ...ops.crc import crc, crc_check
from ...ops.gold import gold_sequence
from ...ops.modulation import modulate, demodulate
from ...ops.scrambling import scramble_bits, descramble_llrs
from ...ran import polar_params

NOF_REG_PER_CCE = 6
DATA_RE_PER_REG = 9
BITS_PER_CCE = 2 * DATA_RE_PER_REG * NOF_REG_PER_CCE  # 108


@dataclasses.dataclass(frozen=True)
class CoresetConfig:
    rb_start: int
    nof_rb: int                # multiple of 6
    start_symbol: int
    duration: int              # 1..3 symbols
    # CCE-to-REG mapping (TS38.211 §7.3.2.2): non-interleaved uses bundle 6;
    # interleaved uses bundle size L in {2, 6} (or {3, 6} for duration 3),
    # interleaver depth R in {2, 3, 6} and shift n_shift.
    interleaved: bool = False
    reg_bundle_size: int = 6
    interleaver_size: int = 2
    shift_index: int = 0


@dataclasses.dataclass(frozen=True)
class PdcchConfig:
    """One DCI candidate (mirror of fapi dl_pdcch_pdu.dl_dci essentials)."""

    coreset: CoresetConfig
    rnti: int
    aggregation_level: int     # 1,2,4,8,16
    cce_index: int
    payload_bits: int          # A
    n_id: int = 0              # pdcch DMRS scrambling id (cell id)
    n_id_data: int = 0         # scrambling id for data
    n_rnti: int = 0            # scrambling rnti (UE-SS with C-RNTI else 0)
    slot_in_frame: int = 0


@functools.lru_cache(maxsize=None)
def _dci_code(k: int, e: int) -> polar_params.PolarCode:
    return polar_params.polar_code(k, e, nmax=9, ibil=False)


def encode_dci(payload: jnp.ndarray, cfg: PdcchConfig) -> jnp.ndarray:
    """TS38.212 §7.3: CRC24C over (1^24 ++ a), RNTI-masked, polar, RM.

    payload: int8 [A] -> encoded bits int8 [E].
    """
    e = BITS_PER_CCE * cfg.aggregation_level
    a = payload.shape[-1]
    ones = jnp.ones((1, 24), dtype=jnp.int8)
    ext = jnp.concatenate([ones, payload[None]], axis=-1)
    c = crc(ext, "crc24C")[0]                                 # [24]
    mask = jnp.asarray([(cfg.rnti >> (15 - i)) & 1 for i in range(16)],
                       dtype=jnp.int8)
    c = c.at[8:].set(c[8:] ^ mask)
    bits = jnp.concatenate([payload, c])[None]                # [1, A+24]
    code = _dci_code(a + 24, e)
    u = polar_ops.allocate(bits, code)
    d = polar_ops.encode(u, code.n)
    return polar_ops.rate_match(d, code)[0]


def decode_dci(llrs: jnp.ndarray, cfg: PdcchConfig):
    """Inverse for loopback tests / UE-side: returns (payload, crc_ok)."""
    a = cfg.payload_bits
    e = BITS_PER_CCE * cfg.aggregation_level
    code = _dci_code(a + 24, e)
    lm = polar_ops.rate_dematch(llrs[None], code)
    dec = polar_ops.sc_decode(lm, code)[0]                    # [A+24]
    mask = jnp.asarray([(cfg.rnti >> (15 - i)) & 1 for i in range(16)],
                       dtype=jnp.int8)
    unmasked = dec.at[a + 8:].set(dec[a + 8:] ^ mask)
    ones = jnp.ones((1, 24), dtype=jnp.int8)
    ext = jnp.concatenate([ones, unmasked[None]], axis=-1)
    ok = crc_check(ext, "crc24C")[0]
    return dec[:a], ok


@functools.lru_cache(maxsize=None)
def _fused_dci_maps(a: int, e: int, rnti: int, n_rnti: int, n_id_data: int):
    """Host GF(2) affine map for the whole §7.3 DCI TX chain.

    CRC24C with leading ones, RNTI masking, polar allocate/encode/rate-match
    and Gold scrambling collapse to encoded = payload @ M ^ const — one MXU
    matmul on device (same trick as ssb._fused_pbch_maps).  Returns
    (M [A, E] int8, const [E] int32).
    """
    from ...ops.gf2 import gf2_matmul
    from ...ops.crc import _remainder_matrix
    from ...ops.gold import gold_sequence_np

    mc = _remainder_matrix("crc24C", 24 + a).astype(np.uint8)   # [24+A, 24]
    const_c = mc[:24].sum(axis=0) % 2                           # leading ones
    mask = np.zeros(24, dtype=np.uint8)
    for i in range(16):
        mask[8 + i] = (rnti >> (15 - i)) & 1
    m_bits = np.concatenate([np.eye(a, dtype=np.uint8), mc[24:]], axis=1)
    const_bits = np.concatenate([np.zeros(a, dtype=np.uint8),
                                 (const_c ^ mask).astype(np.uint8)])
    m_enc = polar_ops.encode_matrix(_dci_code(a + 24, e))       # [A+24, E]
    m = gf2_matmul(m_bits, m_enc).astype(np.int8)               # [A, E]
    scr_cinit = ((n_rnti << 16) + n_id_data) % (1 << 31)
    const = (gf2_matmul(const_bits[None], m_enc)[0]
             ^ gold_sequence_np(scr_cinit, e).astype(np.uint8))
    return m, const.astype(np.int32)


@functools.lru_cache(maxsize=None)
def _bundle_map(coreset: CoresetConfig) -> np.ndarray:
    """f(j): logical REG-bundle index -> physical bundle (TS38.211 §7.3.2.2)."""
    nof_reg = coreset.nof_rb * coreset.duration
    l = coreset.reg_bundle_size if coreset.interleaved else 6
    nof_bundles = nof_reg // l
    if not coreset.interleaved:
        return np.arange(nof_bundles, dtype=np.int64)
    r_depth = coreset.interleaver_size
    c_cols = nof_bundles // r_depth
    assert c_cols * r_depth == nof_bundles, \
        "CORESET size incompatible with interleaver depth"
    f = np.empty(nof_bundles, dtype=np.int64)
    for x in range(nof_bundles):
        c, r = divmod(x, r_depth)
        f[x] = (r * c_cols + c + coreset.shift_index) % nof_bundles
    return f


@functools.lru_cache(maxsize=None)
def _candidate_re_plan(coreset: CoresetConfig, cce_index: int,
                       aggregation_level: int):
    """(data_positions [Nd, 2], dmrs_positions [Np, 2], dmrs_prb [Np]) as
    (symbol, subcarrier); REG numbering is time-first (TS38.211 §7.3.2.2)."""
    l = coreset.reg_bundle_size if coreset.interleaved else 6
    fmap = _bundle_map(coreset)
    regs = []
    bundles_per_cce = 6 // l
    for cce in range(cce_index, cce_index + aggregation_level):
        for b in range(bundles_per_cce):
            phys = fmap[cce * bundles_per_cce + b]
            for r in range(l):
                regs.append(int(phys) * l + r)
    data, dmrs, dmrs_prb = [], [], []
    for reg in sorted(regs):
        rb = reg // coreset.duration
        l = coreset.start_symbol + reg % coreset.duration
        prb = coreset.rb_start + rb
        for sc in range(12):
            pos = (l, prb * 12 + sc)
            if sc % 4 == 1:
                dmrs.append(pos)
                dmrs_prb.append(prb)
            else:
                data.append(pos)
    return (np.array(data, dtype=np.int32), np.array(dmrs, dtype=np.int32),
            np.array(dmrs_prb, dtype=np.int32))


@functools.lru_cache(maxsize=None)
def _patch_plan(coreset: CoresetConfig, cce_index: int, aggregation_level: int):
    """Host plan turning the candidate's RE map into ONE dense-patch gather.

    A 2-D scatter-add into the slot grid serializes on TPU (~50 ns/index,
    ~30 us for an AL8 candidate); instead we gather values into a dense
    [duration, nof_rb*12] CORESET patch (inverse permutation, index 0 =
    hole) and add it to the grid as a static slice — the same idiom as
    ssb.map_ssb_to_grid.  Returns (inv_idx [duration*width] int32 into
    concat([0], data_syms, pilots), l0, sc0, duration, width).
    """
    data_pos, dmrs_pos, _ = _candidate_re_plan(coreset, cce_index,
                                               aggregation_level)
    width = coreset.nof_rb * 12
    l0 = coreset.start_symbol
    sc0 = coreset.rb_start * 12
    inv = np.zeros(coreset.duration * width, dtype=np.int32)
    for k, (l, sc) in enumerate(data_pos):
        inv[(l - l0) * width + (sc - sc0)] = 1 + k
    # pilots are emitted by _dmrs_values ordered by symbol then row order
    nd = len(data_pos)
    j = 0
    for l in sorted(set(dmrs_pos[:, 0].tolist())):
        for ll, sc in dmrs_pos[dmrs_pos[:, 0] == l]:
            inv[(ll - l0) * width + (sc - sc0)] = 1 + nd + j
            j += 1
    return inv, l0, sc0, coreset.duration, width


def dmrs_cinits_for(cfg: PdcchConfig, slot_in_frame: int | None = None) -> np.ndarray:
    """Host-side per-CORESET-symbol DM-RS c_init (uint32 [duration])."""
    sif = cfg.slot_in_frame if slot_in_frame is None else slot_in_frame
    return np.array(
        [((1 << 17) * (14 * sif + l + 1) * (2 * cfg.n_id + 1) + 2 * cfg.n_id)
         % (1 << 31)
         for l in range(cfg.coreset.start_symbol,
                        cfg.coreset.start_symbol + cfg.coreset.duration)],
        dtype=np.uint32)


@functools.lru_cache(maxsize=8192)
def dmrs_values_for(cfg: PdcchConfig,
                    slot_in_frame: int | None = None) -> np.ndarray:
    """Host-side DM-RS pilot VALUES in candidate order (complex64 [n_dmrs]).

    Preferred traced input for process(): replaces the per-symbol device
    Gold + QPSK + gather with one uploaded vector (lru-cached per slot)."""
    from ...ops.gold import gold_sequence_np
    from ...ops.modulation import qpsk_np
    sif = cfg.slot_in_frame if slot_in_frame is None else slot_in_frame
    _, dmrs_pos, dmrs_prb = _candidate_re_plan(
        cfg.coreset, cfg.cce_index, cfg.aggregation_level)
    out = []
    for l in sorted(set(dmrs_pos[:, 0].tolist())):
        sel = dmrs_pos[:, 0] == l
        prbs = dmrs_prb[sel]
        c_init = ((1 << 17) * (14 * sif + l + 1)
                  * (2 * cfg.n_id + 1) + 2 * cfg.n_id) % (1 << 31)
        pmin, pmax = int(prbs.min()), int(prbs.max())
        pilots = qpsk_np(gold_sequence_np(c_init, 2 * 3 * (pmax - pmin + 1),
                                          advance=2 * 3 * pmin))
        idx = []
        counters = {}
        for p in prbs:
            k = counters.get(p, 0)
            idx.append(3 * (p - pmin) + k)
            counters[p] = k + 1
        out.append(pilots[np.array(idx, dtype=np.int32)])
    return np.concatenate(out).astype(np.complex64)


def _dmrs_values(cfg: PdcchConfig, dmrs_pos: np.ndarray,
                 dmrs_prb: np.ndarray, cinits=None) -> jnp.ndarray:
    """QPSK pilots; Gold advance = 2*3*prb within each symbol's sequence."""
    if cinits is not None and jnp.issubdtype(
            getattr(cinits, "dtype", jnp.uint32), jnp.complexfloating):
        return jnp.asarray(cinits)         # host-built values (dmrs_values_for)
    out = []
    for l in sorted(set(dmrs_pos[:, 0].tolist())):
        sel = dmrs_pos[:, 0] == l
        prbs = dmrs_prb[sel]
        if cinits is None:
            c_init = ((1 << 17) * (14 * cfg.slot_in_frame + l + 1)
                      * (2 * cfg.n_id + 1) + 2 * cfg.n_id) % (1 << 31)
        else:
            c_init = cinits[l - cfg.coreset.start_symbol]
        pmin, pmax = int(prbs.min()), int(prbs.max())
        bits = gold_sequence(c_init, 2 * 3 * (pmax - pmin + 1),
                             advance=2 * 3 * pmin)
        pilots = modulate(bits[None], "qpsk")[0]   # [3*(range)]
        # index within the generated run: 3*(prb-pmin) + pilot_idx_in_rb
        idx = []
        counters = {}
        for p in prbs:
            k = counters.get(p, 0)
            idx.append(3 * (p - pmin) + k)
            counters[p] = k + 1
        out.append(pilots[jnp.asarray(np.array(idx, dtype=np.int32))])
    return jnp.concatenate(out)


def process(grid: jnp.ndarray, payload: jnp.ndarray, cfg: PdcchConfig,
            amplitude: float = 1.0, dmrs_cinits=None) -> jnp.ndarray:
    """Encode + modulate + map one DCI into port 0 of the grid.

    The encode+scramble bit chain is one fused GF(2) matmul
    (_fused_dci_maps); equality with encode_dci+scramble_bits is asserted
    in tests/test_pdcch_dmrs2.py.
    """
    e = BITS_PER_CCE * cfg.aggregation_level
    m, const = _fused_dci_maps(cfg.payload_bits, e, cfg.rnti, cfg.n_rnti,
                               cfg.n_id_data)
    acc = jnp.matmul(jnp.asarray(payload).astype(jnp.int8), jnp.asarray(m),
                     preferred_element_type=jnp.int32)
    b = ((acc + jnp.asarray(const)) & 1).astype(jnp.int8)[None]
    syms = modulate(b, "qpsk")[0] * amplitude
    _, dmrs_pos, dmrs_prb = _candidate_re_plan(
        cfg.coreset, cfg.cce_index, cfg.aggregation_level)
    pilots = _dmrs_values(cfg, dmrs_pos, dmrs_prb, dmrs_cinits) * amplitude
    inv, l0, sc0, dur, width = _patch_plan(cfg.coreset, cfg.cce_index,
                                           cfg.aggregation_level)
    values = jnp.concatenate(
        [jnp.zeros(1, dtype=jnp.complex64), syms.astype(jnp.complex64),
         pilots.astype(jnp.complex64)])
    patch = values[jnp.asarray(inv)].reshape(dur, width)
    return grid.at[0, l0:l0 + dur, sc0:sc0 + width].add(patch)


def recover(grid: jnp.ndarray, cfg: PdcchConfig, noise_var: float = 0.01):
    """Loopback receive assuming an ideal channel (tests/UE-side)."""
    data_pos, _, _ = _candidate_re_plan(cfg.coreset, cfg.cce_index,
                                        cfg.aggregation_level)
    syms = grid[0, jnp.asarray(data_pos[:, 0]), jnp.asarray(data_pos[:, 1])]
    nv = jnp.full(syms.shape, noise_var, dtype=jnp.float32)
    llr = demodulate(syms[None], nv[None], "qpsk")
    c_init = ((cfg.n_rnti << 16) + cfg.n_id_data) % (1 << 31)
    llr = descramble_llrs(llr, c_init)[0]
    return decode_dci(llr, cfg)
