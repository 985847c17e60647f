"""SSB / PBCH transmit chain (TS38.211 §7.4, TS38.212 §7.1).

TPU-native analogue of the reference's ssb_processor_impl + pbch_encoder +
pbch_modulator + pss/sss/dmrs_pbch processors
(lib/phy/upper/channel_processors/ssb/ssb_processor_impl.h:35-58,
pbch_encoder.h:33-62: A=32, first scrambling + CRC24C + polar(nmax=9)
E=864 -> 432 QPSK symbols; PSS/SSS m-sequences per TS38.211 §7.4.2).

The whole SS/PBCH block (4 symbols x 240 subcarriers) is produced as one
dense [4, 240] complex64 patch plus the (symbol, subcarrier) anchor, so the
slot program scatters it into the cell resource grid in one op.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import polar as polar_ops
from ...ops.crc import crc
from ...ops.gold import gold_sequence_np
from ...ran import polar_params

SSB_NSYMB = 4
SSB_NSC = 240
PBCH_A = 32
PBCH_B = 56          # A + CRC24
PBCH_E = 864
PBCH_MBIT = 864      # data bits per PBCH
PBCH_NDATA = 432     # QPSK symbols

# TS38.212 Table 7.1.1-1: PBCH payload interleaver pattern G(j).
_G = [16, 23, 18, 17, 8, 30, 10, 6, 24, 7, 0, 5, 3, 2, 1, 4,
      9, 11, 12, 13, 14, 15, 19, 20, 21, 22, 25, 26, 27, 28, 29, 31]


@dataclasses.dataclass(frozen=True)
class SsbConfig:
    """Static SSB configuration (mirror of fapi dl_ssb_pdu fields)."""

    phys_cell_id: int          # N_ID_cell
    ssb_idx: int               # block index (0..L_max-1)
    l_max: int                 # 4, 8 or 64
    hrf: bool = False          # half-radio-frame bit
    sfn: int = 0
    k_ssb: int = 0             # subcarrier offset (only bit 4 enters payload)
    beta_pss_db: float = 0.0   # PSS power offset (0 or 3 dB)
    # grid anchor: first symbol in slot, first subcarrier of the 240-SC block
    first_symbol: int = 0
    first_subcarrier: int = 0


# ------------------------------------------------------------- PSS / SSS

@functools.lru_cache(maxsize=None)
def _mseq(taps: tuple, init: tuple, length: int = 127) -> np.ndarray:
    """Binary m-sequence x(n+7) = sum of x(n+t) for t in taps."""
    x = np.zeros(length + 7, dtype=np.uint8)
    for i, b in enumerate(init):
        x[i] = b
    for i in range(length):
        acc = 0
        for t in taps:
            acc ^= x[i + t]
        x[i + 7] = acc
    return x


def pss_sequence(n_id2: int) -> np.ndarray:
    """TS38.211 §7.4.2.2: d(n) = 1 - 2 x((n + 43 N_ID2) mod 127)."""
    x = _mseq((0, 4), (0, 1, 1, 0, 1, 1, 1))
    m = (np.arange(127) + 43 * n_id2) % 127
    return (1.0 - 2.0 * x[m]).astype(np.float32)


def sss_sequence(n_id1: int, n_id2: int) -> np.ndarray:
    """TS38.211 §7.4.2.3."""
    x0 = _mseq((0, 4), (1, 0, 0, 0, 0, 0, 0))
    x1 = _mseq((0, 1), (1, 0, 0, 0, 0, 0, 0))
    m0 = 15 * (n_id1 // 112) + 5 * n_id2
    m1 = n_id1 % 112
    n = np.arange(127)
    return ((1.0 - 2.0 * x0[(n + m0) % 127]) *
            (1.0 - 2.0 * x1[(n + m1) % 127])).astype(np.float32)


# ------------------------------------------------------------ PBCH coding

def _i_ssb_bar(cfg: SsbConfig) -> int:
    if cfg.l_max == 4:
        return (cfg.ssb_idx & 0b11) + (4 if cfg.hrf else 0)
    return cfg.ssb_idx & 0b111


@functools.lru_cache(maxsize=None)
def _payload_maps(sfn: int, hrf: bool, ssb_idx: int, l_max: int, k_ssb: int):
    """(mib_dest [24] scatter positions, static_bits [32] with timing bits)."""
    dest = np.zeros(24, dtype=np.int32)
    j_sfn, j_other = 0, 14
    for i in range(24):
        if 1 <= i < 7:                       # SFN payload bits
            dest[i] = _G[j_sfn]
            j_sfn += 1
        else:
            dest[i] = _G[j_other]
            j_other += 1
    static = np.zeros(PBCH_A, dtype=np.int8)
    for shift in (3, 2, 1, 0):               # 4th..1st LSB of SFN
        static[_G[j_sfn]] = (sfn >> shift) & 1
        j_sfn += 1
    static[_G[10]] = 1 if hrf else 0
    if l_max == 64:
        static[_G[11]] = (ssb_idx >> 5) & 1
        static[_G[12]] = (ssb_idx >> 4) & 1
        static[_G[13]] = (ssb_idx >> 3) & 1
    else:
        static[_G[11]] = (k_ssb >> 4) & 1
    return dest, static


def pbch_payload(cfg: SsbConfig, mib24, static_bits=None) -> jnp.ndarray:
    """TS38.212 §7.1.1: interleave the 24 MIB bits + 8 timing bits into a[32].

    Traceable: the MIB bits may be a jax array.  ``static_bits`` (the timing
    bits, from slot_ctx_for) may be a traced [32] array so the jit key does
    not depend on the SFN.
    """
    dest, static = _payload_maps(cfg.sfn, cfg.hrf, cfg.ssb_idx, cfg.l_max,
                                 cfg.k_ssb)
    a = jnp.asarray(static) if static_bits is None else jnp.asarray(static_bits)
    return a.at[jnp.asarray(dest)].set(jnp.asarray(mib24).astype(jnp.int8))


def slot_ctx_for(cfg: SsbConfig, sfn: int | None = None,
                 hrf: bool | None = None):
    """Host-side slot-varying SSB inputs: (static_bits[32], scramble_mask[32]).

    Pass these as traced inputs to keep the compiled SSB program independent
    of the SFN / half-frame."""
    sfn = cfg.sfn if sfn is None else sfn
    hrf = cfg.hrf if hrf is None else hrf
    _, static = _payload_maps(sfn, hrf, cfg.ssb_idx, cfg.l_max, cfg.k_ssb)
    mask = _scramble_mask(cfg.phys_cell_id, sfn, cfg.l_max)
    return static, mask


@functools.lru_cache(maxsize=None)
def _scramble_mask(phys_cell_id: int, sfn: int, l_max: int) -> np.ndarray:
    """The §7.1.2 scrambling bits s[32] (0 at pass-through positions)."""
    m = PBCH_A - 6 if l_max == 64 else PBCH_A - 3
    v = 2 * ((sfn >> 2) & 1) + ((sfn >> 1) & 1)
    seq = gold_sequence_np(phys_cell_id, PBCH_A, advance=m * v)
    sfn_2nd = _G[8]    # j_sfn order: G[6..9] = 4th..1st LSB of SFN
    sfn_3rd = _G[7]
    ssb_bits = {_G[11], _G[12], _G[13]} if l_max == 64 else set()
    mask = np.zeros(PBCH_A, dtype=np.int8)
    j = 0
    for i in range(PBCH_A):
        skip = i in ssb_bits or i == _G[10] or i == sfn_2nd or i == sfn_3rd
        if not skip:
            mask[i] = seq[j]
            j += 1
    return mask


def pbch_scramble_payload(a, cfg: SsbConfig, mask=None):
    """TS38.212 §7.1.2 first scrambling (timing bits pass through).

    Involutive; traceable (works on numpy or jax arrays; ``mask`` may be a
    traced [32] array from slot_ctx_for).
    """
    if mask is None:
        mask = _scramble_mask(cfg.phys_cell_id, cfg.sfn, cfg.l_max)
    if isinstance(a, np.ndarray) and isinstance(mask, np.ndarray):
        return a ^ mask
    return (jnp.asarray(a).astype(jnp.int8) ^ jnp.asarray(mask).astype(jnp.int8))


@functools.lru_cache(maxsize=None)
def _pbch_code() -> polar_params.PolarCode:
    return polar_params.polar_code(PBCH_B, PBCH_E, nmax=9, ibil=False)


def pbch_encode(cfg: SsbConfig, mib24, slot_ctx=None) -> jnp.ndarray:
    """Full §7.1 chain -> rate-matched bits int8 [E=864].  Traceable.

    slot_ctx: optional (static_bits, scramble_mask) traced pair from
    slot_ctx_for — removes the SFN from the jit key.
    """
    static_bits, mask = slot_ctx if slot_ctx is not None else (None, None)
    a = pbch_payload(cfg, mib24, static_bits)
    a_prime = pbch_scramble_payload(a, cfg, mask)
    bits = jnp.asarray(a_prime)[None]
    c = jnp.concatenate([bits, crc(bits, "crc24C")], axis=-1)   # [1, 56]
    code = _pbch_code()
    u = polar_ops.allocate(c, code)
    d = polar_ops.encode(u, code.n)
    return polar_ops.rate_match(d, code)[0]


def pbch_modulate(encoded: jnp.ndarray, cfg: SsbConfig) -> jnp.ndarray:
    """TS38.211 §7.3.3: second scrambling + QPSK -> complex64 [432]."""
    from ...ops.modulation import modulate
    from ...ops.scrambling import scramble_bits
    if cfg.l_max == 4:
        v = cfg.ssb_idx & 0b11
    else:
        v = cfg.ssb_idx & 0b111
    b = scramble_bits(encoded[None], cfg.phys_cell_id, advance=v * PBCH_MBIT)
    return modulate(b, "qpsk")[0]


def pbch_dmrs(cfg: SsbConfig) -> jnp.ndarray:
    """TS38.211 §7.4.1.4: 144 QPSK pilots."""
    from ...ops.modulation import modulate
    ibar = _i_ssb_bar(cfg)
    nid = cfg.phys_cell_id
    c_init = ((1 << 11) * (ibar + 1) * (nid // 4 + 1) + (1 << 6) * (ibar + 1)
              + (nid % 4)) % (1 << 31)
    bits = jnp.asarray(gold_sequence_np(c_init, 2 * 144)[None].astype(np.int8))
    return modulate(bits, "qpsk")[0]


# ---------------------------------------------------- fused PBCH (one matmul)

@functools.lru_cache(maxsize=None)
def _fused_pbch_maps(cfg: SsbConfig):
    """Host GF(2) maps collapsing the whole §7.1 PBCH chain to one matmul.

    Payload interleave, first scrambling, CRC24C attach, polar allocate +
    encode + rate match, and second scrambling are all linear/affine over
    GF(2), so e[864] = mib @ M_mib  ^  s @ M_apr  ^  g, where s = the slot
    timing bits XOR the first-scrambling mask (traced via slot_ctx_for) and
    g is the static §7.3.3 scrambling word.  Returns (M_mib [24,864],
    M_apr [32,864], g [864]).
    """
    from ...ops.gf2 import gf2_matmul
    from ...ops.crc import _remainder_matrix

    dest, _ = _payload_maps(cfg.sfn, cfg.hrf, cfg.ssb_idx, cfg.l_max,
                            cfg.k_ssb)
    m_enc = polar_ops.encode_matrix(_pbch_code())                 # [56, 864]
    crc_m = _remainder_matrix("crc24C", PBCH_A).astype(np.uint8)  # [32, 24]
    m_c = np.concatenate([np.eye(PBCH_A, dtype=np.uint8), crc_m], axis=1)
    m_apr = gf2_matmul(m_c, m_enc).astype(np.uint8)               # [32, 864]
    scatter = np.zeros((24, PBCH_A), dtype=np.uint8)
    scatter[np.arange(24), dest] = 1
    m_mib = gf2_matmul(scatter, m_apr).astype(np.uint8)           # [24, 864]
    v = cfg.ssb_idx & (0b11 if cfg.l_max == 4 else 0b111)
    g = gold_sequence_np(cfg.phys_cell_id, PBCH_MBIT,
                         advance=v * PBCH_MBIT).astype(np.uint8)
    return m_mib, m_apr, g


@functools.lru_cache(maxsize=None)
def _ssb_base_patch(cfg: SsbConfig):
    """Host-constant [4, 240] patch with PSS/SSS/DM-RS prefilled, and the
    PBCH data RE positions (all static per SSB config)."""
    patch = np.zeros((SSB_NSYMB, SSB_NSC), dtype=np.complex64)
    beta_pss = 10.0 ** (cfg.beta_pss_db / 20.0)
    patch[0, 56:183] = pss_sequence(cfg.phys_cell_id % 3) * beta_pss
    patch[2, 56:183] = sss_sequence(cfg.phys_cell_id // 3,
                                    cfg.phys_cell_id % 3)
    dmrs_pos, data_pos = _ssb_re_maps(cfg.phys_cell_id % 4)
    ibar = _i_ssb_bar(cfg)
    nid = cfg.phys_cell_id
    c_init = ((1 << 11) * (ibar + 1) * (nid // 4 + 1)
              + (1 << 6) * (ibar + 1) + (nid % 4)) % (1 << 31)
    b = gold_sequence_np(c_init, 2 * 144).astype(np.float32)
    dm = ((1 - 2 * b[0::2]) + 1j * (1 - 2 * b[1::2])) / np.sqrt(2)
    patch[dmrs_pos[:, 0], dmrs_pos[:, 1]] = dm.astype(np.complex64)
    return patch, data_pos


# ------------------------------------------------------------- SSB mapping

@functools.lru_cache(maxsize=None)
def _ssb_re_maps(v: int):
    """(dmrs_positions [144, 2], data_positions [432, 2]) as (symbol, sc)."""
    dmrs, data = [], []
    for l in (1, 2, 3):
        if l == 2:
            scs = list(range(0, 48)) + list(range(192, 240))
        else:
            scs = list(range(240))
        for sc in scs:
            if sc % 4 == v:
                dmrs.append((l, sc))
            else:
                data.append((l, sc))
    return (np.array(dmrs, dtype=np.int32), np.array(data, dtype=np.int32))


def ssb_block(cfg: SsbConfig, mib24, slot_ctx=None) -> jnp.ndarray:
    """Produce the dense [4, 240] SSB patch (amplitudes per TS38.213 SSS ref).

    Fused TPU path: PSS/SSS/DM-RS are a host-constant base patch; the whole
    PBCH bit chain is one GF(2) matmul (see _fused_pbch_maps) + QPSK + one
    scatter — versus the reference's six-stage pbch_encoder/modulator
    pipeline.  tests/test_ssb.py asserts equality with the step-by-step
    chain (pbch_encode/pbch_modulate).
    """
    m_mib, m_apr, g = _fused_pbch_maps(cfg)
    base, data_pos = _ssb_base_patch(cfg)
    mib = jnp.asarray(mib24).astype(jnp.int8)
    if slot_ctx is None:
        _, static = _payload_maps(cfg.sfn, cfg.hrf, cfg.ssb_idx, cfg.l_max,
                                  cfg.k_ssb)
        mask = _scramble_mask(cfg.phys_cell_id, cfg.sfn, cfg.l_max)
        s_np = (static.astype(np.uint8) ^ mask.astype(np.uint8))
        const = ((s_np.astype(np.uint32) @ m_apr.astype(np.uint32)) & 1) ^ g
        acc = jnp.matmul(mib, jnp.asarray(m_mib.astype(np.int8)),
                         preferred_element_type=jnp.int32)
        bits = (acc + jnp.asarray(const.astype(np.int32))) & 1
    else:
        static_t, mask_t = slot_ctx
        s = (jnp.asarray(static_t).astype(jnp.int8)
             ^ jnp.asarray(mask_t).astype(jnp.int8))
        v = jnp.concatenate([mib, s])                            # [56]
        m_full = np.concatenate([m_mib, m_apr], axis=0).astype(np.int8)
        acc = jnp.matmul(v, jnp.asarray(m_full),
                         preferred_element_type=jnp.int32)
        bits = (acc + jnp.asarray(g.astype(np.int32))) & 1
    re = 1.0 - 2.0 * bits[0::2].astype(jnp.float32)
    im = 1.0 - 2.0 * bits[1::2].astype(jnp.float32)
    data = jax.lax.complex(re, im) * np.float32(1.0 / np.sqrt(2.0))
    patch = jnp.asarray(base)
    return patch.at[jnp.asarray(data_pos[:, 0]),
                    jnp.asarray(data_pos[:, 1])].set(data)


def map_ssb_to_grid(grid: jnp.ndarray, cfg: SsbConfig, mib24,
                    slot_ctx=None) -> jnp.ndarray:
    """Scatter the SSB patch into a [..., nsymb, nsc] slot grid."""
    patch = ssb_block(cfg, mib24, slot_ctx)
    l0, k0 = cfg.first_symbol, cfg.first_subcarrier
    return grid.at[..., l0:l0 + SSB_NSYMB, k0:k0 + SSB_NSC].add(patch)


# ----------------------------------------------------- PBCH receive (test/UE)

def pbch_decode(patch: jnp.ndarray, cfg: SsbConfig, noise_var: float = 0.01):
    """Closed-loop PBCH receiver from a received [4, 240] SSB patch.

    Returns (payload_a int8 [32], crc_ok bool).  Assumes an ideal channel
    (used by the loopback tests; the full UE-side estimator is not a gNB
    component in the reference either).
    """
    from ...ops.modulation import demodulate
    from ...ops.scrambling import descramble_llrs

    _, data_pos = _ssb_re_maps(cfg.phys_cell_id % 4)
    syms = patch[jnp.asarray(data_pos[:, 0]), jnp.asarray(data_pos[:, 1])]
    nv = jnp.full(syms.shape, noise_var, dtype=jnp.float32)
    llr = demodulate(syms[None], nv[None], "qpsk")
    v = cfg.ssb_idx & (0b11 if cfg.l_max == 4 else 0b111)
    llr = descramble_llrs(llr, cfg.phys_cell_id, advance=v * PBCH_MBIT)
    code = _pbch_code()
    lm = polar_ops.rate_dematch(llr, code)
    dec = polar_ops.sc_decode(lm, code)[0]          # [56] = a' + crc
    from ...ops.crc import crc_check
    ok = crc_check(dec[None], "crc24C")[0]
    a_prime = np.asarray(dec[:PBCH_A])
    a = pbch_scramble_payload(a_prime, cfg)          # scrambling is involutive
    return jnp.asarray(a), ok


def pbch_extract_mib(a: np.ndarray, cfg: SsbConfig) -> np.ndarray:
    """Invert the §7.1.1 payload interleaver -> 24 MIB bits."""
    a = np.asarray(a)
    dest, _ = _payload_maps(cfg.sfn, cfg.hrf, cfg.ssb_idx, cfg.l_max, cfg.k_ssb)
    return a[dest].astype(np.int8)
