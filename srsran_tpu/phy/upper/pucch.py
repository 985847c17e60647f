"""PUCCH receive processors: formats 0, 1 and 2 (TS38.211 §6.3.2).

TPU-native analogue of pucch_processor_impl + pucch_detector_format0/1 +
pucch_demodulator_format2 (lib/phy/upper/channel_processors/pucch/):

- F0: sequence detection — correlate against all candidate cyclic shifts
  (one [shifts x 12] matmul per symbol) and compare to a noise reference.
- F1: time-OCC despreading of DM-RS and data symbols, per-hop channel
  estimate, coherent combining, BPSK/QPSK decision (batch-friendly over
  all multiplexed users of a PRB, mirroring the batch API of
  pucch_processor.h:196-217).
- F2: DM-RS channel estimate (comb-3) -> equalize -> QPSK demap ->
  descramble -> short-block / polar UCI decode.

Cyclic-shift hopping n_cs(ns, l) follows TS38.211 §6.3.2.2.2 with the
PUCCH hopping identity.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.gold import gold_sequence_np
from ...ops.low_papr import base_sequence
from ...ops.modulation import demodulate
from ...ops.scrambling import descramble_llrs
from ...ops import short_block, polar as polar_ops
from ...ops.crc import crc_check
from ...ran import polar_params


# ------------------------------------------------------------ common helpers

@functools.lru_cache(maxsize=None)
def _ncs_table(n_id: int, slot: int) -> np.ndarray:
    """n_cs(ns, l) for all 14 symbols (TS38.211 §6.3.2.2.2)."""
    seq = gold_sequence_np(n_id, 8 * 14, advance=8 * 14 * slot)
    out = np.zeros(14, dtype=np.int64)
    for l in range(14):
        bits = seq[8 * l: 8 * l + 8]
        out[l] = int(sum(int(b) << m for m, b in enumerate(bits)))
    return out


def ncs_for(n_id: int, slot: int) -> np.ndarray:
    """Host-side n_cs(ns, l) [14] — pass as a traced input so compiled PUCCH
    programs are slot-independent."""
    return _ncs_table(n_id, slot).copy()


def _alpha(m0: int, m_cs: int, n_id: int, slot: int, symbol: int) -> float:
    ncs = _ncs_table(n_id, slot)[symbol]
    return 2 * np.pi / 12 * ((m0 + m_cs + ncs) % 12)


def _f01_sequence(n_id: int, slot: int, symbol: int, m0: int,
                  m_cs: int = 0, ncs_val=None):
    """Length-12 base sequence with cyclic shift; ``ncs_val`` may be traced."""
    u, v = n_id % 30, 0
    if ncs_val is None:
        alpha = _alpha(m0, m_cs, n_id, slot, symbol)
        n = np.arange(12)
        return (np.exp(1j * alpha * n) * base_sequence(u, v, 12)).astype(np.complex64)
    alpha = 2 * jnp.pi / 12 * ((m0 + m_cs + ncs_val) % 12)
    n = jnp.arange(12)
    return jnp.exp(1j * alpha.astype(jnp.float32) * n) * jnp.asarray(
        base_sequence(u, v, 12))


# ----------------------------------------------------------------- Format 0

@dataclasses.dataclass(frozen=True)
class PucchF0Config:
    prb: int                  # absolute PRB index
    start_symbol: int
    nof_symbols: int          # 1 or 2
    initial_cyclic_shift: int  # m0
    n_id: int                 # hopping id
    slot: int = 0
    nof_harq_bits: int = 1    # 0..2
    sr_opportunity: bool = False
    second_hop_prb: int | None = None  # PRB of symbol 1 with intra-slot hopping


# TS38.213 §9.2.3/9.2.4/9.2.5 cyclic-shift dictionaries: (m_cs, sr, harq)
# per (nof_harq_bits, sr_opportunity) — mirror of the tables at
# pucch_detector_format0.cpp:45-66.
_F0_TABLES = {
    (0, True): ((0, 1, ()),),
    (1, False): ((0, None, (0,)), (6, None, (1,))),
    (2, False): ((0, None, (0, 0)), (3, None, (0, 1)),
                 (6, None, (1, 1)), (9, None, (1, 0))),
    (1, True): ((0, 0, (0,)), (6, 0, (1,)), (3, 1, (0,)), (9, 1, (1,))),
    (2, True): ((0, 0, (0, 0)), (3, 0, (0, 1)), (6, 0, (1, 1)),
                (9, 0, (1, 0)), (1, 1, (0, 0)), (4, 1, (0, 1)),
                (7, 1, (1, 1)), (10, 1, (1, 0))),
}


def f0_refs_for(cfg: PucchF0Config, slot: int | None = None) -> np.ndarray:
    """Host-side candidate reference sequences [C, S, 12] complex64 —
    preferred traced input for detect_format0 (replaces device trig)."""
    table = _F0_TABLES[(cfg.nof_harq_bits, cfg.sr_opportunity)]
    mcs = np.array([m for m, _, _ in table])
    n = np.arange(12)
    base = base_sequence(cfg.n_id % 30, 0, 12)
    sl = cfg.slot if slot is None else slot
    ncs_v = _ncs_table(cfg.n_id, sl)[
        cfg.start_symbol: cfg.start_symbol + cfg.nof_symbols]
    alpha = 2 * np.pi / 12 * ((cfg.initial_cyclic_shift
                               + mcs[:, None] + ncs_v[None, :]) % 12)
    return (np.exp(1j * alpha[..., None] * n) * base).astype(np.complex64)


def detect_format0(grid: jnp.ndarray, cfg: PucchF0Config,
                   threshold: float = 4.0, ncs=None):
    """Detect HARQ/SR on PUCCH F0 (pucch_detector_format0.cpp:118-235).

    grid: [P, nsym, nsc].  Candidate m_cs dictionaries follow TS38.213
    §9.2.3-9.2.5 including combined HARQ+SR signalling; with intra-slot
    frequency hopping the second symbol is read from second_hop_prb.
    Returns dict with detected flag, HARQ bits, SR bit and metric.
    """
    if (cfg.nof_harq_bits, cfg.sr_opportunity) not in _F0_TABLES:
        raise ValueError(
            "pucch_f0: nof_harq_bits=0 requires sr_opportunity=True "
            "(an F0 occasion must carry HARQ bits, SR, or both)")
    table = _F0_TABLES[(cfg.nof_harq_bits, cfg.sr_opportunity)]
    nports = grid.shape[0]
    # Gather the occasion REs as static slices: [P, nsym, 12].
    rows = []
    for s in range(cfg.nof_symbols):
        l = cfg.start_symbol + s
        prb = (cfg.second_hop_prb
               if s > 0 and cfg.second_hop_prb is not None else cfg.prb)
        rows.append(grid[0:nports, l:l + 1, prb * 12:prb * 12 + 12])
    rx = jnp.concatenate(rows, axis=1)                           # [P, S, 12]
    # Reference sequences for all candidate m_cs at once: [C, S, 12].
    mcs = np.array([m for m, _, _ in table])
    n = np.arange(12)
    base = base_sequence(cfg.n_id % 30, 0, 12)
    if ncs is not None and jnp.issubdtype(
            getattr(ncs, "dtype", jnp.uint32), jnp.complexfloating):
        refs = jnp.asarray(ncs)            # host-built (f0_refs_for)
    elif ncs is None:
        ncs_v = _ncs_table(cfg.n_id, cfg.slot)[
            cfg.start_symbol: cfg.start_symbol + cfg.nof_symbols]
        alpha = 2 * np.pi / 12 * ((cfg.initial_cyclic_shift
                                   + mcs[:, None] + ncs_v[None, :]) % 12)
        refs = jnp.asarray(
            (np.exp(1j * alpha[..., None] * n) * base).astype(np.complex64))
    else:
        ncs_v = jax.lax.slice(
            jnp.asarray(ncs), (cfg.start_symbol,),
            (cfg.start_symbol + cfg.nof_symbols,)).astype(jnp.float32)
        alpha = (2 * jnp.pi / 12) * jnp.mod(
            cfg.initial_cyclic_shift + jnp.asarray(mcs, jnp.float32)[:, None]
            + ncs_v[None, :], 12.0)
        phase = alpha[..., None] * jnp.asarray(n, jnp.float32)
        refs = (jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
                * jnp.asarray(base))
    t = jnp.einsum("psn,csn->cps", rx, jnp.conj(refs))
    corr = jnp.sum(jnp.abs(t) ** 2, axis=(1, 2)) / 12.0          # [C]
    energy = jnp.sum(jnp.abs(rx) ** 2)
    noise = jnp.maximum(energy - jnp.max(corr), 1e-9) / 12.0
    metric = corr / noise
    best = jnp.argmax(metric)
    detected = metric[best] > threshold
    harq_map = np.array([h for _, _, h in table], dtype=np.int8).reshape(
        len(table), cfg.nof_harq_bits)
    harq = jnp.asarray(harq_map)[best]
    sr_vals = [s if s is not None else 0 for _, s, _ in table]
    sr = jnp.asarray(np.array(sr_vals, dtype=np.int8))[best]
    return {"detected": detected, "metric": metric[best], "harq_bits": harq,
            "sr_bit": sr, "best_mcs_index": best}


# ----------------------------------------------------------------- Format 1

@dataclasses.dataclass(frozen=True)
class PucchF1Config:
    prb: int
    start_symbol: int
    nof_symbols: int          # 4..14
    initial_cyclic_shift: int
    time_domain_occ: int
    n_id: int
    slot: int = 0
    nof_harq_bits: int = 1    # 1 or 2
    second_hop_prb: int | None = None  # intra-slot frequency hopping


def _occ(idx: int, length: int) -> np.ndarray:
    m = np.arange(length)
    return np.exp(2j * np.pi * idx * m / length).astype(np.complex64)


def _f1_hops(cfg: PucchF1Config):
    """[(prb, first_rel_symbol, nof_symbols)] — one hop, or two with
    intra-slot frequency hopping (hop 0 = first floor(N/2) symbols,
    pucch_detector_format1.cpp:172-192)."""
    if cfg.second_hop_prb is None:
        return ((cfg.prb, 0, cfg.nof_symbols),)
    n0 = cfg.nof_symbols // 2
    return ((cfg.prb, 0, n0), (cfg.second_hop_prb, n0, cfg.nof_symbols - n0))


def detect_format1(grid: jnp.ndarray, cfg: PucchF1Config,
                   threshold: float = 1.5, ncs=None):
    """Despread + coherently combine + decide (pucch_detector_format1.h:45-150).

    With intra-slot frequency hopping each hop gets its own channel
    estimate and OCC spreading lengths (the OCC index must satisfy
    occ < nof_symbols/4, pucch_detector_format1.cpp:91); per-hop matched
    filter contributions are summed like the reference's
    hop_contribution_common/mux accumulation (:172-231).
    """
    assert cfg.time_domain_occ < cfg.nof_symbols // (
        4 if cfg.second_hop_prb is not None else 2), \
        "time-domain OCC index too large for the symbol count / hopping"
    z_all = []           # per-data-symbol matched-filter statistics
    h_energy = 0.0
    n_data_total = 0
    nports = grid.shape[0]
    n12 = np.arange(12)
    base = base_sequence(cfg.n_id % 30, 0, 12)
    for prb, s0, nsym in _f1_hops(cfg):
        l_lo = cfg.start_symbol + s0
        # DM-RS on even relative symbols of the WHOLE allocation
        rel = list(range(s0, s0 + nsym))
        dmrs_rel = [s for s in rel if s % 2 == 0]
        data_rel = [s for s in rel if s % 2 == 1]
        occ_dmrs = _occ(cfg.time_domain_occ, len(dmrs_rel))
        occ_data = _occ(cfg.time_domain_occ, max(len(data_rel), 1))
        # One static slice for the whole hop: [P, nsym, 12].
        rx = grid[0:nports, l_lo:l_lo + nsym, prb * 12:prb * 12 + 12]
        # Per-symbol cyclic-shifted base sequences, vectorized: [nsym, 12].
        if ncs is None:
            ncs_v = _ncs_table(cfg.n_id, cfg.slot)[l_lo: l_lo + nsym]
            alpha = 2 * np.pi / 12 * ((cfg.initial_cyclic_shift + ncs_v) % 12)
            refs = jnp.asarray(
                (np.exp(1j * alpha[:, None] * n12) * base).astype(np.complex64))
        else:
            ncs_v = jax.lax.slice(jnp.asarray(ncs), (l_lo,),
                                  (l_lo + nsym,)).astype(jnp.float32)
            alpha = (2 * jnp.pi / 12) * jnp.mod(
                cfg.initial_cyclic_shift + ncs_v, 12.0)
            phase = alpha[:, None] * jnp.asarray(n12, jnp.float32)
            refs = (jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
                    * jnp.asarray(base))
        despread = rx * jnp.conj(refs)[None]                 # [P, nsym, 12]
        # OCC weights as a per-symbol vector (0 on the other class).
        w_dm = np.zeros(nsym, dtype=np.complex64)
        w_dm[[s - s0 for s in dmrs_rel]] = np.conj(occ_dmrs)
        dm_acc = jnp.einsum("psn,s->pn", despread, jnp.asarray(w_dm))
        # Per-port wideband average over the PRB: a different-cyclic-shift
        # user appears as a phase ramp across subcarriers after
        # despreading, which the flat (1-PRB) average rejects — same as
        # the reference's per-hop channel averaging.
        h0 = jnp.mean(dm_acc, axis=-1) / max(len(dmrs_rel), 1)   # [P]
        h_energy = h_energy + 12.0 * jnp.sum(jnp.abs(h0) ** 2)
        # Matched filter per data symbol: other multiplexed users cancel
        # inside each subcarrier/OCC sum.
        z_sym = jnp.einsum("p,psn->s", jnp.conj(h0), despread)  # [nsym]
        if data_rel:
            idx = jnp.asarray(np.array([s - s0 for s in data_rel], np.int32))
            z_all.append(jnp.take(z_sym, idx)
                         * jnp.asarray(np.conj(occ_data).astype(np.complex64)))
        n_data_total += len(data_rel)
    z_s = jnp.concatenate(z_all)                             # [n_data_total]
    z_mean = jnp.mean(z_s)
    d_hat = z_mean / jnp.maximum(
        h_energy / (2 if cfg.second_hop_prb is not None else 1), 1e-12)
    var = jnp.mean(jnp.abs(z_s - z_mean) ** 2)
    metric = n_data_total * jnp.abs(z_mean) ** 2 / jnp.maximum(var, 1e-9)
    if cfg.nof_harq_bits == 1:
        bits = jnp.asarray([jnp.real(d_hat) < 0], dtype=jnp.int8)
    else:
        bits = jnp.asarray([jnp.real(d_hat) < 0, jnp.imag(d_hat) < 0],
                           dtype=jnp.int8)
    return {"detected": metric > threshold, "metric": metric,
            "harq_bits": bits, "symbol": d_hat}


def f1_batch_weights(common: PucchF1Config, users: tuple,
                     slot: int | None = None) -> tuple:
    """Host-side per-hop weight tensors for detect_format1_batch:
    ((a_dm [U,S,12], ph [U,S,12], w_da [U,S]), ...) complex64.

    Preferred traced input — the device program reduces to two einsums per
    hop with zero trig/sequence ops."""
    sl = common.slot if slot is None else slot
    n12 = np.arange(12)
    base = base_sequence(common.n_id % 30, 0, 12)
    m0s = np.array([u[0] for u in users], np.float32)
    out = []
    for prb, s0, nsym in _f1_hops(common):
        l_lo = common.start_symbol + s0
        rel = list(range(s0, s0 + nsym))
        dmrs_rel = [s for s in rel if s % 2 == 0]
        data_rel = [s for s in rel if s % 2 == 1]
        w_dm = np.zeros((len(users), nsym), np.complex64)
        w_da = np.zeros((len(users), nsym), np.complex64)
        for ui, (_, occ_i, _) in enumerate(users):
            od = _occ(occ_i, len(dmrs_rel))
            oa = _occ(occ_i, max(len(data_rel), 1))
            for i, s in enumerate(dmrs_rel):
                w_dm[ui, s - s0] = np.conj(od[i])
            for i, s in enumerate(data_rel):
                w_da[ui, s - s0] = np.conj(oa[i])
        ncs_v = _ncs_table(common.n_id, sl)[l_lo: l_lo + nsym]
        alpha = 2 * np.pi / 12 * ((m0s[:, None] + ncs_v[None]) % 12)
        # fold conj(base) in: the device applies these to the RAW rx slice
        ph = (np.exp(-1j * alpha[..., None] * n12)
              * np.conj(base)).astype(np.complex64)
        out.append(((ph * w_dm[..., None]).astype(np.complex64), ph, w_da))
    return tuple(out)


def detect_format1_batch(grid: jnp.ndarray, common: PucchF1Config,
                         users: tuple, threshold: float = 1.5, ncs=None):
    """Batch-detect all users multiplexed on one PRB (mirror of the
    reference's pucch_processor.h:196-217 batch API with format1_map).

    users: tuple of (initial_cyclic_shift, time_domain_occ, nof_harq_bits).
    TPU-native: the raw-base despread d0 = rx * conj(base) is shared; each
    user differs only by a cyclic-shift phase ramp and a time-OCC weight,
    so ALL users' statistics come out of two einsums with a [U, S, 12]
    weight tensor — the whole PRB's user set costs barely more than one
    user.  Returns a list of per-user result dicts in the order given.
    Equality with per-user detect_format1 is asserted in tests.
    """
    if not users:
        return []
    nports = grid.shape[0]
    u_count = len(users)
    n12 = np.arange(12)
    base = base_sequence(common.n_id % 30, 0, 12)
    # `ncs` may carry the host-built weight tuple from f1_batch_weights
    # (per-hop (a_dm, ph, w_da)) — the fast conductor path.
    weights = ncs if isinstance(ncs, (tuple, list)) else None
    # per-user accumulators across hops
    z_chunks = []                    # list of [U, n_data_hop]
    h_energy = jnp.zeros((u_count,), jnp.float32)
    n_data_total = 0
    for hop_i, (prb, s0, nsym) in enumerate(_f1_hops(common)):
        l_lo = common.start_symbol + s0
        rel = list(range(s0, s0 + nsym))
        dmrs_rel = [s for s in rel if s % 2 == 0]
        data_rel = [s for s in rel if s % 2 == 1]
        n_dm = max(len(dmrs_rel), 1)
        rx = grid[0:nports, l_lo:l_lo + nsym, prb * 12:prb * 12 + 12]
        if weights is not None:
            a_dm, ph_j, w_da = (jnp.asarray(w) for w in weights[hop_i])
            d0 = rx                    # conj(base) folded into the weights
        else:
            d0 = rx * jnp.conj(jnp.asarray(base))[None, None]  # [P, S, 12]
            # Per-user per-symbol conjugated reference phase + OCC weights.
            m0s = np.array([u[0] for u in users], np.float32)  # [U]
            w_dm = np.zeros((u_count, nsym), np.complex64)
            w_da = np.zeros((u_count, nsym), np.complex64)
            for ui, (_, occ_i, _) in enumerate(users):
                od = _occ(occ_i, len(dmrs_rel))
                oa = _occ(occ_i, max(len(data_rel), 1))
                for i, s in enumerate(dmrs_rel):
                    w_dm[ui, s - s0] = np.conj(od[i])
                for i, s in enumerate(data_rel):
                    w_da[ui, s - s0] = np.conj(oa[i])
            if ncs is None:
                ncs_v = _ncs_table(common.n_id, common.slot)[l_lo: l_lo + nsym]
                alpha = 2 * np.pi / 12 * ((m0s[:, None] + ncs_v[None]) % 12)
                ph = np.exp(-1j * alpha[..., None] * n12).astype(np.complex64)
                a_dm = jnp.asarray(ph * w_dm[..., None])     # [U, S, 12]
                ph_j = jnp.asarray(ph)
            else:
                ncs_v = jax.lax.slice(jnp.asarray(ncs), (l_lo,),
                                      (l_lo + nsym,)).astype(jnp.float32)
                alpha = (2 * jnp.pi / 12) * jnp.mod(
                    jnp.asarray(m0s)[:, None] + ncs_v[None], 12.0)
                phase = -alpha[..., None] * jnp.asarray(n12, jnp.float32)
                ph_j = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
                a_dm = ph_j * jnp.asarray(w_dm)[..., None]
            w_da = jnp.asarray(w_da)
        # Channel per user: h0[u, p] = mean_n sum_s d0 * phase * w_dm / n_dm
        dm = jnp.einsum("psn,usn->upn", d0, a_dm)
        h0 = jnp.mean(dm, axis=-1) / n_dm                    # [U, P]
        h_energy = h_energy + 12.0 * jnp.sum(jnp.abs(h0) ** 2, axis=-1)
        # Matched filter per data symbol (keep symbols separate for the
        # variance statistic): z[u, s] for data symbols.
        z_us = jnp.einsum("up,psn,usn->us", jnp.conj(h0), d0, ph_j)
        if data_rel:
            idx = jnp.asarray(np.array([s - s0 for s in data_rel], np.int32))
            z_chunks.append(jnp.take(z_us, idx, axis=1)
                            * jnp.take(w_da, idx, axis=1))
        n_data_total += len(data_rel)
    z_s = jnp.concatenate(z_chunks, axis=1)                  # [U, D]
    z_mean = jnp.mean(z_s, axis=1)                           # [U]
    nhops = 2 if common.second_hop_prb is not None else 1
    d_hat = z_mean / jnp.maximum(h_energy / nhops, 1e-12)
    var = jnp.mean(jnp.abs(z_s - z_mean[:, None]) ** 2, axis=1)
    metric = n_data_total * jnp.abs(z_mean) ** 2 / jnp.maximum(var, 1e-9)
    # one vectorized decision for ALL users; per-user dicts are views
    detected = metric > threshold                            # [U]
    bits_all = jnp.stack([jnp.real(d_hat) < 0,
                          jnp.imag(d_hat) < 0], axis=1).astype(jnp.int8)
    results = []
    for ui, (_, _, nbits) in enumerate(users):
        results.append({"detected": detected[ui], "metric": metric[ui],
                        "harq_bits": bits_all[ui, :nbits],
                        "symbol": d_hat[ui]})
    return results


def transmit_format1(grid: jnp.ndarray, cfg: PucchF1Config, bits) -> jnp.ndarray:
    """UE-side PUCCH F1 transmit into port 0 of a [P, nsym, nsc] grid.

    TS38.211 §6.3.2.4: BPSK/QPSK symbol d spread by the time OCC over data
    symbols; DM-RS symbols carry the OCC-weighted base sequence.  The exact
    counterpart of detect_format1 (used by the UE emulator to close the DL
    HARQ feedback loop, and by tests).
    """
    b = np.atleast_1d(np.asarray(bits)).astype(np.int8)
    if cfg.nof_harq_bits == 1:
        d = complex(1 - 2 * int(b[0]), 0)
    else:
        d = ((1 - 2 * int(b[0])) + 1j * (1 - 2 * int(b[1]))) / np.sqrt(2)
    base = base_sequence(cfg.n_id % 30, 0, 12)
    n12 = np.arange(12)
    for prb, s0, nsym in _f1_hops(cfg):
        l_lo = cfg.start_symbol + s0
        rel = list(range(s0, s0 + nsym))
        dmrs_rel = [s for s in rel if s % 2 == 0]
        data_rel = [s for s in rel if s % 2 == 1]
        occ_dmrs = _occ(cfg.time_domain_occ, len(dmrs_rel))
        occ_data = _occ(cfg.time_domain_occ, max(len(data_rel), 1))
        ncs_v = _ncs_table(cfg.n_id, cfg.slot)[l_lo: l_lo + nsym]
        alpha = 2 * np.pi / 12 * ((cfg.initial_cyclic_shift + ncs_v) % 12)
        refs = np.exp(1j * alpha[:, None] * n12) * base     # [nsym, 12]
        block = np.zeros((nsym, 12), dtype=np.complex64)
        for i, s in enumerate(dmrs_rel):
            block[s - s0] = refs[s - s0] * occ_dmrs[i]
        for i, s in enumerate(data_rel):
            block[s - s0] = refs[s - s0] * occ_data[i] * d
        grid = grid.at[0, l_lo:l_lo + nsym,
                       prb * 12:(prb + 1) * 12].add(jnp.asarray(block))
    return grid


# ----------------------------------------------------------------- Format 2

def _f2_polar_cfg(k: int, e: int):
    """F2 polar code parameters shared by transmit_format2 and
    process_format2 (the rule is load-bearing: TX and RX must agree)."""
    crc_len = 6 if k < 20 else 11
    return polar_params.polar_code(
        k + crc_len, e, nmax=10, ibil=True,
        n_pc=3 if k + crc_len <= 19 else 0), crc_len


def transmit_format2(grid: jnp.ndarray, cfg: "PucchF2Config",
                     bits) -> jnp.ndarray:
    """UE-side PUCCH F2 transmit into port 0 of a [P, nsym, nsc] grid.

    TS38.211 §6.3.2.5: UCI-encode -> scramble -> QPSK on the 8 data
    subcarriers per PRB (k%3 != 1), comb-3 DM-RS on k%3 == 1.  Exact
    counterpart of process_format2 (same codec configuration) — used by
    the UE emulator to close the CSI reporting loop.
    """
    from ...ops.scrambling import scramble_bits
    from ...ops.modulation import modulate
    from ...ops.gold import gold_sequence
    from ...ops.crc import crc
    b = jnp.asarray(np.atleast_1d(np.asarray(bits)).astype(np.int8))
    k = cfg.nof_uci_bits
    assert b.shape[-1] == k, f"F2 payload {b.shape[-1]} != {k} bits"
    e_tot = 16 * cfg.nof_rb * cfg.nof_symbols
    if k <= 11:
        enc = short_block.encode(b[None], e_tot, 2)[0]
    else:
        code, crc_len = _f2_polar_cfg(k, e_tot)
        with_crc = jnp.concatenate(
            [b[None], crc(b[None], f"crc{crc_len}")], axis=-1)
        u = polar_ops.allocate(with_crc, code)
        enc = polar_ops.rate_match(polar_ops.encode(u, code.n), code)[0]
    c_init = ((cfg.rnti << 15) + cfg.n_id) % (1 << 31)
    scr = scramble_bits(enc[None], c_init)
    syms = modulate(scr, "qpsk")[0]
    data_sc, dmrs_sc = [], []
    for rb in range(cfg.rb_start, cfg.rb_start + cfg.nof_rb):
        for kk in range(12):
            (dmrs_sc if kk % 3 == 1 else data_sc).append(rb * 12 + kk)
    data_sc = np.array(data_sc, np.int32)
    dmrs_sc = np.array(dmrs_sc, np.int32)
    n_data = len(data_sc)
    for s in range(cfg.nof_symbols):
        l = cfg.start_symbol + s
        grid = grid.at[0, l, jnp.asarray(data_sc)].add(
            syms[s * n_data:(s + 1) * n_data])
        ci = ((1 << 17) * (14 * cfg.slot + l + 1) * (2 * cfg.n_id0 + 1)
              + 2 * cfg.n_id0) % (1 << 31)
        pil_bits = gold_sequence(jnp.uint32(ci), 2 * len(dmrs_sc),
                                 advance=2 * 4 * cfg.rb_start)
        grid = grid.at[0, l, jnp.asarray(dmrs_sc)].add(
            modulate(pil_bits[None], "qpsk")[0])
    return grid


# ------------------------------------------------------------- Format 3 / 4

# TS38.211 Table 6.4.1.3.3.2-1: DM-RS symbol positions within the PUCCH
# (no frequency hopping, no additional DM-RS).
_F34_DMRS_POS = {4: (1,), 5: (0, 3), 6: (1, 4), 7: (1, 4), 8: (1, 5),
                 9: (1, 6), 10: (2, 7), 11: (2, 7), 12: (2, 8), 13: (2, 9),
                 14: (3, 10)}


@dataclasses.dataclass(frozen=True)
class PucchF3Config:
    """Format 3 (and 4 via occ_length>1): DFT-s-OFDM UCI carrier."""

    rb_start: int
    nof_rb: int                # F4: must be 1
    start_symbol: int
    nof_symbols: int           # 4..14
    rnti: int
    n_id: int                  # data scrambling
    n_id_hopping: int          # group hopping id for DM-RS sequences
    nof_uci_bits: int
    slot: int = 0
    pi2_bpsk: bool = False
    occ_length: int = 1        # 1 (F3) | 2 | 4 (F4)
    occ_index: int = 0


def _f3_dmrs_seq(cfg: PucchF3Config, l: int, ncs_val=None):
    """Low-PAPR DM-RS across the allocation for one symbol (ncs may be traced)."""
    u = cfg.n_id_hopping % 30
    m = cfg.nof_rb * 12
    if ncs_val is None:
        ncs = _ncs_table(cfg.n_id_hopping, cfg.slot)[l]
        alpha = 2 * np.pi / 12 * (ncs % 12)
        n = np.arange(m)
        return (np.exp(1j * alpha * n) * base_sequence(u, 0, m)).astype(np.complex64)
    alpha = 2 * jnp.pi / 12 * (ncs_val % 12)
    n = jnp.arange(m)
    return jnp.exp(1j * alpha.astype(jnp.float32) * n) * jnp.asarray(
        base_sequence(u, 0, m))


def _f3_symbol_split(cfg: PucchF3Config):
    dmrs_rel = _F34_DMRS_POS[cfg.nof_symbols]
    data_rel = tuple(s for s in range(cfg.nof_symbols) if s not in dmrs_rel)
    return dmrs_rel, data_rel


def f3_encode(uci_bits, cfg: PucchF3Config):
    """UE-side F3/F4 TX -> [nof_symbols, M] RE values (tests / UE emulation)."""
    from .uci import encode_uci
    from ...ops.modulation import modulate
    from ...ops.scrambling import scramble_bits
    from ...ops.transform_precode import precode as tp
    import jax.numpy as jnp

    m = cfg.nof_rb * 12
    dmrs_rel, data_rel = _f3_symbol_split(cfg)
    qm = 1 if cfg.pi2_bpsk else 2
    m_data = m // cfg.occ_length
    e = len(data_rel) * m_data * qm
    coded = encode_uci(jnp.asarray(uci_bits), e, qm)
    c_init = (cfg.rnti << 15) + cfg.n_id
    scr = scramble_bits(coded[None], c_init)
    syms = modulate(scr, "pi2bpsk" if cfg.pi2_bpsk else "qpsk")[0]
    out = jnp.zeros((cfg.nof_symbols, m), dtype=jnp.complex64)
    # F4 pre-DFT block spreading (TS38.211 §6.3.2.6.3)
    occ = np.exp(2j * np.pi * cfg.occ_index * np.arange(cfg.occ_length)
                 / cfg.occ_length).astype(np.complex64)
    for i, s in enumerate(data_rel):
        blk = syms[i * m_data:(i + 1) * m_data]
        if cfg.occ_length > 1:
            blk = jnp.concatenate([blk * occ[j] for j in range(cfg.occ_length)])
        out = out.at[s].set(tp(blk))
    for s in dmrs_rel:
        out = out.at[s].set(jnp.asarray(
            _f3_dmrs_seq(cfg, cfg.start_symbol + s)))
    return out


def f3_dmrs_values_for(cfg: PucchF3Config,
                       slot: int | None = None) -> np.ndarray:
    """Host-side F3/F4 DM-RS sequences [n_dmrs_symbols, M] complex64 in
    _f3_symbol_split order — preferred traced input for process_format3."""
    sl = cfg.slot if slot is None else slot
    dmrs_rel, _ = _f3_symbol_split(cfg)
    u = cfg.n_id_hopping % 30
    mlen = cfg.nof_rb * 12
    rows = []
    for s in dmrs_rel:
        l = cfg.start_symbol + s
        ncs_v = _ncs_table(cfg.n_id_hopping, sl)[l]
        alpha = 2 * np.pi / 12 * (ncs_v % 12)
        rows.append(np.exp(1j * alpha * np.arange(mlen))
                    * base_sequence(u, 0, mlen))
    return np.stack(rows, axis=0).astype(np.complex64)


def process_format3(grid: jnp.ndarray, cfg: PucchF3Config, ncs=None):
    """F3/F4 receive: estimate from DM-RS via the PORT CHANNEL ESTIMATOR
    (RC-filter smoothing + residual noise variance, the same operator as
    PUSCH — the reference runs formats 2-4 through
    port_channel_estimator_average_impl,
    lib/phy/upper/signal_processors/pucch/pucch_processor_impl.cpp),
    equalize, inverse transform precode, (de-spread,) demap, descramble,
    UCI decode."""
    from .uci import decode_uci
    from ...ops import channel_estimate as chest
    from ...ops.modulation import demodulate
    from ...ops.scrambling import descramble_llrs
    from ...ops.transform_precode import deprecode

    m = cfg.nof_rb * 12
    sc = jnp.arange(cfg.rb_start * 12, cfg.rb_start * 12 + m)
    dmrs_rel, data_rel = _f3_symbol_split(cfg)
    dmrs_vals = None
    if ncs is not None and jnp.issubdtype(
            getattr(ncs, "dtype", jnp.uint32), jnp.complexfloating):
        dmrs_vals, ncs = jnp.asarray(ncs), None   # f3_dmrs_values_for

    refs = []
    for si, s in enumerate(dmrs_rel):
        l = cfg.start_symbol + s
        if dmrs_vals is not None:
            refs.append(dmrs_vals[si])
        else:
            refs.append(jnp.asarray(
                _f3_dmrs_seq(cfg, l, None if ncs is None else ncs[l])))
    expected = jnp.stack(refs, axis=0)[None]                 # [1, Sd, M]
    rx_pil = jnp.stack([grid[:, cfg.start_symbol + s, sc]
                        for s in dmrs_rel], axis=1)          # [P, Sd, M]
    # contiguous pilots (stride 1): the full-rate CP-matched RC filter
    est = chest.estimate(rx_pil, expected, np.arange(m), nof_sc=m,
                         nof_symbols=cfg.nof_symbols, scs_hz=30e3,
                         stride=1, smoothing="filter", estimate_cfo=False)
    h_use = est.coeffs[:, 0, 0]                              # [P, M]
    noise = jnp.mean(est.noise_var)

    qm = 1 if cfg.pi2_bpsk else 2
    m_data = m // cfg.occ_length
    occ = np.exp(2j * np.pi * cfg.occ_index * np.arange(cfg.occ_length)
                 / cfg.occ_length).astype(np.complex64)
    llr_parts = []
    for s in data_rel:
        l = cfg.start_symbol + s
        rx = grid[:, l, sc]
        corr = jnp.sum(jnp.conj(h_use) * rx, axis=0)
        energy = jnp.sum(jnp.abs(h_use) ** 2, axis=0)
        # MMSE loading (the reference's channel_equalizer MMSE mode): on a
        # DFT-s-OFDM carrier, per-subcarrier ZF blows up noise at channel
        # notches and the IDFT spreads it over every symbol
        eq = corr / (energy + noise)
        nv = noise / jnp.maximum(jnp.mean(energy), 1e-12)
        x = deprecode(eq)
        if cfg.occ_length > 1:
            blocks = x.reshape(cfg.occ_length, m_data)
            x = jnp.sum(blocks * jnp.conj(jnp.asarray(occ))[:, None],
                        axis=0) / cfg.occ_length
        nvv = jnp.full(x.shape, nv, dtype=jnp.float32)
        llr_parts.append(demodulate(
            x[None], nvv[None], "pi2bpsk" if cfg.pi2_bpsk else "qpsk")[0])
    llr = jnp.concatenate(llr_parts)
    c_init = (cfg.rnti << 15) + cfg.n_id
    llr = descramble_llrs(llr[None], c_init)[0]
    bits, ok, metric = decode_uci(llr, cfg.nof_uci_bits, qm)
    return {"uci_bits": bits, "valid": ok, "metric": metric}


@dataclasses.dataclass(frozen=True)
class PucchF2Config:
    rb_start: int
    nof_rb: int
    start_symbol: int
    nof_symbols: int          # 1 or 2
    rnti: int
    n_id: int                 # scrambling (data)
    n_id0: int                # DM-RS scrambling
    nof_uci_bits: int
    slot: int = 0


def f2_dmrs_cinits(cfg: PucchF2Config, slot: int | None = None):
    """Host-side DM-RS c_init per symbol (uint32 [nof_symbols])."""
    sl = cfg.slot if slot is None else slot
    return np.array(
        [((1 << 17) * (14 * sl + cfg.start_symbol + s + 1) * (2 * cfg.n_id0 + 1)
          + 2 * cfg.n_id0) % (1 << 31) for s in range(cfg.nof_symbols)],
        dtype=np.uint32)


def f2_pilot_values_for(cfg: PucchF2Config,
                        slot: int | None = None) -> np.ndarray:
    """Host-side F2 DM-RS pilot VALUES [nof_symbols, 4*nof_rb] complex64 —
    preferred traced input for process_format2."""
    from ...ops.gold import gold_sequence_np
    from ...ops.modulation import qpsk_np
    cis = f2_dmrs_cinits(cfg, slot)
    npil = 4 * cfg.nof_rb
    adv = 2 * 4 * cfg.rb_start
    return np.stack([
        qpsk_np(gold_sequence_np(int(ci), 2 * npil, advance=adv))
        for ci in cis], axis=0).astype(np.complex64)


def process_format2(grid: jnp.ndarray, cfg: PucchF2Config, dmrs_cinits=None):
    """Estimate comb-3 DM-RS via the PORT CHANNEL ESTIMATOR (the reference
    runs formats 2-4 through port_channel_estimator_average_impl,
    lib/phy/upper/signal_processors/pucch/), equalize, demap, descramble,
    UCI-decode."""
    from ...ops import channel_estimate as chest
    pilot_vals = None
    if dmrs_cinits is not None and jnp.issubdtype(
            getattr(dmrs_cinits, "dtype", jnp.uint32), jnp.complexfloating):
        pilot_vals, dmrs_cinits = jnp.asarray(dmrs_cinits), None
    data_sc, dmrs_sc = [], []
    for rb in range(cfg.rb_start, cfg.rb_start + cfg.nof_rb):
        for k in range(12):
            (dmrs_sc if k % 3 == 1 else data_sc).append(rb * 12 + k)
    data_sc = np.array(data_sc, dtype=np.int32)
    dmrs_sc = np.array(dmrs_sc, dtype=np.int32)

    pilots_rows = []
    for s in range(cfg.nof_symbols):
        l = cfg.start_symbol + s
        if pilot_vals is not None:
            pilots_rows.append(pilot_vals[s])
            continue
        # DM-RS pilots: Gold c_init per TS38.211 §6.4.1.3.2.1 with n_id0
        if dmrs_cinits is None:
            c_init = ((1 << 17) * (14 * cfg.slot + l + 1)
                      * (2 * cfg.n_id0 + 1) + 2 * cfg.n_id0) % (1 << 31)
        else:
            c_init = dmrs_cinits[s]
        npil = 4 * cfg.nof_rb
        adv = 2 * 4 * cfg.rb_start
        from ...ops.gold import gold_sequence
        from ...ops.modulation import modulate
        bits = gold_sequence(c_init, 2 * npil, advance=adv)
        pilots_rows.append(modulate(bits[None], "qpsk")[0])
    expected = jnp.stack(pilots_rows, axis=0)[None]          # [1, S, npil]
    rx_pil = jnp.stack([grid[:, cfg.start_symbol + s, jnp.asarray(dmrs_sc)]
                        for s in range(cfg.nof_symbols)], axis=1)
    alloc0 = cfg.rb_start * 12
    est = chest.estimate(rx_pil, expected, dmrs_sc - alloc0,
                         nof_sc=12 * cfg.nof_rb,
                         nof_symbols=cfg.nof_symbols, scs_hz=30e3,
                         stride=3, smoothing="filter", estimate_cfo=False)
    h_full = est.coeffs[:, 0, 0]                             # [P, 12*nof_rb]
    h_data = h_full[:, jnp.asarray(data_sc - alloc0)]
    noise = jnp.mean(est.noise_var)

    llr_parts = []
    for s in range(cfg.nof_symbols):
        l = cfg.start_symbol + s
        rx_d = grid[:, l, jnp.asarray(data_sc)]
        corr = jnp.sum(jnp.conj(h_data) * rx_d, axis=0)
        energy = jnp.sum(jnp.abs(h_data) ** 2, axis=0)
        x = corr / jnp.maximum(energy, 1e-12)
        nv = noise / jnp.maximum(energy, 1e-12)
        llr_parts.append(demodulate(x[None], nv[None], "qpsk")[0])
    llr = jnp.concatenate(llr_parts)
    c_init = ((cfg.rnti << 15) + cfg.n_id) % (1 << 31)
    llr = descramble_llrs(llr[None], c_init)[0]

    k = cfg.nof_uci_bits
    if k <= 11:
        bits, metric = short_block.detect(llr[None], k, 2)
        return {"uci_bits": bits[0], "valid": metric[0] > 0.5,
                "metric": metric[0]}
    code, crc_len = _f2_polar_cfg(k, llr.shape[0])
    lm = polar_ops.rate_dematch(llr[None], code)
    dec = polar_ops.sc_decode(lm, code)
    ok = crc_check(dec, f"crc{crc_len}")[0]
    return {"uci_bits": dec[0, :k], "valid": ok, "metric": jnp.float32(1.0)}
