"""PT-RS (phase tracking) and PRS (positioning) reference signals.

TPU-native analogues of lib/phy/upper/signal_processors/ptrs/ (TS38.211
§7.4.1.2: PDSCH PT-RS rides on the PDSCH DM-RS sequence, mapped on a
sparse time/frequency lattice) and signal_processors/prs/ (TS38.211
§7.4.1.7: downlink positioning RS with comb-N staggered pattern).
"""

from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

from ...ops.gold import gold_sequence
from ...ops.modulation import modulate


# ----------------------------------------------------------------- PT-RS

@dataclasses.dataclass(frozen=True)
class PtrsConfig:
    """PDSCH PT-RS (TS38.211 §7.4.1.2.2)."""

    rb_start: int
    rb_count: int
    first_symbol: int
    nof_symbols: int
    dmrs_symbols: tuple
    time_density: int = 1      # L_PT-RS: 1, 2, 4
    freq_density: int = 2      # K_PT-RS: 2 or 4 (every K-th RB)
    re_offset: int = 0         # k_RE_ref
    port: int = 0
    scrambling_id: int = 0
    n_scid: int = 0
    slot_in_frame: int = 0
    amplitude: float = 1.0


@functools.lru_cache(maxsize=None)
def ptrs_positions(cfg: PtrsConfig) -> np.ndarray:
    """(symbol, subcarrier) PT-RS RE positions.

    Time: every L-th PDSCH symbol, restarting after each DM-RS symbol
    (TS38.211 §7.4.1.2.2 recursion); frequency: one RE every K_PT-RS RBs.
    """
    out = []
    rbs = np.arange(cfg.rb_start, cfg.rb_start + cfg.rb_count,
                    cfg.freq_density)
    since_ref = 0   # non-DM-RS symbols since the last DM-RS (or PT-RS) ref
    for l in range(cfg.first_symbol, cfg.first_symbol + cfg.nof_symbols):
        if l in cfg.dmrs_symbols:
            since_ref = 0
            continue
        if since_ref % cfg.time_density == 0:
            for rb in rbs:
                out.append((l, rb * 12 + cfg.re_offset))
        since_ref += 1
    return np.array(out, dtype=np.int32)


def ptrs_cinits_for(cfg: PtrsConfig, slot: int | None = None) -> np.ndarray:
    """Host-side DM-RS-sequence c_init per PT-RS symbol (sorted symbol
    order) — traced input keeping the compiled program slot-independent."""
    sl = cfg.slot_in_frame if slot is None else slot
    pos = ptrs_positions(cfg)
    syms = sorted(set(pos[:, 0].tolist())) if len(pos) else []
    return np.array(
        [((1 << 17) * (14 * sl + l + 1) * (2 * cfg.scrambling_id + 1)
          + 2 * cfg.scrambling_id + cfg.n_scid) % (1 << 31) for l in syms],
        dtype=np.uint32)


def ptrs_values_for(cfg: PtrsConfig, slot: int | None = None) -> np.ndarray:
    """Host-side PT-RS VALUES [n_pos] complex64 in ptrs_positions order —
    preferred traced input (one scatter-add on device, zero sequence ops)."""
    from ...ops.gold import gold_sequence_np
    from ...ops.modulation import qpsk_np
    pos = ptrs_positions(cfg)
    if len(pos) == 0:
        return np.zeros(0, np.complex64)
    cis = ptrs_cinits_for(cfg, slot)
    out = []
    for i, l in enumerate(sorted(set(pos[:, 0].tolist()))):
        npil = 6 * (cfg.rb_start + cfg.rb_count)
        seq = qpsk_np(gold_sequence_np(int(cis[i]), 2 * npil))
        sel = pos[pos[:, 0] == l]
        out.append(seq[3 * (sel[:, 1] // 12)])
    return (np.concatenate(out) * cfg.amplitude).astype(np.complex64)


def map_ptrs(grid: jnp.ndarray, cfg: PtrsConfig, cinits=None) -> jnp.ndarray:
    """PT-RS values reuse the DM-RS sequence of the PT-RS port's PDSCH
    (subcarrier k of PRB n -> DM-RS pilot of that PRB)."""
    pos = ptrs_positions(cfg)
    if len(pos) == 0:
        return grid
    if cinits is not None and jnp.issubdtype(
            getattr(cinits, "dtype", jnp.uint32), jnp.complexfloating):
        return grid.at[cfg.port, jnp.asarray(pos[:, 0]),
                       jnp.asarray(pos[:, 1])].add(jnp.asarray(cinits))
    host_cinits = ptrs_cinits_for(cfg)
    vals = []
    for i, l in enumerate(sorted(set(pos[:, 0].tolist()))):
        c_init = host_cinits[i] if cinits is None else cinits[i]
        npil = 6 * (cfg.rb_start + cfg.rb_count)
        bits = gold_sequence(c_init, 2 * npil)
        seq = modulate(bits[None], "qpsk")[0]
        sel = pos[pos[:, 0] == l]
        # PT-RS value = the PRB's type-1 DM-RS pilot (index 3n for PRB n)
        vals.append(seq[jnp.asarray(3 * (sel[:, 1] // 12))])
    v = jnp.concatenate(vals) * cfg.amplitude
    return grid.at[cfg.port, jnp.asarray(pos[:, 0]),
                   jnp.asarray(pos[:, 1])].add(v)


# ------------------------------------------------------------------- PRS

@dataclasses.dataclass(frozen=True)
class PrsConfig:
    """DL positioning RS (TS38.211 §7.4.1.7)."""

    rb_start: int
    rb_count: int
    first_symbol: int
    nof_symbols: int           # 2,4,6,12
    comb_size: int             # 2,4,6,12
    comb_offset: int
    n_id_prs: int
    slot_in_frame: int = 0
    amplitude: float = 1.0


# TS38.211 Table 7.4.1.7.3-1: frequency offset per symbol for each comb size.
_PRS_SYMBOL_OFFSETS = {
    2: (0, 1),
    4: (0, 2, 1, 3),
    6: (0, 3, 1, 4, 2, 5),
    12: (0, 6, 3, 9, 1, 7, 4, 10, 2, 8, 5, 11),
}


def prs_cinits_for(cfg: PrsConfig, slot: int | None = None) -> np.ndarray:
    """Host-side per-symbol Gold c_init (TS38.211 §7.4.1.7.2) — passed as a
    traced input so the compiled slot program is slot-independent."""
    sl = cfg.slot_in_frame if slot is None else slot
    return np.array(
        [(((1 << 22) * (cfg.n_id_prs // 1024)
           + (1 << 10) * (14 * sl + cfg.first_symbol + i + 1)
           * (2 * (cfg.n_id_prs % 1024) + 1)
           + (cfg.n_id_prs % 1024)) % (1 << 31))
         for i in range(cfg.nof_symbols)], dtype=np.uint32)


def prs_values_for(cfg: PrsConfig, slot: int | None = None) -> np.ndarray:
    """Host-side PRS sequence VALUES [nsym, npil] complex64 (amplitude
    applied) — preferred traced input for map_prs."""
    from ...ops.gold import gold_sequence_np
    from ...ops.modulation import qpsk_np
    cis = prs_cinits_for(cfg, slot)
    npil = cfg.rb_count * 12 // cfg.comb_size
    adv = 2 * (cfg.rb_start * 12 // cfg.comb_size)
    rows = [qpsk_np(gold_sequence_np(int(ci), 2 * npil, advance=adv))
            for ci in cis]
    return (np.stack(rows, axis=0) * cfg.amplitude).astype(np.complex64)


def map_prs(grid: jnp.ndarray, cfg: PrsConfig, cinits=None) -> jnp.ndarray:
    offsets = _PRS_SYMBOL_OFFSETS[cfg.comb_size]
    values = None
    if cinits is not None and jnp.issubdtype(
            getattr(cinits, "dtype", jnp.uint32), jnp.complexfloating):
        values, cinits = jnp.asarray(cinits), None
    host_cinits = prs_cinits_for(cfg)
    for i in range(cfg.nof_symbols):
        l = cfg.first_symbol + i
        npil = cfg.rb_count * 12 // cfg.comb_size
        adv = 2 * (cfg.rb_start * 12 // cfg.comb_size)
        if values is not None:
            seq = values[i]
        else:
            c_init = host_cinits[i] if cinits is None else cinits[i]
            bits = gold_sequence(c_init, 2 * npil, advance=adv)
            seq = modulate(bits[None], "qpsk")[0] * cfg.amplitude
        k0 = (cfg.comb_offset + offsets[i % len(offsets)]) % cfg.comb_size
        sc = jnp.asarray((cfg.rb_start * 12 + k0
                          + cfg.comb_size * np.arange(npil)).astype(np.int32))
        grid = grid.at[0, l, sc].add(seq)
    return grid
