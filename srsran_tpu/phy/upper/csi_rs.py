"""NZP-CSI-RS generator (TS38.211 §7.4.1.5).

TPU-native analogue of nzp_csi_rs_generator_impl
(lib/phy/upper/signal_processors/nzp_csi_rs_generator_impl.cpp) and the
location table builder (lib/ran/csi_rs/csi_rs_pattern.cpp:34-436): QPSK Gold
pilots mapped per TS38.211 Table 7.4.1.5.3-1 rows 1-12 (the reference's
supported set, csi_rs_pattern.cpp:449), with fd-CDM2 / CDM4-FD2-TD2 covers
(cdm tables at nzp_csi_rs_generator_impl.cpp:37-58), densities 3 / 1 / 0.5
(even/odd RB), and a per-CSI-RS-port precoding matrix onto physical antenna
ports (the reference maps CDM ports through precoding_configuration,
nzp_csi_rs_generator_impl.cpp:250-287).

Sequence indexing follows the reference exactly: per used OFDM symbol one
Gold sequence with c_init = (2^10 (14 n_slot + l + 1)(2 n_id + 1) + n_id)
mod 2^31 (nzp_csi_rs_generator_impl.cpp:123), advanced past PRBs below
rb_start (get_nof_skipped_elements, :71-109), consuming 3 (row 1) / 1
(row 2) / 2 (CDM rows) QPSK symbols per occupied PRB (get_seq_len,
:141-173); all CDM groups of a row share the same sequence values.
"""

from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

from ...ops.gold import gold_sequence
from ...ops.modulation import modulate

# CDM cover tables (nzp_csi_rs_generator_impl.cpp:37-58): per cdm index,
# (w_f over k'=0..1, w_t over l'=0..T-1).
_CDM_TABLES = {
    "no_CDM": ([[1.0]], [[1.0]]),
    "fd_CDM2": ([[1.0, 1.0], [1.0, -1.0]], [[1.0], [1.0]]),
    "cdm4_FD2_TD2": (
        [[1.0, 1.0], [1.0, -1.0], [1.0, 1.0], [1.0, -1.0]],
        [[1.0, 1.0], [1.0, 1.0], [1.0, -1.0], [1.0, -1.0]],
    ),
    "cdm8_FD2_TD4": (
        [[1.0, 1.0], [1.0, -1.0]] * 4,
        [[1.0, 1.0, 1.0, 1.0], [1.0, 1.0, 1.0, 1.0],
         [1.0, -1.0, 1.0, -1.0], [1.0, -1.0, 1.0, -1.0],
         [1.0, 1.0, -1.0, -1.0], [1.0, 1.0, -1.0, -1.0],
         [1.0, -1.0, -1.0, 1.0], [1.0, -1.0, -1.0, 1.0]],
    ),
}

# Row → (nof_ports, cdm type, nof k_ref, allowed densities).  Rows 1-12 per
# csi_rs_pattern.cpp (mapping_row_1..12); default density first.  Rows
# 13-18 complete TS38.211 Table 7.4.1.5.3-1 (24/32 ports) — BEYOND the
# reference, which asserts row <= 12 (csi_rs_pattern.cpp:449).
_ROWS = {
    1: (1, "no_CDM", 1, ("three",)),
    2: (1, "no_CDM", 1, ("one", "dot5_even", "dot5_odd")),
    3: (2, "fd_CDM2", 1, ("one", "dot5_even", "dot5_odd")),
    4: (4, "fd_CDM2", 1, ("one",)),
    5: (4, "fd_CDM2", 1, ("one",)),
    6: (8, "fd_CDM2", 4, ("one",)),
    7: (8, "fd_CDM2", 2, ("one",)),
    8: (8, "cdm4_FD2_TD2", 2, ("one",)),
    9: (12, "fd_CDM2", 6, ("one",)),
    10: (12, "cdm4_FD2_TD2", 3, ("one",)),
    11: (16, "fd_CDM2", 4, ("one", "dot5_even", "dot5_odd")),
    12: (16, "cdm4_FD2_TD2", 4, ("one",)),
    13: (24, "fd_CDM2", 3, ("one", "dot5_even", "dot5_odd")),
    14: (24, "cdm4_FD2_TD2", 3, ("one", "dot5_even", "dot5_odd")),
    15: (24, "cdm8_FD2_TD4", 3, ("one", "dot5_even", "dot5_odd")),
    16: (32, "fd_CDM2", 4, ("one", "dot5_even", "dot5_odd")),
    17: (32, "cdm4_FD2_TD2", 4, ("one", "dot5_even", "dot5_odd")),
    18: (32, "cdm8_FD2_TD4", 4, ("one", "dot5_even", "dot5_odd")),
}


def nof_csi_rs_ports(row: int) -> int:
    return _ROWS[row][0]


@dataclasses.dataclass(frozen=True)
class CsiRsConfig:
    """Static NZP-CSI-RS description (fapi dl_csi_rs_pdu essentials)."""

    row: int                  # 1..18 (Table 7.4.1.5.3-1; reference stops at 12)
    rb_start: int
    rb_count: int
    symbol: int               # l0
    symbol2: int = -1         # l1, required by rows 13/14/16/17
    k0: int = 0               # first freq-domain allocation reference
    k_ref: tuple = ()         # all k references (defaults to (k0,))
    scrambling_id: int = 0
    density: str = ""         # "three"|"one"|"dot5_even"|"dot5_odd"; "" = row default
    slot_in_frame: int = 0
    amplitude: float = 1.0

    def resolved_k_ref(self) -> tuple:
        ks = tuple(self.k_ref) if self.k_ref else (self.k0,)
        _, _, nkref, _ = _ROWS[self.row]
        if len(ks) != nkref:
            raise ValueError(f"CSI-RS row {self.row} needs {nkref} k_ref values")
        return ks

    def resolved_density(self) -> str:
        dens = _ROWS[self.row][3]
        d = self.density or dens[0]
        if d not in dens:
            raise ValueError(f"CSI-RS row {self.row}: invalid density {d}")
        return d


@functools.lru_cache(maxsize=None)
def _cdm_groups(row: int, k_ref: tuple, l0: int, l1: int = -1):
    """[(k_bar, l_bar)] per CDM group + (cdm type, fd size, td size).

    Mirrors mapping_row_1..12 (csi_rs_pattern.cpp:34-357); the per-port
    expansion there collapses to one entry per CDM group here.  Rows 13-18
    follow TS38.211 Table 7.4.1.5.3-1 directly (not in the reference).
    """
    _, cdm, _, _ = _ROWS[row]
    wf_tab, wt_tab = _CDM_TABLES[cdm]
    fd, td = len(wf_tab[0]), len(wt_tab[0])
    k = list(k_ref)
    if row in (13, 14, 16, 17) and l1 < 0:
        raise ValueError(f"CSI-RS row {row} requires symbol2 (l1)")
    if row in (1, 2, 3):
        groups = [(k[0], l0)]
    elif row == 4:
        groups = [(k[0], l0), (k[0] + 2, l0)]
    elif row == 5:
        groups = [(k[0], l0), (k[0], l0 + 1)]
    elif row in (6, 8, 9, 10, 12, 15, 18):
        groups = [(kr, l0) for kr in k]
    elif row == 7:
        groups = [(k[g % 2], l0 + g // 2) for g in range(4)]
    elif row == 11:
        groups = [(k[g % 4], l0 + g // 4) for g in range(8)]
    elif row in (13, 16):
        groups = [(kr, l) for l in (l0, l0 + 1, l1, l1 + 1) for kr in k]
    elif row in (14, 17):
        groups = [(kr, l) for l in (l0, l1) for kr in k]
    else:
        raise NotImplementedError(f"CSI-RS row {row}")
    return tuple(groups), cdm, fd, td


def _used_symbols(cfg: CsiRsConfig) -> list:
    groups, _, _, td = _cdm_groups(cfg.row, cfg.resolved_k_ref(), cfg.symbol,
                                   cfg.symbol2)
    return sorted({lb + lp for _, lb in groups for lp in range(td)})


def _used_rbs(cfg: CsiRsConfig) -> np.ndarray:
    """Occupied PRB indices (build_re_patterns, csi_rs_pattern.cpp:368-388)."""
    d = cfg.resolved_density()
    rbs = np.arange(cfg.rb_start, cfg.rb_start + cfg.rb_count)
    if d == "dot5_even":
        return rbs[rbs % 2 == 0]
    if d == "dot5_odd":
        return rbs[rbs % 2 == 1]
    return rbs


def _seq_per_rb(cfg: CsiRsConfig) -> int:
    """QPSK sequence symbols consumed per occupied PRB (get_seq_len)."""
    if cfg.row == 1:
        return 3
    if cfg.row == 2:
        return 1
    return 2


def _nof_advance(cfg: CsiRsConfig) -> int:
    """Sequence symbols skipped before the first occupied PRB
    (get_nof_skipped_elements, nzp_csi_rs_generator_impl.cpp:71-109)."""
    d = cfg.resolved_density()
    first_prb = cfg.rb_start
    if d == "dot5_even":
        first_prb += cfg.rb_start % 2
    elif d == "dot5_odd":
        first_prb += 1 - cfg.rb_start % 2
    if d == "three":
        return 3 * first_prb
    if d == "one":
        return first_prb if cfg.row == 2 else 2 * first_prb
    # 0.5 densities
    return first_prb // 2 if cfg.row == 2 else first_prb


def c_init_for(cfg: CsiRsConfig, slot_in_frame: int | None = None) -> np.ndarray:
    """Per-used-symbol Gold c_init values ([] scalar if one symbol).  May be
    fed back traced for slot-invariant compiled programs."""
    sif = cfg.slot_in_frame if slot_in_frame is None else slot_in_frame
    vals = [((1 << 10) * (14 * sif + l + 1) * (2 * cfg.scrambling_id + 1)
             + cfg.scrambling_id) % (1 << 31) for l in _used_symbols(cfg)]
    if len(vals) == 1:
        return np.array(vals[0], dtype=np.uint32)
    return np.array(vals, dtype=np.uint32)


def seq_values_for(cfg: CsiRsConfig,
                   slot_in_frame: int | None = None) -> np.ndarray:
    """Host-side Gold/QPSK sequence VALUES [n_used_symbols, spr*n_used]
    complex64 (amplitude applied) — preferred traced input for process()."""
    from ...ops.gold import gold_sequence_np
    from ...ops.modulation import qpsk_np
    sif = cfg.slot_in_frame if slot_in_frame is None else slot_in_frame
    rbs = _used_rbs(cfg)
    spr = _seq_per_rb(cfg)
    adv = _nof_advance(cfg)
    rows = []
    for l in _used_symbols(cfg):
        ci = ((1 << 10) * (14 * sif + l + 1) * (2 * cfg.scrambling_id + 1)
              + cfg.scrambling_id) % (1 << 31)
        rows.append(qpsk_np(gold_sequence_np(ci, 2 * spr * len(rbs),
                                             advance=2 * adv)))
    return (np.stack(rows, axis=0) * cfg.amplitude).astype(np.complex64)


def process(grid: jnp.ndarray, cfg: CsiRsConfig, c_init=None,
            precoding: np.ndarray | None = None) -> jnp.ndarray:
    """Map NZP-CSI-RS into a [P, nsym, nsc] grid.

    c_init may be traced (scalar, or [nof_used_symbols]).  ``precoding`` is
    a [nof_csi_ports, P] matrix mapping CSI-RS antenna ports onto physical
    ports (identity prefix by default, like the reference's default
    precoding_configuration); rows 6-12 with more CSI-RS ports than grid
    ports require an explicit matrix.
    """
    k_ref = cfg.resolved_k_ref()
    groups, cdm, fd, td = _cdm_groups(cfg.row, k_ref, cfg.symbol, cfg.symbol2)
    wf_tab, wt_tab = _CDM_TABLES[cdm]
    cdm_size = len(wf_tab)
    nof_csi_ports = len(groups) * cdm_size
    nof_phys = grid.shape[0]
    if precoding is None:
        if nof_csi_ports > nof_phys:
            raise ValueError(
                f"CSI-RS row {cfg.row}: {nof_csi_ports} CSI-RS ports > "
                f"{nof_phys} grid ports; pass a precoding matrix")
        precoding = np.eye(nof_csi_ports, nof_phys)
    precoding = np.asarray(precoding)

    rbs = _used_rbs(cfg)
    n_used = len(rbs)
    spr = _seq_per_rb(cfg)
    syms = _used_symbols(cfg)
    adv = _nof_advance(cfg)

    # One Gold/QPSK sequence per used OFDM symbol.
    seqs = {}
    if c_init is not None and jnp.issubdtype(
            getattr(c_init, "dtype", jnp.uint32), jnp.complexfloating):
        vals = jnp.asarray(c_init)            # host-built (seq_values_for)
        for i, l in enumerate(syms):
            seqs[l] = vals[i]
    else:
        for i, l in enumerate(syms):
            if c_init is None:
                ci = int(c_init_for(cfg)[i]) if len(syms) > 1 else int(c_init_for(cfg))
            else:
                ci = c_init[i] if len(syms) > 1 else c_init
            bits = gold_sequence(ci, 2 * spr * n_used, advance=2 * adv)
            seqs[l] = modulate(bits[None], "qpsk")[0] * cfg.amplitude  # [spr*n_used]

    # Collect (phys_port, sym, sc, value) in vectorized blocks, one
    # scatter-add per physical port.
    per_port: dict = {p: ([], [], []) for p in range(nof_phys)}

    def emit(csi_port, l, sc_np, vals):
        for p in range(nof_phys):
            w = complex(precoding[csi_port, p])
            if w == 0.0:
                continue
            ls, scs, vs = per_port[p]
            ls.append(np.full(len(sc_np), l, dtype=np.int32))
            scs.append(sc_np.astype(np.int32))
            vs.append(vals if w == 1.0 else w * vals)

    if cfg.row == 1:
        # 3 REs/RB at k0, k0+4, k0+8; m = 3n + j (mapping_row_1 + density 3).
        for j in range(3):
            sc = rbs * 12 + k_ref[0] + 4 * j
            m = jnp.asarray(np.arange(n_used, dtype=np.int32) * 3 + j)
            emit(0, cfg.symbol, sc, seqs[cfg.symbol][m])
    else:
        for g, (k_bar, l_bar) in enumerate(groups):
            for ci_idx in range(cdm_size):
                csi_port = g * cdm_size + ci_idx
                for lp in range(td):
                    l = l_bar + lp
                    wt = wt_tab[ci_idx][lp]
                    for kp in range(fd):
                        wf = wf_tab[ci_idx][kp]
                        sc = rbs * 12 + k_bar + kp
                        m = jnp.asarray(
                            np.arange(n_used, dtype=np.int32) * spr + kp)
                        emit(csi_port, l, sc, (wf * wt) * seqs[l][m])

    for p, (ls, scs, vs) in per_port.items():
        if not ls:
            continue
        l_all = jnp.asarray(np.concatenate(ls))
        sc_all = jnp.asarray(np.concatenate(scs))
        v_all = jnp.concatenate(vs)
        grid = grid.at[p, l_all, sc_all].add(v_all)
    return grid
