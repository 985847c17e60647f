"""NZP-CSI-RS generator (TS38.211 §7.4.1.5).

TPU-native analogue of nzp_csi_rs_generator_impl
(lib/phy/upper/signal_processors/nzp_csi_rs_*): QPSK Gold pilots mapped per
the CSI-RS locations table.  Rows 1-4 of Table 7.4.1.5.3-1 are supported
(1/2/4 ports, the configurations srsRAN gNB uses for TRS + CSI acquisition);
fd-CDM2 covers applied per port.
"""

from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

from ...ops.gold import gold_sequence
from ...ops.modulation import modulate


@dataclasses.dataclass(frozen=True)
class CsiRsConfig:
    """Static NZP-CSI-RS description (fapi dl_csi_rs_pdu essentials)."""

    row: int                  # 1..4 (Table 7.4.1.5.3-1)
    rb_start: int
    rb_count: int
    symbol: int               # l0
    k0: int                   # frequency-domain location within the RB
    scrambling_id: int
    slot_in_frame: int = 0
    amplitude: float = 1.0


def _c_init(cfg: CsiRsConfig, l: int) -> int:
    return ((1 << 10) * (14 * cfg.slot_in_frame + l + 1)
            * (2 * cfg.scrambling_id + 1) + cfg.scrambling_id) % (1 << 31)


def c_init_for(cfg: CsiRsConfig, slot_in_frame: int | None = None) -> np.ndarray:
    sif = cfg.slot_in_frame if slot_in_frame is None else slot_in_frame
    nof_syms = 2 if cfg.row == 5 else 1
    vals = [((1 << 10) * (14 * sif + cfg.symbol + so + 1)
             * (2 * cfg.scrambling_id + 1) + cfg.scrambling_id) % (1 << 31)
            for so in range(nof_syms)]
    if nof_syms == 1:
        return np.array(vals[0], dtype=np.uint32)
    return np.array(vals, dtype=np.uint32)


@functools.lru_cache(maxsize=None)
def _layout(row: int, k0: int):
    """(nof_ports, density_per_rb, [(port, sc_off, sym_off, wf)] per RB).

    Rows 1-5 of TS38.211 Table 7.4.1.5.3-1 — the subset expressible on a
    <=4-port grid (this framework's MAX_PORTS; rows 6-18 need 8..32 CSI-RS
    ports and activate once wider port grids land).
    """
    if row == 1:
        return 1, 3, tuple((0, k0 + 4 * i, 0, 1.0) for i in range(3))
    if row == 2:
        return 1, 1, ((0, k0, 0, 1.0),)
    if row == 3:
        # 2 ports, fd-CDM2 on (k0, k0+1)
        return 2, 1, ((0, k0, 0, 1.0), (0, k0 + 1, 0, 1.0),
                      (1, k0, 0, 1.0), (1, k0 + 1, 0, -1.0))
    if row == 4:
        # 4 ports, two fd-CDM2 groups at k0 and k0+2
        ent = []
        for g, base in ((0, k0), (1, k0 + 2)):
            ent += [(2 * g + 0, base, 0, 1.0), (2 * g + 0, base + 1, 0, 1.0),
                    (2 * g + 1, base, 0, 1.0), (2 * g + 1, base + 1, 0, -1.0)]
        return 4, 1, tuple(ent)
    if row == 5:
        # 4 ports, one fd-CDM2 group on two adjacent symbols (l0, l0+1)
        ent = []
        for g, sym in ((0, 0), (1, 1)):
            ent += [(2 * g + 0, k0, sym, 1.0), (2 * g + 0, k0 + 1, sym, 1.0),
                    (2 * g + 1, k0, sym, 1.0), (2 * g + 1, k0 + 1, sym, -1.0)]
        return 4, 1, tuple(ent)
    raise NotImplementedError(
        f"CSI-RS row {row} needs {8 if row < 9 else 12}+ ports (> MAX_PORTS)")


def process(grid: jnp.ndarray, cfg: CsiRsConfig, c_init=None) -> jnp.ndarray:
    """Map CSI-RS into a [P, nsym, nsc] grid.  c_init may be traced
    (scalar for single-symbol rows, [nof_symbols] for row 5)."""
    nof_ports, density, entries = _layout(cfg.row, cfg.k0)
    l = cfg.symbol
    npil = density * cfg.rb_count
    sym_offs = sorted({e[2] for e in entries})
    seqs = {}
    for so in sym_offs:
        if c_init is None:
            ci = _c_init(cfg, l + so)
        else:
            ci = c_init if len(sym_offs) == 1 else c_init[so]
        bits = gold_sequence(ci, 2 * npil, advance=2 * density * cfg.rb_start)
        seqs[so] = modulate(bits[None], "qpsk")[0] * cfg.amplitude  # [npil]
    rbs = np.arange(cfg.rb_start, cfg.rb_start + cfg.rb_count)
    for port, sc_off, sym_off, wf in entries:
        # sequence index per RB: density pilots per RB; CDM pair shares m
        sc = jnp.asarray((rbs * 12 + sc_off).astype(np.int32))
        if density == 3:
            m = jnp.asarray((np.arange(cfg.rb_count) * 3
                             + (sc_off - cfg.k0) // 4).astype(np.int32))
        else:
            m = jnp.asarray(np.arange(cfg.rb_count, dtype=np.int32))
        grid = grid.at[port, l + sym_off, sc].add(wf * seqs[sym_off][m])
    return grid
