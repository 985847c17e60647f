"""DM-RS generation and mapping for PDSCH/PUSCH (TS38.211 §7.4.1.1, §6.4.1.1).

TPU-native analogue of dmrs_pdsch_processor_impl / dmrs_pusch_estimator's
sequence part (lib/phy/upper/signal_processors/dmrs_*): QPSK Gold pilots on
a comb, with per-port frequency/time orthogonal covers (CDM groups).
Config type 1 (comb-2) supported; pilots are produced as dense
[nsym_dmrs, npilot_sc] arrays plus host-precomputed RE index plans.
"""

from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

from ...ops.gold import gold_sequence
from ...ops.modulation import modulate

# Type-1 CDM mapping for DM-RS ports 0..3 (== antenna ports 1000..1003 DL):
# (cdm_group/delta, w_f over comb pair, w_t over symbol pair)
TYPE1_PORT_CONFIG = {
    0: (0, (+1, +1), (+1, +1)),
    1: (0, (+1, -1), (+1, +1)),
    2: (1, (+1, +1), (+1, +1)),
    3: (1, (+1, -1), (+1, +1)),
}

# Type-2 (TS38.211 Table 7.4.1.1.2-2): 3 CDM groups of adjacent RE pairs,
# group lambda occupies subcarriers {2λ, 2λ+1, 2λ+6, 2λ+7} per PRB;
# ports 0..5 -> (group, w_f over the pair).
TYPE2_PORT_CONFIG = {
    0: (0, (+1, +1), (+1, +1)),
    1: (0, (+1, -1), (+1, +1)),
    2: (1, (+1, +1), (+1, +1)),
    3: (1, (+1, -1), (+1, +1)),
    4: (2, (+1, +1), (+1, +1)),
    5: (2, (+1, -1), (+1, +1)),
}


def type2_sc_indices(rb_start: int, rb_count: int, group: int) -> "np.ndarray":
    """Subcarrier indices of a type-2 CDM group (4 pilots/PRB)."""
    base = []
    for rb in range(rb_start, rb_start + rb_count):
        k0 = rb * 12 + 2 * group
        base += [k0, k0 + 1, k0 + 6, k0 + 7]
    return np.array(base, dtype=np.int32)


@dataclasses.dataclass(frozen=True)
class DmrsConfig:
    """Static DM-RS description for one PDSCH/PUSCH allocation."""

    rb_start: int
    rb_count: int
    symbols: tuple            # DM-RS symbol indices within the slot
    ports: tuple              # DM-RS port indices (0..3, type 1)
    scrambling_id: int        # N_ID^{0/1}
    n_scid: int = 0
    config_type: int = 1      # DM-RS configuration type 1 or 2
    numerology: int = 0
    slot_in_frame: int = 0    # n_slot for c_init
    amplitude: float = 1.0    # beta_dmrs
    # Non-contiguous allocation (RA type 0 / interleaved VRB-PRB):
    # sorted absolute PRB tuple; overrides rb_start/rb_count for the
    # comb positions and pilot selection (rb_allocation.cpp analogue).
    prbs: tuple | None = None


def _c_init(cfg: DmrsConfig, symbol: int) -> int:
    nsym = 14
    l = symbol
    return ((1 << 17) * (nsym * cfg.slot_in_frame + l + 1) * (2 * cfg.scrambling_id + 1)
            + 2 * cfg.scrambling_id + cfg.n_scid) % (1 << 31)


def c_inits_for(cfg: DmrsConfig, slot_in_frame: int | None = None) -> np.ndarray:
    """Host-side per-DM-RS-symbol c_init values (uint32 [nof_dmrs_symbols]).

    Passed as a *traced* input to the slot programs so that the jit key does
    not depend on the slot index (one compiled program serves every slot).
    """
    sif = cfg.slot_in_frame if slot_in_frame is None else slot_in_frame
    return np.array(
        [((1 << 17) * (14 * sif + l + 1) * (2 * cfg.scrambling_id + 1)
          + 2 * cfg.scrambling_id + cfg.n_scid) % (1 << 31)
         for l in cfg.symbols], dtype=np.uint32)


@functools.lru_cache(maxsize=8192)
def _prb_pilot_select_cached(prbs: tuple, per_rb: int):
    prbs = sorted(prbs)
    lo, hi = prbs[0], prbs[-1]
    span = per_rb * (hi - lo + 1)
    sel = np.concatenate([np.arange((p - lo) * per_rb,
                                    (p - lo + 1) * per_rb)
                          for p in prbs])
    return span, 2 * per_rb * lo, sel


def _prb_pilot_select(cfg: DmrsConfig, per_rb: int):
    """(gold span in pilots, advance, per-PRB column selector) for a
    possibly non-contiguous allocation: pilots are generated over the
    covering span [min_prb, max_prb] at the ABSOLUTE Gold positions and
    the allocated PRBs' columns selected (the sequence indexes by CRB)."""
    if cfg.prbs is None:
        return per_rb * cfg.rb_count, 2 * per_rb * cfg.rb_start, None
    assert cfg.config_type == 1, \
        "non-contiguous DM-RS allocations are implemented for type 1 only"
    return _prb_pilot_select_cached(tuple(cfg.prbs), per_rb)


@functools.lru_cache(maxsize=8192)
def pilot_values_for(cfg: DmrsConfig,
                     slot_in_frame: int | None = None) -> np.ndarray:
    """Host-side QPSK pilot base sequences [nsym, npilot] complex64.

    The preferred slot-varying traced input: uploading the VALUES (a few
    10s of kB) replaces per-symbol Gold + QPSK device ops — slot indices
    cycle so the lru_cache makes the host cost one-time per slot phase.
    (pilots_for_port accepts this array wherever c_inits is accepted.)
    """
    from ...ops.gold import gold_sequence_np
    from ...ops.modulation import qpsk_np
    per_rb = 6 if cfg.config_type == 1 else 4
    npilot, adv, sel = _prb_pilot_select(cfg, per_rb)
    sif = cfg.slot_in_frame if slot_in_frame is None else slot_in_frame
    rows = []
    for l in cfg.symbols:
        ci = ((1 << 17) * (14 * sif + l + 1) * (2 * cfg.scrambling_id + 1)
              + 2 * cfg.scrambling_id + cfg.n_scid) % (1 << 31)
        row = qpsk_np(gold_sequence_np(ci, 2 * npilot, advance=adv))
        rows.append(row if sel is None else row[sel])
    return (np.stack(rows, axis=0) * cfg.amplitude).astype(np.complex64)


def _is_values(c_inits) -> bool:
    """True when the slot-context entry carries pilot VALUES [S, K]
    (complex) rather than c_init scalars [S] (uint32)."""
    return (c_inits is not None and getattr(c_inits, "ndim", 1) == 2
            and jnp.issubdtype(
                getattr(c_inits, "dtype", jnp.uint32), jnp.complexfloating))


def sequence(cfg: DmrsConfig, symbol: int, c_init=None) -> jnp.ndarray:
    """Base QPSK pilot sequence for one symbol, length 6*nof_alloc_prb.

    ``c_init`` may be a traced uint32 scalar (slot-varying input); when None
    it is derived statically from the config.  The Gold sequence is advanced
    so that PRB ``rb_start`` is consistent with a carrier starting at CRB0;
    non-contiguous allocations select their PRBs' columns from the span.
    """
    per_rb = 6 if cfg.config_type == 1 else 4
    npilot, adv, sel = _prb_pilot_select(cfg, per_rb)
    if c_init is None:
        c_init = _c_init(cfg, symbol)
    bits = gold_sequence(c_init, 2 * npilot, advance=adv)
    seq = modulate(bits[None], "qpsk")[0] * cfg.amplitude
    return seq if sel is None else seq[jnp.asarray(sel)]


@functools.lru_cache(maxsize=None)
def _type1_sc_indices(rb_start: int, rb_count: int, delta: int,
                      prbs: tuple | None = None) -> np.ndarray:
    """Subcarrier indices of the comb for one CDM group."""
    if prbs is not None:
        return np.concatenate(
            [p * 12 + 2 * np.arange(6, dtype=np.int32) + delta
             for p in sorted(prbs)]).astype(np.int32)
    base = np.arange(rb_count * 6, dtype=np.int32)
    return (rb_start * 12 + 2 * base + delta).astype(np.int32)


def pilots_for_port(cfg: DmrsConfig, port: int, c_inits=None) -> jnp.ndarray:
    """Dense pilot values [nsym, 6*rb_count] for one DM-RS port (w_f applied).

    c_inits: optional traced uint32 [nof_dmrs_symbols] (see c_inits_for).
    """
    cfgmap = TYPE1_PORT_CONFIG if cfg.config_type == 1 else TYPE2_PORT_CONFIG
    delta, wf, wt = cfgmap[port]
    if _is_values(c_inits):
        vals = jnp.asarray(c_inits)                        # [S, K] pilots
        npil = vals.shape[-1]
        cover = (np.where(np.arange(npil) % 2 == 0, wf[0], wf[1])[None, :]
                 * np.array([wt[i % 2] for i in range(vals.shape[0])],
                            np.float32)[:, None]).astype(np.float32)
        return vals * jnp.asarray(cover)
    rows = []
    for i, l in enumerate(cfg.symbols):
        seq = sequence(cfg, l, None if c_inits is None else c_inits[i])
        alt = jnp.where(jnp.arange(seq.shape[0]) % 2 == 0, wf[0], wf[1]).astype(jnp.float32)
        rows.append(seq * alt * wt[i % 2])
    return jnp.stack(rows, axis=0)


def map_to_grid(grid: jnp.ndarray, cfg: DmrsConfig,
                precoding: np.ndarray | None = None,
                c_inits=None, prg_matrices=None,
                prg_of_sc=None) -> jnp.ndarray:
    """Scatter DM-RS for all ports into a [P, nsym, nsc] grid.

    With ``precoding`` [P, L] the per-layer (== per-DMRS-port) pilots are
    precoded like data, as the reference's mapper does while writing.
    With ``prg_matrices`` [G, P, L] (traced) + ``prg_of_sc`` (host fn:
    subcarrier indices -> PRG index) each pilot is precoded with its PRG's
    matrix — UE channel estimation then sees the same effective channel
    H @ W_g as the data (per-PRG precode-while-mapping,
    resource_grid_mapper_impl.cpp:30-120).
    """
    for li, dmrs_port in enumerate(cfg.ports):
        if cfg.config_type == 1:
            delta = TYPE1_PORT_CONFIG[dmrs_port][0]
            sc_h = _type1_sc_indices(cfg.rb_start, cfg.rb_count, delta,
                                     cfg.prbs)
        else:
            group = TYPE2_PORT_CONFIG[dmrs_port][0]
            sc_h = type2_sc_indices(cfg.rb_start, cfg.rb_count, group)
        sc = jnp.asarray(sc_h)
        pilots = pilots_for_port(cfg, dmrs_port, c_inits)      # [S, K]
        if prg_matrices is not None:
            prg = jnp.asarray(prg_of_sc(sc_h))                  # [K]
            w = prg_matrices.astype(grid.dtype)[prg][:, :, li]  # [K, P]
            for si, l in enumerate(cfg.symbols):
                grid = grid.at[:, l, sc].add(w.T * pilots[si][None, :])
        elif precoding is None:
            for si, l in enumerate(cfg.symbols):
                grid = grid.at[li, l, sc].add(pilots[si])
        else:
            w = jnp.asarray(precoding[:, li], dtype=grid.dtype)  # [P]
            for si, l in enumerate(cfg.symbols):
                grid = grid.at[:, l, sc].add(w[:, None] * pilots[si][None, :])
    return grid
