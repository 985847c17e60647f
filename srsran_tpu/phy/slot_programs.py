"""Jit-compiled per-slot DL/UL programs for one cell.

TPU-native replacement for the reference's per-slot processor machinery
(downlink_processor_single_executor_impl.cpp:258-285 finish/send flow and
uplink_processor_impl.cpp:123-247 per-symbol dispatch): instead of executor
fan-out and notifier callbacks, the whole slot is ONE fused XLA program —
build grid (SSB+PDCCH+PDSCH+CSI-RS) -> OFDM modulate -> samples for DL;
samples -> OFDM demodulate -> PUSCH/PUCCH processing -> result arrays for
UL.  The static "slot plan" (tuple of PDU configs) is the jit key, mirroring
how FAPI slot messages parameterize the reference's processors.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..ran.cyclic_prefix import CyclicPrefix, slot_num_samples
from ..ops import ofdm
from .support import resource_grid
from ..utils import sanitize
from .upper import ssb as ssb_mod
from .upper import pdsch as pdsch_mod
from .upper import pdcch as pdcch_mod
from .upper import pusch as pusch_mod
from .upper import pucch as pucch_mod
from .upper import prach as prach_mod
from .upper import csi_rs as csi_rs_mod
from .upper import srs as srs_mod
from .upper import ptrs_prs as ptrs_prs_mod


@dataclasses.dataclass(frozen=True)
class CellConfig:
    """Static cell numerology/geometry (fapi config message analogue)."""

    nof_ports: int
    nof_rb: int
    dft_size: int
    numerology: int
    cp: CyclicPrefix = CyclicPrefix.NORMAL
    center_freq_hz: float = 3.5e9
    tx_scale: float = 1.0
    # Store the in-program resource grid as complex-bf16 planes (the
    # reference's cbf16_t layout, resource_grid_impl.h:40-64) instead of
    # complex64 — halves grid HBM traffic at a bf16 quantization cost.
    grid_cbf16: bool = False

    @property
    def nof_sc(self) -> int:
        return self.nof_rb * 12

    def slot_samples(self, slot_in_subframe: int = 0) -> int:
        return slot_num_samples(self.cp, self.numerology, self.dft_size,
                                slot_in_subframe)


# ----------------------------------------------------------------- DL slot

def dl_slot_core(cell: CellConfig, plan, slot_in_subframe: int = 0):
    """Un-jitted DL slot program builder (for jit or vmap over cells).

    plan = (ssb_cfgs, pdcch_cfgs, pdsch_cfgs, csi_rs_cfgs[, prs_cfgs]).
    Returned fn(ssb_mib, pdcch_payloads, pdsch_payloads) -> (samples, grid).
    """
    if len(plan) == 4:          # pre-PRS plan tuples remain valid
        plan = plan + ((),)
    ssb_cfgs, pdcch_cfgs, pdsch_cfgs, csi_cfgs, prs_cfgs = plan

    def run(ssb_mib, pdcch_payloads, pdsch_payloads, ctx=None):
        """ctx: optional slot-varying traced inputs (see fapi.conductor):
        {'ssb': ((static_bits, scr_mask), ...), 'pdcch': (cinits, ...),
         'pdsch': (cinits, ...), 'csi': (cinit, ...)} — keeps the compiled
        program independent of the slot/SFN."""
        gshape = (cell.nof_ports,
                  14 if cell.cp is CyclicPrefix.NORMAL else 12, cell.nof_sc)
        if cell.grid_cbf16:
            grid = resource_grid.PackedGrid.zeros(gshape)
        else:
            grid = jnp.zeros(gshape, dtype=jnp.complex64)
        # named_scope per block: device-time attribution for
        # utils/device_metrics.profile_blocks (per-block metric decorators).
        for i, (cfg, mib) in enumerate(zip(ssb_cfgs, ssb_mib)):
            sctx = ctx["ssb"][i] if ctx else None
            with jax.named_scope("ssb"):
                grid = ssb_mod.map_ssb_to_grid(grid, cfg, mib, sctx)
        for i, (cfg, bits) in enumerate(zip(pdcch_cfgs, pdcch_payloads)):
            ci = ctx["pdcch"][i] if ctx else None
            with jax.named_scope("pdcch"):
                grid = pdcch_mod.process(grid, bits, cfg, dmrs_cinits=ci)
        for i, (cfg, bits) in enumerate(zip(pdsch_cfgs, pdsch_payloads)):
            ci = ctx["pdsch"][i] if ctx else None
            pci = ctx.get("ptrs", (None,) * len(pdsch_cfgs))[i] if ctx else None
            pm = ctx.get("pm", (None,) * len(pdsch_cfgs))[i] if ctx else None
            with jax.named_scope("pdsch"):
                grid = pdsch_mod.process(grid, bits, cfg, dmrs_cinits=ci,
                                         ptrs_cinits=pci, pm_matrices=pm)
        for i, cfg in enumerate(csi_cfgs):
            ci = ctx["csi"][i] if ctx else None
            with jax.named_scope("csi_rs"):
                grid = csi_rs_mod.process(grid, cfg, c_init=ci)
        for i, cfg in enumerate(prs_cfgs):
            ci = ctx["prs"][i] if ctx else None
            with jax.named_scope("prs"):
                grid = ptrs_prs_mod.map_prs(grid, cfg, cinits=ci)
        with jax.named_scope("ofdm_modulate"):
            samples = ofdm.modulate_slot(
                grid, cell.dft_size, cell.numerology, cell.cp,
                slot_in_subframe, cell.center_freq_hz, cell.tx_scale)
        return samples, grid

    return run


@functools.lru_cache(maxsize=None)
def dl_slot_fn(cell: CellConfig, plan, slot_in_subframe: int = 0):
    """Jitted single-cell DL slot program (checkify-instrumented when
    SRSRAN_TPU_SANITIZE=1; utils/sanitize)."""
    return sanitize.checkified_jit(dl_slot_core(cell, plan, slot_in_subframe))


@functools.lru_cache(maxsize=None)
def dl_slot_fn_samples(cell: CellConfig, plan, slot_in_subframe: int = 0):
    """Jitted DL slot program returning samples ONLY — the split-8 radio
    path needs no grid output, and dropping it saves the [P, S, nsc]
    complex64 HBM materialization per slot."""
    core = dl_slot_core(cell, plan, slot_in_subframe)

    def run(ssb_mib, pdcch_payloads, pdsch_payloads, ctx=None):
        return core(ssb_mib, pdcch_payloads, pdsch_payloads, ctx)[0]

    return sanitize.checkified_jit(run)


# ----------------------------------------------------------------- UL slot

def ul_slot_core(cell: CellConfig, plan, slot_in_subframe: int = 0,
                 from_grid: bool = False):
    """Un-jitted UL slot program builder (for jit or vmap over cells).

    plan = (pusch_cfgs, f0_cfgs, f1_cfgs, f2_cfgs, prach_cfgs[, srs_cfgs
    [, f3_cfgs]]) — f3_cfgs carry PucchF3Config for both F3 and F4 (the
    occ_length field distinguishes, like the reference's demodulator split
    pucch_demodulator_format3.cpp / format4.cpp).
    Returned fn(samples, prach_fd, soft_buffers) -> dict of result pytrees.
    prach_fd: [n_prach, ports, sym, L] frequency-domain PRACH captures (the
    lower-PHY PRACH demodulator output); soft_buffers: tuple per PUSCH
    (HARQ state, zeros when new data).
    """
    plan = plan + ((),) * (7 - len(plan))   # older plan tuples remain valid
    pusch_cfgs, f0_cfgs, f1_cfgs, f2_cfgs, prach_cfgs, srs_cfgs, f3_cfgs = plan

    def run(samples, prach_fd, soft_buffers, ctx=None):
        if from_grid:
            # caller provides the [P, S, K] grid (e.g. the time-sharded
            # OFDM demodulator, parallel.seqpar — one fat cell over chips)
            grid = samples
        else:
            with jax.named_scope("ofdm_demodulate"):
                grid = ofdm.demodulate_slot(
                    samples, cell.nof_sc, cell.dft_size, cell.numerology,
                    cell.cp, slot_in_subframe, cell.center_freq_hz)
        if cell.grid_cbf16:
            # store the demodulated grid as cbf16 planes: every channel
            # processor's gather then reads half the bytes.
            grid = resource_grid.pack_grid(grid)
        out = {"pusch": [], "pucch_f0": [], "pucch_f1": [], "pucch_f2": [],
               "pucch_f3": [], "prach": [], "srs": []}
        for i, cfg in enumerate(pusch_cfgs):
            sb = soft_buffers[i] if soft_buffers is not None else None
            ci = ctx["pusch"][i] if ctx else None
            with jax.named_scope("pusch"):
                res = pusch_mod.process(grid, cfg, soft_buffer=sb,
                                        dmrs_cinits=ci)
            entry = {
                "tb_bits": res.tb_bits, "tb_crc_ok": res.tb_crc_ok,
                "new_soft": res.new_soft,
                "snr": res.csi.snr, "ta_s": res.csi.time_alignment_s,
                "rsrp": res.csi.rsrp, "epre": res.csi.epre,
                "cfo_hz": res.csi.cfo_hz,
                "evm": res.evm,
                "nof_iterations": (res.nof_iterations
                                   if res.nof_iterations is not None
                                   else jnp.zeros((), jnp.float32))}
            for k in ("harq_ack", "csi1", "csi2"):
                bits = getattr(res, f"{k}_bits")
                if bits is not None:
                    entry[f"{k}_bits"] = bits
                    entry[f"{k}_valid"] = getattr(res, f"{k}_valid")
            out["pusch"].append(entry)
        for i, cfg in enumerate(f0_cfgs):
            ncs = ctx["f0"][i] if ctx else None
            with jax.named_scope("pucch_f0"):
                out["pucch_f0"].append(
                    pucch_mod.detect_format0(grid, cfg, ncs=ncs))
        # PUCCH F1: users multiplexed on the same PRB/occasion are detected
        # as one batch (shared despread — the reference's batch API,
        # pucch_processor.h:196-217); grouping is static per slot plan.
        f1_groups: dict = {}
        for i, cfg in enumerate(f1_cfgs):
            key = (cfg.prb, cfg.start_symbol, cfg.nof_symbols, cfg.n_id,
                   cfg.slot, cfg.second_hop_prb)
            f1_groups.setdefault(key, []).append(i)
        f1_results = [None] * len(f1_cfgs)
        for idxs in f1_groups.values():
            common = f1_cfgs[idxs[0]]
            users = tuple((f1_cfgs[i].initial_cyclic_shift,
                           f1_cfgs[i].time_domain_occ,
                           f1_cfgs[i].nof_harq_bits) for i in idxs)
            ncs = ctx["f1"][idxs[0]] if ctx else None
            with jax.named_scope("pucch_f1"):
                rs = pucch_mod.detect_format1_batch(grid, common, users,
                                                    ncs=ncs)
            for i, r in zip(idxs, rs):
                f1_results[i] = r
        out["pucch_f1"].extend(f1_results)
        for i, cfg in enumerate(f2_cfgs):
            ci = ctx["f2"][i] if ctx else None
            with jax.named_scope("pucch_f2"):
                out["pucch_f2"].append(pucch_mod.process_format2(grid, cfg, ci))
        for i, cfg in enumerate(f3_cfgs):
            ncs = ctx["f3"][i] if ctx else None
            with jax.named_scope("pucch_f3"):
                out["pucch_f3"].append(
                    pucch_mod.process_format3(grid, cfg, ncs=ncs))
        for cfg in srs_cfgs:
            with jax.named_scope("srs"):
                est = srs_mod.estimate(grid, cfg)
            # wideband channel: average the estimate over symbols/subcarriers
            out["srs"].append({
                "wideband_h": jnp.mean(est.coeffs, axis=(2, 3)),
                "ta_s": est.time_alignment_s, "snr": est.snr})
        for i, cfg in enumerate(prach_cfgs):
            with jax.named_scope("prach"):
                det = prach_mod.detect(prach_fd[i], cfg)
            out["prach"].append({
                "metrics": det.metrics, "ta_s": det.time_advance_s,
                "detected": det.detected, "rssi": det.rssi})
        return out

    return run


@functools.lru_cache(maxsize=None)
def ul_slot_fn(cell: CellConfig, plan, slot_in_subframe: int = 0):
    """Jitted single-cell UL slot program (checkify-instrumented when
    SRSRAN_TPU_SANITIZE=1; utils/sanitize)."""
    return sanitize.checkified_jit(ul_slot_core(cell, plan, slot_in_subframe))
