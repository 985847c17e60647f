"""Slot conductor: the host-side engine driving the jitted slot programs.

TPU-native replacement for the reference's executor/notifier machinery
(upper_phy_impl + fapi_to_phy_translator, lib/fapi_adaptor/phy/
fapi_to_phy_translator.cpp:333/534/629/684): FAPI-shaped requests arrive,
the conductor resolves the static slot plan, fetches (or compiles) the slot
program, launches it asynchronously (JAX dispatch is async by nature — the
returned arrays are futures), and converts device results to indication
dataclasses.  HARQ soft buffers live in a pool keyed by (rnti, harq_id),
mirroring rx_buffer_pool_impl.

Copy-free hot loop: process_ul returns a PendingSlotResults holding ONLY
device arrays (one packed f32 scalar vector + one packed int8 payload
vector per slot, packed inside the jitted program).  No device->host copy
happens until .resolve(), which the caller runs a few slots behind the
launch front (the analogue of the reference's async result notifiers,
phy_to_fapi_results_event_translator.cpp:137) — so the TPU pipeline is
never stalled by indication decoding and the axon tunnel's d2h sync-mode
penalty stays off the launch path.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..phy.slot_programs import CellConfig, dl_slot_fn, ul_slot_fn
from ..phy.upper import ssb as ssb_mod
from ..phy.upper import pdsch as pdsch_mod
from ..phy.upper import pusch as pusch_mod
from ..phy.upper import pdcch as pdcch_mod
from ..phy.upper import pucch as pucch_mod
from ..phy.upper import csi_rs as csi_rs_mod
from ..phy.upper import ptrs_prs as ptrs_prs_mod
from ..phy.upper import dmrs as dmrs_mod
from ..ran.ldpc_params import segment_tb, select_base_graph
from ..ran import precoding_codebooks
from .messages import (DlTtiRequest, TxDataRequest, UlTtiRequest, UlDciRequest,
                       SlotResults, CrcIndicationPdu, RxDataIndicationPdu,
                       UciIndicationPdu, RachIndicationPreamble,
                       SrsIndicationPdu)
from ..utils import sanitize
from ..utils.transfer import device_put_complex as _dputc


def _norm(cfg, **zero_fields):
    """dataclasses.replace clearing slot-varying fields from the jit key."""
    return dataclasses.replace(cfg, **zero_fields)


@functools.lru_cache(maxsize=64)
def _k_dev(k: int):
    """Staged-slot index as a pre-uploaded device scalar: passing a python
    int to the jitted slot program costs one tiny H2D per call on the
    tunnelled backend; the index values cycle, so cache the uploads."""
    return jnp.asarray(k, dtype=jnp.int32)


# Slot-context device arrays are tiny and keyed by hashable frozen configs;
# caching the upload avoids one H2D transfer per PDU per slot (slot indices
# cycle, so the cache is bounded).
@functools.lru_cache(maxsize=4096)
def _dev(kind: str, cfg) -> tuple:
    """Slot-context arrays, computed on HOST and uploaded once per distinct
    (kind, cfg): sequence VALUES (pilots/weights), not c_init seeds — the
    device programs then contain zero Gold/trig ops on the slot-varying
    path.  Slot indices cycle, so the cache amortizes to zero host work.
    Complex values upload as float32 planes + on-device combine
    (utils/transfer): a complex64 h2d permanently breaks the tunnel's
    d2h path (measured r5)."""
    if kind == "ssb":
        return tuple(_dputc(x) for x in ssb_mod.slot_ctx_for(cfg))
    if kind == "pdcch":
        return _dputc(pdcch_mod.dmrs_values_for(cfg))
    if kind == "pdsch":
        return _dputc(dmrs_mod.pilot_values_for(pdsch_mod.dmrs_config(cfg)))
    if kind == "pm":
        # Per-PRG precoding matrices resolved through the codebook
        # repository (precoding_matrix_repository.cpp analogue): PM indices
        # enter via slot CONTEXT, not the jit key — a PMI change costs one
        # cached upload, never a recompile.  cfg = (nof_ports, PrecodingConfig).
        nof_ports, pre = cfg
        if pre is None:
            return None
        return _dputc(precoding_codebooks.resolve_matrices(
            nof_ports, pre))
    if kind == "ptrs":
        if cfg.ptrs is None:
            return None
        pc = ptrs_prs_mod.PtrsConfig(
            rb_start=cfg.rb_start, rb_count=cfg.rb_count,
            first_symbol=cfg.first_symbol, nof_symbols=cfg.nof_symbols,
            dmrs_symbols=cfg.dmrs_symbols, time_density=cfg.ptrs.time_density,
            freq_density=cfg.ptrs.freq_density, re_offset=cfg.ptrs.re_offset,
            port=cfg.ptrs.port, scrambling_id=cfg.dmrs_scrambling_id,
            n_scid=cfg.n_scid, slot_in_frame=cfg.slot_in_frame)
        return _dputc(ptrs_prs_mod.ptrs_values_for(pc))
    if kind == "csi":
        return _dputc(csi_rs_mod.seq_values_for(cfg))
    if kind == "prs":
        return _dputc(ptrs_prs_mod.prs_values_for(cfg))
    if kind == "pusch":
        return _dputc(dmrs_mod.pilot_values_for(pusch_mod.dmrs_config(cfg)))
    if kind == "f0":
        return _dputc(pucch_mod.f0_refs_for(cfg))
    if kind == "f1":        # cfg = (common, users)
        return tuple(tuple(_dputc(w) for w in hop)
                     for hop in pucch_mod.f1_batch_weights(cfg[0], cfg[1]))
    if kind == "f2":
        return _dputc(pucch_mod.f2_pilot_values_for(cfg))
    if kind == "f3":
        return _dputc(pucch_mod.f3_dmrs_values_for(cfg))
    raise KeyError(kind)


def _norm_pdsch(c):
    """PDSCH jit-key normalization: clear the slot index AND the per-PRG
    PM indices (keep the PRG structure — prg_size and count shape the
    compiled index plan; the matrix VALUES are traced context)."""
    pre = c.precoding
    if pre is not None:
        pre = dataclasses.replace(
            pre, pm_indices=(0,) * len(pre.pm_indices))
    return _norm(c, slot_in_frame=0, precoding=pre)


def normalize_dl_plan(dl: DlTtiRequest, extra_pdcch: tuple = (),
                      nof_ports: int | None = None):
    """Slot-invariant plan key + the slot context arrays for this slot.

    extra_pdcch: PDCCH PDUs from a ul_dci_request for the same slot — the
    reference routes both through the same PDCCH processor
    (fapi_to_phy_translator.cpp:629).
    nof_ports: cell TX ports, needed to resolve PDSCH precoding PM indices
    through the codebook repository (required when any PDU sets precoding).
    """
    pdcch_all = dl.pdcch + tuple(extra_pdcch)
    ssb_n = tuple(_norm(c, sfn=0, hrf=False) for c in dl.ssb)
    pdcch_n = tuple(_norm(c, slot_in_frame=0) for c in pdcch_all)
    pdsch_n = tuple(_norm_pdsch(c) for c in dl.pdsch)
    csi_n = tuple(_norm(c, slot_in_frame=0) for c in dl.csi_rs)
    prs_n = tuple(_norm(c, slot_in_frame=0) for c in dl.prs)
    if nof_ports is None and any(c.precoding is not None for c in dl.pdsch):
        raise ValueError(
            "normalize_dl_plan needs nof_ports to resolve PDSCH precoding")
    ctx = {
        "ssb": tuple(_dev("ssb", c) for c in dl.ssb),
        "pdcch": tuple(_dev("pdcch", c) for c in pdcch_all),
        "pdsch": tuple(_dev("pdsch", c) for c in dl.pdsch),
        "ptrs": tuple(_dev("ptrs", c) for c in dl.pdsch),
        "pm": tuple(_dev("pm", (nof_ports, c.precoding))
                    for c in dl.pdsch),
        "csi": tuple(_dev("csi", c) for c in dl.csi_rs),
        "prs": tuple(_dev("prs", c) for c in dl.prs),
    }
    return (ssb_n, pdcch_n, pdsch_n, csi_n, prs_n), ctx


def normalize_ul_plan(ul: UlTtiRequest):
    pusch_n = tuple(_norm(c, slot_in_frame=0) for c in ul.pusch)
    f0_n = tuple(_norm(c, slot=0) for c in ul.pucch_f0)
    f1_n = tuple(_norm(c, slot=0) for c in ul.pucch_f1)
    f2_n = tuple(_norm(c, slot=0) for c in ul.pucch_f2)
    f34 = ul.pucch_f3 + ul.pucch_f4
    f34_n = tuple(_norm(c, slot=0) for c in f34)
    # F1 weights are per occasion GROUP (the slot program batch-detects all
    # users multiplexed on a PRB) — group exactly like ul_slot_core and
    # place the group's weight tuple at the first member's index.
    f1_groups: dict = {}
    for i, c in enumerate(ul.pucch_f1):
        key = (c.prb, c.start_symbol, c.nof_symbols, c.n_id, c.slot,
               c.second_hop_prb)
        f1_groups.setdefault(key, []).append(i)
    f1_ctx: list = [None] * len(ul.pucch_f1)
    for idxs in f1_groups.values():
        common = ul.pucch_f1[idxs[0]]
        users = tuple((ul.pucch_f1[i].initial_cyclic_shift,
                       ul.pucch_f1[i].time_domain_occ,
                       ul.pucch_f1[i].nof_harq_bits) for i in idxs)
        f1_ctx[idxs[0]] = _dev("f1", (common, users))
    ctx = {
        "pusch": tuple(_dev("pusch", c) for c in ul.pusch),
        "f0": tuple(_dev("f0", c) for c in ul.pucch_f0),
        "f1": tuple(f1_ctx),
        "f2": tuple(_dev("f2", c) for c in ul.pucch_f2),
        "f3": tuple(_dev("f3", c) for c in f34),
    }
    return (pusch_n, f0_n, f1_n, f2_n, ul.prach, ul.srs, f34_n), ctx


class HarqBufferPool:
    """Soft-combining buffer pool keyed by (rnti, harq_id)."""

    def __init__(self):
        self._bufs = {}
        self._zeros = {}     # immutable zero buffers, reused per shape

    def get(self, rnti: int, harq_id: int, shape, new_data: bool):
        key = (rnti, harq_id)
        if new_data or key not in self._bufs:
            if shape not in self._zeros:
                self._zeros[shape] = jnp.zeros(shape, dtype=jnp.float32)
            return self._zeros[shape]
        return self._bufs[key]

    def put(self, rnti: int, harq_id: int, buf):
        self._bufs[(rnti, harq_id)] = buf

    def release(self, rnti: int, harq_id: int):
        self._bufs.pop((rnti, harq_id), None)


@dataclasses.dataclass
class PendingSlotResults:
    """Device-side UL slot results: resolve() decodes them on host.

    Between process_ul and resolve there is NO device->host traffic; the
    caller keeps a small queue of these and resolves slots a few ticks
    behind the launch front (HARQ ids do not recycle that fast).
    """

    ul_tti: UlTtiRequest
    harq_meta: tuple
    scalars: jnp.ndarray            # packed f32 vector (static layout)
    payload: jnp.ndarray            # packed int8 tb bits of all PUSCH PDUs
    new_softs: tuple                # device arrays, one per PUSCH PDU
    conductor: "SlotConductor"

    def block_until_ready(self):
        self.scalars.block_until_ready()
        return self

    def resolve(self) -> SlotResults:
        # Resolve is the conductor's host sync point: surface any queued
        # checkify sanitizer errors here (utils/sanitize.py deferred-report
        # design) so SRSRAN_TPU_SANITIZE=1 actually reports in production.
        sanitize.drain()
        return self.conductor._decode(self)


@dataclasses.dataclass
class PendingSlotBatch:
    """Device-side results of a SLOT-BATCHED step (process_slot_batch):
    resolve() pulls the whole batch with ONE d2h per array and decodes
    each slot's indications."""

    slots: list              # [(ul_tti, harq_meta)] in batch order
    scalars: jnp.ndarray     # [B, S]
    payload: jnp.ndarray     # [B, G]
    new_softs: tuple         # each [B, ...]
    conductor: "SlotConductor"

    def block_until_ready(self):
        self.scalars.block_until_ready()
        return self

    def resolve(self) -> list:
        sanitize.drain()
        s = np.asarray(self.scalars)
        pay = np.asarray(self.payload)
        out = []
        for i, (ul_tti, harq_meta) in enumerate(self.slots):
            pend = PendingSlotResults(
                ul_tti=ul_tti, harq_meta=harq_meta, scalars=s[i],
                payload=pay[i],
                new_softs=tuple(ns[i] for ns in self.new_softs),
                conductor=self.conductor)
            out.append(self.conductor._decode(pend))
        return out


def pack_ul_results(out: dict) -> tuple:
    """Flatten every per-PDU result into one f32 vector + one int8 vector.

    Runs INSIDE the jitted UL slot program: XLA fuses the concatenation,
    and the conductor's resolve() needs exactly two d2h copies per slot
    (the analogue of the reference packing results into FAPI indication
    structs before crossing the MAC boundary).
    Layout per PDU type (static given the slot plan):
      pusch: [crc_ok, ta_s, cfo_hz, evm, iters,
              snr[P], rsrp[P], epre[P]]   (P = rx ports)
             then optional [ack_valid, ack_bits...], [csi1_valid, bits...],
             [csi2_valid, bits...]
      f0/f1: [detected, metric, harq bits...]
      f2/f3: [valid, metric, uci bits...]
      prach: [detected[64], metrics[64], ta_s[64], rssi]
      srs:   [ta_s, snr, re(h)..., im(h)...]
    """
    parts = []

    def scal(*xs):
        for x in xs:
            parts.append(jnp.ravel(jnp.asarray(x, jnp.float32)))

    for r in out["pusch"]:
        scal(r["tb_crc_ok"], r["ta_s"], r["cfo_hz"], r["evm"],
             r["nof_iterations"], r["snr"], r["rsrp"], r["epre"])
        for k in ("harq_ack", "csi1", "csi2"):
            v, b = r.get(f"{k}_valid"), r.get(f"{k}_bits")
            if b is not None:
                scal(v, b)
    for r in out["pucch_f0"]:
        scal(r["detected"], r["metric"], r["sr_bit"], r["harq_bits"])
    for r in out["pucch_f1"]:
        scal(r["detected"], r["metric"], r["harq_bits"])
    for r in out["pucch_f2"]:
        scal(r["valid"], r["metric"], r["uci_bits"])
    for r in out["pucch_f3"]:
        scal(r["valid"], r["metric"], r["uci_bits"])
    for r in out["prach"]:
        scal(r["detected"], r["metrics"], r["ta_s"], r["rssi"])
    for r in out["srs"]:
        scal(r["ta_s"], jnp.mean(r["snr"]), jnp.real(r["wideband_h"]),
             jnp.imag(r["wideband_h"]))
    scalars = (jnp.concatenate(parts) if parts
               else jnp.zeros(0, jnp.float32))
    pay = [r["tb_bits"].astype(jnp.int8) for r in out["pusch"]]
    payload = jnp.concatenate(pay) if pay else jnp.zeros(0, jnp.int8)
    return scalars, payload


def _dl_payload_layout(dl_plan, n_ssb: int, n_pdcch: int, n_pdsch: int):
    """Static (offset, nof_bytes, nof_bits) per payload in blob order
    (mib..., dci..., sch...) for the fused single-H2D payload blob.

    The blob is the TPU-side analogue of the reference's tx_data.request TLV
    byte buffers (include/srsran/fapi/messages/tx_data_request.h): ONE
    packed-byte transfer per slot instead of one bit-per-int8 array per PDU
    (the axon tunnel charges ~140 us base latency per transfer and the
    bit-per-byte encoding is 8x the wire size — measured 747 us for the
    flagship TB vs 155 us packed)."""
    _, pdcch_cfgs, pdsch_cfgs, _, _ = dl_plan
    segs = []
    off = 0
    for _ in range(n_ssb):
        segs.append((off, 3, 24))               # MIB is 24 bits
        off += 3
    for cfg in pdcch_cfgs:
        nb = (cfg.payload_bits + 7) // 8
        segs.append((off, nb, cfg.payload_bits))
        off += nb
    for cfg in pdsch_cfgs:
        nb = (cfg.tbs + 7) // 8
        segs.append((off, nb, cfg.tbs))
        off += nb
    return tuple(segs), max(off, 1)


def pack_payload_blob(layout, payloads) -> np.ndarray:
    """Host-side: concatenate payloads into one packed uint8 blob.

    Each payload may be packed bytes (uint8, len == nof_bytes — the FAPI
    wire format, preferred) or unpacked bits (0/1 per element, len ==
    nof_bits — packed here via np.packbits, MSB first)."""
    segs, total = layout
    assert len(payloads) == len(segs), \
        f"payload count {len(payloads)} != plan's {len(segs)}"
    blob = np.zeros(total, np.uint8)
    for (off, nb, n_bits), p in zip(segs, payloads):
        a = np.asarray(p)
        if a.size == nb and n_bits != nb:
            blob[off:off + nb] = a.astype(np.uint8, copy=False)
        elif a.size == n_bits:
            blob[off:off + nb] = np.packbits(a.astype(np.uint8, copy=False))
        else:
            from .validators import ValidationError
            raise ValidationError(
                f"payload size {a.size} matches neither {n_bits} bits "
                f"nor {nb} packed bytes")
    return blob


@functools.lru_cache(maxsize=None)
def _packed_dl_fn(cell: CellConfig, plan, slot_in_subframe: int,
                  return_grid: bool):
    """Jitted DL slot program taking ONE packed payload blob: unpack the
    bits on device (a fused shift/mask — free next to the slot's matmuls)
    and run dl_slot_core."""
    from ..phy.slot_programs import dl_slot_core
    if len(plan) == 4:
        plan = plan + ((),)
    n_ssb, n_pdcch, n_pdsch = len(plan[0]), len(plan[1]), len(plan[2])
    segs, _ = _dl_payload_layout(plan, n_ssb, n_pdcch, n_pdsch)
    core = dl_slot_core(cell, plan, slot_in_subframe)
    # numpy (not jnp) so tracing embeds it as a literal without a d2h fetch
    shifts = np.arange(7, -1, -1, dtype=np.uint8)

    def unpack(blob, seg):
        off, nb, n_bits = seg
        b = jax.lax.slice(blob, (off,), (off + nb,))
        bits = ((b[:, None] >> shifts) & 1).astype(jnp.int8)
        return bits.reshape(-1)[:n_bits]

    def run(blob, ctx=None):
        it = iter(segs)
        mib = tuple(unpack(blob, next(it)) for _ in range(n_ssb))
        dci = tuple(unpack(blob, next(it)) for _ in range(n_pdcch))
        sch = tuple(unpack(blob, next(it)) for _ in range(n_pdsch))
        samples, grid = core(mib, dci, sch, ctx)
        return (samples, grid) if return_grid else samples

    return jax.jit(run)


def _slot_run_core(cell: CellConfig, dl_plan, ul_plan,
                   slot_in_subframe: int, stride: int):
    """Un-jitted full DL+UL slot step taking the payload blob from a
    staged multi-slot device buffer (shared by the per-slot jit and the
    vmapped slot-batch throughput mode)."""
    from ..phy.slot_programs import dl_slot_core, ul_slot_core
    if len(dl_plan) == 4:
        dl_plan = dl_plan + ((),)
    n_ssb, n_pdcch, n_pdsch = (len(dl_plan[0]), len(dl_plan[1]),
                               len(dl_plan[2]))
    segs, total = _dl_payload_layout(dl_plan, n_ssb, n_pdcch, n_pdsch)
    assert total <= stride, f"payload layout {total} exceeds stride {stride}"
    dl_core = dl_slot_core(cell, dl_plan, slot_in_subframe)
    ul_core = ul_slot_core(cell, ul_plan, slot_in_subframe)
    shifts = np.arange(7, -1, -1, dtype=np.uint8)

    def run(staged_buf, k, rx_samples, prach_fd, soft_buffers, dl_ctx,
            ul_ctx):
        blob = jax.lax.dynamic_slice(staged_buf, (k * stride,), (total,))

        def unpack(seg):
            off, nb, n_bits = seg
            b = jax.lax.slice(blob, (off,), (off + nb,))
            bits = ((b[:, None] >> shifts) & 1).astype(jnp.int8)
            return bits.reshape(-1)[:n_bits]

        it = iter(segs)
        mib = tuple(unpack(next(it)) for _ in range(n_ssb))
        dci = tuple(unpack(next(it)) for _ in range(n_pdcch))
        sch = tuple(unpack(next(it)) for _ in range(n_pdsch))
        tx_samples, _ = dl_core(mib, dci, sch, dl_ctx)
        out = ul_core(rx_samples, prach_fd, soft_buffers, ul_ctx)
        scalars, payload = pack_ul_results(out)
        new_softs = tuple(r["new_soft"] for r in out["pusch"])
        return tx_samples, scalars, payload, new_softs

    return run


@functools.lru_cache(maxsize=None)
def _packed_slot_fn(cell: CellConfig, dl_plan, ul_plan, slot_in_subframe: int,
                    stride: int):
    """ONE jitted program for a full DL+UL slot taking the payload blob from
    a staged multi-slot device buffer: a single tunnel dispatch per slot
    (vs separate DL and UL dispatches) and a payload H2D amortized over the
    staging depth.  XLA also overlaps the independent DL and UL compute.

    stride: byte stride between slots in the staged buffer (static).
    """
    return jax.jit(_slot_run_core(cell, dl_plan, ul_plan, slot_in_subframe,
                                  stride))


def _stack_ctx(ctxs):
    """Per-slot slot-context pytrees -> (batched_ctx, vmap in_axes tree).

    Arrays that DIFFER across the batch stack on a new leading axis
    (mapped, axis 0); leaves shared by every slot stay unmapped (None) —
    the slot-varying pilot values map, the static plan context broadcasts.
    None entries are empty pytree nodes and pass through untouched.
    """
    flat0, treedef = jax.tree_util.tree_flatten(ctxs[0])
    flats = [jax.tree_util.tree_flatten(c)[0] for c in ctxs]
    for c in ctxs[1:]:
        assert jax.tree_util.tree_structure(c) == treedef, \
            "slot-batch requires identical slot-context structure"
    leaves, axes = [], []
    for group in zip(*flats):
        if all(g is group[0] for g in group):
            leaves.append(group[0])
            axes.append(None)
        else:
            leaves.append(_stacker()(list(group)))
            axes.append(0)
    return (jax.tree_util.tree_unflatten(treedef, leaves),
            jax.tree_util.tree_unflatten(treedef, axes))


@functools.lru_cache(maxsize=1)
def _stacker():
    """Jitted stack: ctx arrays can be complex64 and EAGER complex ops
    are fatal on the tunnel backend (utils/transfer)."""
    return jax.jit(lambda xs: jnp.stack(xs, axis=0))


@functools.lru_cache(maxsize=64)
def _ks_dev(b: int):
    return jnp.arange(b, dtype=jnp.int32)


@dataclasses.dataclass
class StagedPayloads:
    """Device-resident payload blobs for several upcoming slots: ONE fused
    H2D transfer for the whole group (the MAC runs up to
    max_processing_delay_slots=5 ahead of the PHY in the reference,
    du_low_config.h:40, so TB payloads for the next few slots are available
    to stage together)."""

    buf: jnp.ndarray        # uint8 [depth * stride]
    stride: int
    depth: int


@dataclasses.dataclass
class _SlotPhase:
    fn: object
    dl_ctx: dict
    ul_ctx: dict
    layout: tuple
    n_payloads: tuple
    soft_shapes: tuple


@dataclasses.dataclass
class _DlPhase:
    """Per-slot-phase resolved state: validated plan, device slot context,
    compiled program, payload blob layout (the analogue of the reference
    translator's per-slot pre-resolved processors,
    fapi_to_phy_translator.cpp:333)."""

    fn: object
    ctx: dict
    layout: tuple
    n_payloads: tuple       # (n_ssb, n_pdcch_incl_uldci, n_pdsch)


@dataclasses.dataclass
class _UlPhase:
    fn: object
    ctx: dict
    soft_shapes: tuple


class SlotConductor:
    """One cell's PHY driver.  Thread-free: slot pipelining comes from JAX's
    async dispatch (launch slot N+1 while N still runs on device).

    Per-slot-phase resolution (validation, plan normalization, slot-context
    upload, program compilation, payload layout) is memoized in a phase
    cache keyed by the request's PDU tuple — repeat slots cost one dict
    lookup + one fused H2D + one jit dispatch, like the reference translator
    reusing its pre-built slot processors (fapi_to_phy_translator.cpp:333).
    The cache is bounded: slot-varying fields cycle (slot-in-frame mod 20,
    SSB sfn mod 1024)."""

    def __init__(self, cell: CellConfig, validate: bool = True,
                 pcap=None):
        self.cell = cell
        self.harq_pool = HarqBufferPool()
        self.validate = validate
        # optional utils.pcap.FapiPcap: capture slot messages + indications
        # (the reference's FAPI logging decorator / pcap writers)
        self.pcap = pcap
        self._dl_phases: dict = {}
        self._ul_phases: dict = {}
        self._slot_phases: dict = {}
        self._batch_fns: dict = {}

    # ---------------------------------------------------------------- DL

    def _resolve_dl_phase(self, dl_tti, ul_dci, slot_in_sf,
                          return_grid) -> _DlPhase:
        if self.validate:
            from .validators import validate_dl_tti, validate_ul_dci
            validate_dl_tti(dl_tti, self.cell)
            if ul_dci is not None:
                validate_ul_dci(ul_dci, self.cell)
        extra = ul_dci.pdcch if ul_dci is not None else ()
        plan, ctx = normalize_dl_plan(dl_tti, extra,
                                      self.cell.nof_ports)
        fn = _packed_dl_fn(self.cell, plan, slot_in_sf, return_grid)
        layout = _dl_payload_layout(
            (dl_tti.ssb, dl_tti.pdcch + tuple(extra), dl_tti.pdsch, (), ()),
            len(dl_tti.ssb), len(dl_tti.pdcch) + len(extra),
            len(dl_tti.pdsch))
        return _DlPhase(fn=fn, ctx=ctx, layout=layout,
                        n_payloads=(len(dl_tti.ssb),
                                    len(dl_tti.pdcch) + len(extra),
                                    len(dl_tti.pdsch)))

    def process_dl(self, dl_tti: DlTtiRequest, tx_data: TxDataRequest,
                   ul_dci: UlDciRequest | None = None,
                   return_grid: bool = True):
        """Returns (samples [P, T] device array, grid) — async futures.
        With return_grid=False (split-8 radio path) the compiled program
        emits samples only, skipping the grid HBM materialization; returns
        (samples, None).

        The jitted program is keyed on a slot-invariant plan; slot-varying
        scrambling values enter as cached device context (so one compile
        serves all slots — the analogue of the reference's per-slot
        processor reuse).  ul_dci PDUs (UL grants) transmit through the same
        PDCCH path.  Payloads (MIB/DCI/TB) may be packed bytes (the FAPI
        wire format, preferred — len == ceil(bits/8)) or unpacked 0/1 bit
        arrays; all of a slot's payloads ride ONE fused H2D transfer.
        """
        slot_in_sf = dl_tti.slot.subframe_slot_index
        key = (dl_tti.plan_key(),
               ul_dci.pdcch if ul_dci is not None else (),
               slot_in_sf, return_grid)
        phase = self._dl_phases.get(key)
        if phase is None:
            phase = self._resolve_dl_phase(dl_tti, ul_dci, slot_in_sf,
                                           return_grid)
            self._dl_phases[key] = phase
        if self.validate:
            n_ssb, n_pdcch, n_pdsch = phase.n_payloads
            from .validators import ValidationError
            if (len(tx_data.ssb_mib) != n_ssb
                    or len(tx_data.pdcch_payloads)
                    + (len(ul_dci.payloads) if ul_dci else 0) != n_pdcch
                    or len(tx_data.pdsch_payloads) != n_pdsch):
                raise ValidationError(
                    "tx_data: payload counts do not match the dl_tti/ul_dci "
                    f"PDUs ({len(tx_data.ssb_mib)}/"
                    f"{len(tx_data.pdcch_payloads)}/"
                    f"{len(tx_data.pdsch_payloads)} vs "
                    f"{n_ssb}/{n_pdcch}/{n_pdsch})")
        if self.pcap is not None:
            self.pcap.capture("dl_tti", dl_tti)
            self.pcap.capture("tx_data", tx_data)
        payloads = (tuple(tx_data.ssb_mib) + tuple(tx_data.pdcch_payloads)
                    + (tuple(ul_dci.payloads) if ul_dci is not None else ())
                    + tuple(tx_data.pdsch_payloads))
        blob = jnp.asarray(pack_payload_blob(phase.layout, payloads))
        out = phase.fn(blob, phase.ctx)
        if not return_grid:
            return out, None
        return out

    # ----------------------------------------------------- fused slot path

    def payload_layout(self, dl_tti: DlTtiRequest,
                       ul_dci: UlDciRequest | None = None):
        """(segments, total_bytes) of the slot's payload blob."""
        extra = ul_dci.pdcch if ul_dci is not None else ()
        return _dl_payload_layout(
            (dl_tti.ssb, dl_tti.pdcch + tuple(extra), dl_tti.pdsch, (), ()),
            len(dl_tti.ssb), len(dl_tti.pdcch) + len(extra),
            len(dl_tti.pdsch))

    def stage_payloads(self, slots, stride: int | None = None
                       ) -> StagedPayloads:
        """One fused H2D for several slots' payloads.

        slots: sequence of (dl_tti, tx_data[, ul_dci]) tuples for upcoming
        slots.  stride: byte stride per slot (>= every slot's layout total);
        pass a fixed value so one compiled program serves every staging
        group (default: the max layout total of this group).
        """
        entries = []
        for s in slots:
            dl_tti, tx_data = s[0], s[1]
            ul_dci = s[2] if len(s) > 2 else None
            layout = self.payload_layout(dl_tti, ul_dci)
            payloads = (tuple(tx_data.ssb_mib)
                        + tuple(tx_data.pdcch_payloads)
                        + (tuple(ul_dci.payloads) if ul_dci else ())
                        + tuple(tx_data.pdsch_payloads))
            entries.append((layout, payloads))
        if stride is None:
            stride = max(lay[1] for lay, _ in entries)
        buf = np.zeros(len(entries) * stride, np.uint8)
        for k, (layout, payloads) in enumerate(entries):
            if layout[1] > stride:
                from .validators import ValidationError
                raise ValidationError(
                    f"slot payload blob {layout[1]} B exceeds stride {stride}")
            buf[k * stride:k * stride + layout[1]] = \
                pack_payload_blob(layout, payloads)
        # device_put is an ASYNC enqueue (jnp.asarray may sync): the launch
        # loop keeps running while the payload blob rides the wire.
        return StagedPayloads(buf=jax.device_put(buf), stride=stride,
                              depth=len(entries))

    def process_slot(self, dl_tti: DlTtiRequest, ul_tti: UlTtiRequest,
                     staged: StagedPayloads, k: int, rx_samples,
                     ul_dci: UlDciRequest | None = None, prach_fd=()):
        """Full DL+UL slot in ONE device dispatch, payloads pre-staged.

        Returns (tx_samples, PendingSlotResults).  The lowest-overhead
        deployment path: per slot it costs one dict lookup, one dispatch,
        and 1/depth of a payload transfer (the analogue of the reference
        translator's slot handling, fapi_to_phy_translator.cpp:333, which
        likewise resolves pre-built processors per slot).
        """
        slot_in_sf = dl_tti.slot.subframe_slot_index
        key = (dl_tti.plan_key(),
               ul_dci.pdcch if ul_dci is not None else (),
               ul_tti.plan_key(), slot_in_sf, staged.stride)
        phase = self._slot_phases.get(key)
        if phase is None:
            dl_phase = self._resolve_dl_phase(dl_tti, ul_dci, slot_in_sf,
                                              False)
            ul_phase = self._resolve_ul_phase(ul_tti, slot_in_sf)
            extra = ul_dci.pdcch if ul_dci is not None else ()
            dl_plan, _ = normalize_dl_plan(dl_tti, extra,
                                           self.cell.nof_ports)
            ul_plan, _ = normalize_ul_plan(ul_tti)
            fn = _packed_slot_fn(self.cell, dl_plan, ul_plan, slot_in_sf,
                                 staged.stride)
            phase = _SlotPhase(fn=fn, dl_ctx=dl_phase.ctx,
                               ul_ctx=ul_phase.ctx, layout=dl_phase.layout,
                               n_payloads=dl_phase.n_payloads,
                               soft_shapes=ul_phase.soft_shapes)
            self._slot_phases[key] = phase
        if self.pcap is not None:
            self.pcap.capture("dl_tti", dl_tti)
            self.pcap.capture("ul_tti", ul_tti)
        harq_meta = ul_tti.pusch_harq or tuple((0, True) for _ in ul_tti.pusch)
        softs = tuple(
            self.harq_pool.get(c.rnti, hid, shape, new)
            for c, shape, (hid, new) in zip(ul_tti.pusch, phase.soft_shapes,
                                            harq_meta))
        tx_samples, scalars, payload, new_softs = phase.fn(
            staged.buf, _k_dev(k), rx_samples, tuple(prach_fd), softs,
            phase.dl_ctx, phase.ul_ctx)
        return tx_samples, PendingSlotResults(
            ul_tti=ul_tti, harq_meta=harq_meta, scalars=scalars,
            payload=payload, new_softs=new_softs, conductor=self)

    def process_slot_batch(self, slots, staged: "StagedPayloads",
                           rx_batch, prach_fd=()):
        """SLOT-BATCHED throughput mode: B same-phase slots in ONE
        vmapped dispatch (tools/bench_slot_batch measured 114 -> 27
        us/slot at B=4 on the tunnel; B extra slots of latency sits
        inside the reference's max_processing_delay_slots=5 pipeline,
        du_low_config.h:40).

        slots: list of (dl_tti, ul_tti[, ul_dci]) sharing the normalized
        DL/UL plans and subframe_slot_index; slot i's payloads must be
        staged at index i of ``staged``.  rx_batch: [B, P, T].
        Returns (tx_samples [B, P, T], PendingSlotBatch).
        """
        assert slots and staged.depth >= len(slots)
        sif = slots[0][0].slot.subframe_slot_index
        # batch PHASE cache (the process_slot pattern): validation,
        # normalization, slot-context stacking and compilation happen once
        # per distinct batch of slot phases — per call only HARQ buffer
        # gets, one soft-buffer stack and one dispatch remain (the r5
        # first-cut re-normalized per call and cost 250 us/slot of host
        # python, 3x the whole device step)
        key = (tuple((s[0].plan_key(),
                      (s[2].pdcch if len(s) > 2 else ()),
                      s[1].plan_key()) for s in slots),
               sif, staged.stride)
        ph = self._batch_fns.get(key)
        if ph is None:
            dl_ctxs, ul_ctxs = [], []
            dl_plan = ul_plan = None
            for s in slots:
                dl_tti, ul_tti = s[0], s[1]
                ul_dci = s[2] if len(s) > 2 else None
                assert dl_tti.slot.subframe_slot_index == sif, \
                    "slot batch must share subframe_slot_index (CP layout)"
                if self.validate:
                    from .validators import (validate_dl_tti,
                                             validate_ul_tti)
                    validate_dl_tti(dl_tti, self.cell)
                    validate_ul_tti(ul_tti, self.cell)
                extra = ul_dci.pdcch if ul_dci is not None else ()
                plan_d, ctx_d = normalize_dl_plan(dl_tti, extra,
                                                  self.cell.nof_ports)
                plan_u, ctx_u = normalize_ul_plan(ul_tti)
                if dl_plan is None:
                    dl_plan, ul_plan = plan_d, plan_u
                else:
                    assert (plan_d, plan_u) == (dl_plan, ul_plan), \
                        "slot batch must share the normalized DL/UL plans"
                dl_ctxs.append(ctx_d)
                ul_ctxs.append(ctx_u)
            dl_ctx_b, dl_axes = _stack_ctx(dl_ctxs)
            ul_ctx_b, ul_axes = _stack_ctx(ul_ctxs)
            core = _slot_run_core(self.cell, dl_plan, ul_plan, sif,
                                  staged.stride)
            fn = jax.jit(jax.vmap(
                core, in_axes=(None, 0, 0, None, 0, dl_axes, ul_axes)))
            shapes = tuple(tuple(self._pusch_soft_shape(c)
                                 for c in s[1].pusch) for s in slots)
            ph = (fn, dl_ctx_b, ul_ctx_b, shapes)
            self._batch_fns[key] = ph
        fn, dl_ctx_b, ul_ctx_b, shapes = ph
        harq_metas, softs_rows = [], []
        for s, row_shapes in zip(slots, shapes):
            ul_tti = s[1]
            harq_meta = ul_tti.pusch_harq or tuple(
                (0, True) for _ in ul_tti.pusch)
            harq_metas.append(harq_meta)
            softs_rows.append(tuple(
                self.harq_pool.get(c.rnti, hid, shape, new)
                for c, shape, (hid, new) in zip(ul_tti.pusch, row_shapes,
                                                harq_meta)))
        softs_b = tuple(
            _stacker()([row[i] for row in softs_rows])
            for i in range(len(softs_rows[0]))) if softs_rows[0] else ()
        tx, scalars, payload, new_softs = fn(
            staged.buf, _ks_dev(len(slots)), rx_batch, tuple(prach_fd),
            softs_b, dl_ctx_b, ul_ctx_b)
        pend = PendingSlotBatch(
            slots=[(s[1], m) for s, m in zip(slots, harq_metas)],
            scalars=scalars, payload=payload, new_softs=new_softs,
            conductor=self)
        return tx, pend

    # ---------------------------------------------------------------- UL

    def _pusch_soft_shape(self, cfg):
        bg = select_base_graph(cfg.tbs, cfg.target_code_rate)
        seg = segment_tb(cfg.tbs, bg)
        return (seg.nof_codeblocks, seg.codeword_bits)

    def _resolve_ul_phase(self, ul_tti, slot_in_sf) -> _UlPhase:
        if self.validate:
            from .validators import validate_ul_tti
            validate_ul_tti(ul_tti, self.cell)
        plan, ctx = normalize_ul_plan(ul_tti)
        fn = _packed_ul_fn(self.cell, plan, slot_in_sf)
        shapes = tuple(self._pusch_soft_shape(c) for c in ul_tti.pusch)
        return _UlPhase(fn=fn, ctx=ctx, soft_shapes=shapes)

    def process_ul(self, ul_tti: UlTtiRequest, samples,
                   prach_fd=()) -> PendingSlotResults:
        """Launch the UL slot program; returns device-side pending results.

        Copy-free: nothing here blocks on or copies from the device.  Call
        .resolve() on the returned object (ideally a few slots later) to
        decode indications; HARQ soft buffers are stored/released there.
        """
        slot_in_sf = ul_tti.slot.subframe_slot_index
        key = (ul_tti.plan_key(), slot_in_sf)
        phase = self._ul_phases.get(key)
        if phase is None:
            phase = self._resolve_ul_phase(ul_tti, slot_in_sf)
            self._ul_phases[key] = phase
        if self.validate and ul_tti.pusch_harq:
            from .validators import ValidationError
            if len(ul_tti.pusch_harq) != len(ul_tti.pusch):
                raise ValidationError("ul_tti: pusch_harq length mismatch")
        if self.pcap is not None:
            self.pcap.capture("ul_tti", ul_tti)
        harq_meta = ul_tti.pusch_harq or tuple((0, True) for _ in ul_tti.pusch)
        softs = tuple(
            self.harq_pool.get(c.rnti, hid, shape, new)
            for c, shape, (hid, new) in zip(ul_tti.pusch, phase.soft_shapes,
                                            harq_meta))
        scalars, payload, new_softs = phase.fn(samples, tuple(prach_fd),
                                               softs, phase.ctx)
        return PendingSlotResults(ul_tti=ul_tti, harq_meta=harq_meta,
                                  scalars=scalars, payload=payload,
                                  new_softs=new_softs, conductor=self)

    # ------------------------------------------------------- indications

    def _decode(self, pend: PendingSlotResults) -> SlotResults:
        """Host-side indication decoding (the single d2h point)."""
        ul_tti = pend.ul_tti
        s = np.asarray(pend.scalars)
        payload = np.asarray(pend.payload)
        res = SlotResults(slot=ul_tti.slot)
        i = 0          # cursor into s
        p0 = 0         # cursor into payload

        def take(n):
            nonlocal i
            v = s[i:i + n]
            i += n
            return v

        nports = self.cell.nof_ports
        for cfg, (hid, _) in zip(ul_tti.pusch, pend.harq_meta):
            crc_ok, ta, cfo, evm, iters = take(5)
            snr_p, rsrp_p, epre_p = take(nports), take(nports), take(nports)
            ok = bool(crc_ok > 0.5)
            snr_db = float(10 * np.log10(max(float(np.mean(snr_p)), 1e-9)))
            res.crc.append(CrcIndicationPdu(
                rnti=cfg.rnti, tb_crc_ok=ok, timing_advance_s=float(ta),
                snr_db=snr_db, rsrp=float(np.mean(rsrp_p)), cfo_hz=float(cfo),
                evm=float(evm), nof_ldpc_iterations=float(iters),
                snr_port_db=10 * np.log10(np.maximum(snr_p, 1e-9)),
                rsrp_port=rsrp_p.copy(), epre_port=epre_p.copy()))
            u = cfg.uci
            uci_bits = {}
            for name, n_bits in (("harq_ack", u.o_ack), ("csi1", u.o_csi1),
                                 ("csi2", u.o_csi2)):
                if n_bits:
                    v = take(1 + n_bits)
                    uci_bits[name] = (bool(v[0] > 0.5),
                                      (v[1:] > 0.5).astype(np.uint8))
            if uci_bits:
                ack = uci_bits.get("harq_ack", (False, None))
                csi1 = uci_bits.get("csi1", (False, None))
                csi2 = uci_bits.get("csi2", (False, None))
                res.uci.append(UciIndicationPdu(
                    rnti=cfg.rnti, detected=ack[0] or csi1[0],
                    harq_bits=ack[1], csi_bits=csi1[1], metric=1.0,
                    csi2_bits=csi2[1], source="pusch"))
            bits = payload[p0:p0 + cfg.tbs]
            p0 += cfg.tbs
            if ok:
                res.rx_data.append(RxDataIndicationPdu(
                    rnti=cfg.rnti, payload=(bits > 0).astype(np.uint8)))
                self.harq_pool.release(cfg.rnti, hid)
        # HARQ soft-buffer store for failed TBs (device arrays, no copy)
        for cfg, (hid, _), soft, pdu in zip(ul_tti.pusch, pend.harq_meta,
                                            pend.new_softs, res.crc):
            if not pdu.tb_crc_ok:
                self.harq_pool.put(cfg.rnti, hid, soft)
        for cfg in ul_tti.pucch_f0:
            det, metric, sr = take(3)
            bits = (take(cfg.nof_harq_bits) > 0.5).astype(np.uint8)
            res.uci.append(UciIndicationPdu(
                rnti=getattr(cfg, "rnti", 0), detected=bool(det > 0.5),
                harq_bits=bits, csi_bits=None, metric=float(metric),
                sr_bit=int(sr > 0.5)))
        for cfg in ul_tti.pucch_f1:
            det, metric = take(2)
            bits = (take(cfg.nof_harq_bits) > 0.5).astype(np.uint8)
            res.uci.append(UciIndicationPdu(
                rnti=getattr(cfg, "rnti", 0), detected=bool(det > 0.5),
                harq_bits=bits, csi_bits=None, metric=float(metric)))
        for cfg in ul_tti.pucch_f2:
            ok, metric = take(2)
            bits = (take(cfg.nof_uci_bits) > 0.5).astype(np.uint8)
            res.uci.append(UciIndicationPdu(
                rnti=cfg.rnti, detected=bool(ok > 0.5), harq_bits=None,
                csi_bits=bits, metric=float(metric)))
        for cfg in ul_tti.pucch_f3 + ul_tti.pucch_f4:
            ok, metric = take(2)
            bits = (take(cfg.nof_uci_bits) > 0.5).astype(np.uint8)
            res.uci.append(UciIndicationPdu(
                rnti=cfg.rnti, detected=bool(ok > 0.5), harq_bits=None,
                csi_bits=bits, metric=float(metric)))
        for cfg in ul_tti.prach:
            npre = cfg.nof_preambles
            det = take(npre) > 0.5
            mets = take(npre)
            tas = take(npre)
            take(1)  # rssi
            for idx in np.nonzero(det)[0]:
                res.rach.append(RachIndicationPreamble(
                    preamble_index=int(idx), timing_advance_s=float(tas[idx]),
                    metric=float(mets[idx])))
        for cfg in ul_tti.srs:
            ta, snr = take(2)
            n = 2 * self.cell.nof_ports * cfg.nof_ports
            h = take(n)
            wh = (h[:n // 2] + 1j * h[n // 2:]).reshape(
                self.cell.nof_ports, cfg.nof_ports)
            snr_db = float(10 * np.log10(max(float(snr), 1e-9)))
            res.srs.append(SrsIndicationPdu(
                rnti=cfg.rnti, timing_advance_s=float(ta), snr_db=snr_db,
                wideband_h=wh))
        assert i == len(s), f"packed scalar layout mismatch: {i} != {len(s)}"
        if self.pcap is not None:
            self.pcap.capture("slot_results", res)
        return res


@functools.lru_cache(maxsize=None)
def _packed_ul_fn(cell: CellConfig, plan, slot_in_subframe: int = 0):
    """Jitted UL slot program returning (packed scalars, packed payload,
    per-PUSCH soft buffers) — the conductor's copy-free entry point."""
    from ..phy.slot_programs import ul_slot_core
    core = ul_slot_core(cell, plan, slot_in_subframe)

    def run(samples, prach_fd, soft_buffers, ctx=None):
        out = core(samples, prach_fd, soft_buffers, ctx)
        scalars, payload = pack_ul_results(out)
        new_softs = tuple(r["new_soft"] for r in out["pusch"])
        return scalars, payload, new_softs

    return jax.jit(run)
