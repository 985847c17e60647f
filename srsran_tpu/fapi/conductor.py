"""Slot conductor: the host-side engine driving the jitted slot programs.

TPU-native replacement for the reference's executor/notifier machinery
(upper_phy_impl + fapi_to_phy_translator, lib/fapi_adaptor/phy/
fapi_to_phy_translator.cpp:333/534/629/684): FAPI-shaped requests arrive,
the conductor resolves the static slot plan, fetches (or compiles) the slot
program, launches it asynchronously (JAX dispatch is async by nature — the
returned arrays are futures), and converts device results to indication
dataclasses.  HARQ soft buffers live in a pool keyed by (rnti, harq_id),
mirroring rx_buffer_pool_impl.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..phy.slot_programs import CellConfig, dl_slot_fn, ul_slot_fn
from ..phy.upper import ssb as ssb_mod
from ..phy.upper import pdsch as pdsch_mod
from ..phy.upper import pusch as pusch_mod
from ..phy.upper import pdcch as pdcch_mod
from ..phy.upper import pucch as pucch_mod
from ..phy.upper import csi_rs as csi_rs_mod
from ..phy.upper.dmrs import c_inits_for
from ..ran.ldpc_params import segment_tb, select_base_graph
from .messages import (DlTtiRequest, TxDataRequest, UlTtiRequest, SlotResults,
                       CrcIndicationPdu, RxDataIndicationPdu, UciIndicationPdu,
                       RachIndicationPreamble, SrsIndicationPdu)


def _norm(cfg, **zero_fields):
    """dataclasses.replace clearing slot-varying fields from the jit key."""
    return dataclasses.replace(cfg, **zero_fields)


def normalize_dl_plan(dl: DlTtiRequest):
    """Slot-invariant plan key + the slot context arrays for this slot."""
    ssb_n = tuple(_norm(c, sfn=0, hrf=False) for c in dl.ssb)
    pdcch_n = tuple(_norm(c, slot_in_frame=0) for c in dl.pdcch)
    pdsch_n = tuple(_norm(c, slot_in_frame=0) for c in dl.pdsch)
    csi_n = tuple(_norm(c, slot_in_frame=0) for c in dl.csi_rs)
    ctx = {
        "ssb": tuple(
            tuple(jnp.asarray(x) for x in ssb_mod.slot_ctx_for(c))
            for c in dl.ssb),
        "pdcch": tuple(jnp.asarray(pdcch_mod.dmrs_cinits_for(c))
                       for c in dl.pdcch),
        "pdsch": tuple(jnp.asarray(c_inits_for(pdsch_mod.dmrs_config(c)))
                       for c in dl.pdsch),
        "csi": tuple(jnp.asarray(csi_rs_mod.c_init_for(c)) for c in dl.csi_rs),
    }
    return (ssb_n, pdcch_n, pdsch_n, csi_n), ctx


def normalize_ul_plan(ul: UlTtiRequest):
    pusch_n = tuple(_norm(c, slot_in_frame=0) for c in ul.pusch)
    f0_n = tuple(_norm(c, slot=0) for c in ul.pucch_f0)
    f1_n = tuple(_norm(c, slot=0) for c in ul.pucch_f1)
    f2_n = tuple(_norm(c, slot=0) for c in ul.pucch_f2)
    ctx = {
        "pusch": tuple(jnp.asarray(c_inits_for(pusch_mod.dmrs_config(c)))
                       for c in ul.pusch),
        "f0": tuple(jnp.asarray(pucch_mod.ncs_for(c.n_id, c.slot))
                    for c in ul.pucch_f0),
        "f1": tuple(jnp.asarray(pucch_mod.ncs_for(c.n_id, c.slot))
                    for c in ul.pucch_f1),
        "f2": tuple(jnp.asarray(pucch_mod.f2_dmrs_cinits(c))
                    for c in ul.pucch_f2),
    }
    return (pusch_n, f0_n, f1_n, f2_n, ul.prach, ul.srs), ctx


class HarqBufferPool:
    """Soft-combining buffer pool keyed by (rnti, harq_id)."""

    def __init__(self):
        self._bufs = {}

    def get(self, rnti: int, harq_id: int, shape, new_data: bool):
        key = (rnti, harq_id)
        if new_data or key not in self._bufs:
            return jnp.zeros(shape, dtype=jnp.float32)
        return self._bufs[key]

    def put(self, rnti: int, harq_id: int, buf):
        self._bufs[(rnti, harq_id)] = buf

    def release(self, rnti: int, harq_id: int):
        self._bufs.pop((rnti, harq_id), None)


class SlotConductor:
    """One cell's PHY driver.  Thread-free: slot pipelining comes from JAX's
    async dispatch (launch slot N+1 while N still runs on device)."""

    def __init__(self, cell: CellConfig, validate: bool = True,
                 pcap=None):
        self.cell = cell
        self.harq_pool = HarqBufferPool()
        self.validate = validate
        # optional utils.pcap.FapiPcap: capture slot messages + indications
        # (the reference's FAPI logging decorator / pcap writers)
        self.pcap = pcap

    # ---------------------------------------------------------------- DL

    def process_dl(self, dl_tti: DlTtiRequest, tx_data: TxDataRequest):
        """Returns (samples [P, T] device array, grid) — async futures.

        The jitted program is keyed on a slot-invariant plan; slot-varying
        scrambling inits enter as traced inputs (so one compile serves all
        slots — the analogue of the reference's per-slot processor reuse).
        """
        if self.validate:
            from .validators import validate_dl_tti, validate_tx_data
            validate_dl_tti(dl_tti, self.cell)
            validate_tx_data(tx_data, dl_tti)
        if self.pcap is not None:
            self.pcap.capture("dl_tti", dl_tti)
            self.pcap.capture("tx_data", tx_data)
        slot_in_sf = dl_tti.slot.subframe_slot_index
        plan, ctx = normalize_dl_plan(dl_tti)
        fn = dl_slot_fn(self.cell, plan, slot_in_sf)
        mib = tuple(jnp.asarray(np.asarray(m, dtype=np.int8))
                    for m in tx_data.ssb_mib)
        dci = tuple(jnp.asarray(np.asarray(p, dtype=np.int8))
                    for p in tx_data.pdcch_payloads)
        sch = tuple(jnp.asarray(np.asarray(p, dtype=np.int8))
                    for p in tx_data.pdsch_payloads)
        return fn(mib, dci, sch, ctx)

    # ---------------------------------------------------------------- UL

    def _pusch_soft_shape(self, cfg):
        bg = select_base_graph(cfg.tbs, cfg.target_code_rate)
        seg = segment_tb(cfg.tbs, bg)
        return (seg.nof_codeblocks, seg.codeword_bits)

    def process_ul(self, ul_tti: UlTtiRequest, samples,
                   prach_fd=()) -> SlotResults:
        if self.validate:
            from .validators import validate_ul_tti
            validate_ul_tti(ul_tti, self.cell)
        if self.pcap is not None:
            self.pcap.capture("ul_tti", ul_tti)
        slot_in_sf = ul_tti.slot.subframe_slot_index
        plan, ctx = normalize_ul_plan(ul_tti)
        fn = ul_slot_fn(self.cell, plan, slot_in_sf)
        harq_meta = ul_tti.pusch_harq or tuple((0, True) for _ in ul_tti.pusch)
        softs = tuple(
            self.harq_pool.get(c.rnti, hid, self._pusch_soft_shape(c), new)
            for c, (hid, new) in zip(ul_tti.pusch, harq_meta))
        out = fn(samples, tuple(prach_fd), softs, ctx)

        res = SlotResults(slot=ul_tti.slot)
        for cfg, (hid, _), r in zip(ul_tti.pusch, harq_meta, out["pusch"]):
            ok = bool(r["tb_crc_ok"])
            snr_db = float(10 * np.log10(max(float(np.mean(np.asarray(r["snr"]))), 1e-9)))
            res.crc.append(CrcIndicationPdu(
                rnti=cfg.rnti, tb_crc_ok=ok,
                timing_advance_s=float(r["ta_s"]), snr_db=snr_db))
            if ok:
                res.rx_data.append(RxDataIndicationPdu(
                    rnti=cfg.rnti, payload=np.asarray(r["tb_bits"])))
                self.harq_pool.release(cfg.rnti, hid)
            else:
                self.harq_pool.put(cfg.rnti, hid, r["new_soft"])
        for cfg, r in zip(ul_tti.pucch_f0, out["pucch_f0"]):
            res.uci.append(UciIndicationPdu(
                rnti=getattr(cfg, "rnti", 0), detected=bool(r["detected"]),
                harq_bits=np.asarray(r["harq_bits"]), csi_bits=None,
                metric=float(r["metric"])))
        for cfg, r in zip(ul_tti.pucch_f1, out["pucch_f1"]):
            res.uci.append(UciIndicationPdu(
                rnti=getattr(cfg, "rnti", 0), detected=bool(r["detected"]),
                harq_bits=np.asarray(r["harq_bits"]), csi_bits=None,
                metric=float(r["metric"])))
        for cfg, r in zip(ul_tti.pucch_f2, out["pucch_f2"]):
            res.uci.append(UciIndicationPdu(
                rnti=cfg.rnti, detected=bool(r["valid"]), harq_bits=None,
                csi_bits=np.asarray(r["uci_bits"]), metric=float(r["metric"])))
        for cfg, r in zip(ul_tti.prach, out["prach"]):
            det = np.asarray(r["detected"])
            mets = np.asarray(r["metrics"])
            tas = np.asarray(r["ta_s"])
            for idx in np.nonzero(det)[0]:
                res.rach.append(RachIndicationPreamble(
                    preamble_index=int(idx), timing_advance_s=float(tas[idx]),
                    metric=float(mets[idx])))
        for cfg, r in zip(ul_tti.srs, out["srs"]):
            snr_db = float(10 * np.log10(
                max(float(np.mean(np.asarray(r["snr"]))), 1e-9)))
            res.srs.append(SrsIndicationPdu(
                rnti=cfg.rnti, timing_advance_s=float(r["ta_s"]),
                snr_db=snr_db, wideband_h=np.asarray(r["wideband_h"])))
        if self.pcap is not None:
            self.pcap.capture("slot_results", res)
        return res
