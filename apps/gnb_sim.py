#!/usr/bin/env python3
"""gnb_sim — run the TPU gNB PHY at line rate with a test-mode MAC.

Analogue of the reference's gnb application in its MAC test mode
(apps/gnb/gnb.cpp + mac_test_mode_adapter): a synthetic MAC schedules
full-rate DL/UL traffic per the TDD pattern; the slot conductor drives the
jitted slot programs; an optional TDL channel emulator closes the UL loop
(UE TX emulated from the same chain blocks).  Prints per-stage metrics and
slot-rate at the end.

Usage:
  python apps/gnb_sim.py [-c config.yaml] [--set run.nof_slots=200] [--trace out.json]
"""

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", default=None)
    ap.add_argument("--set", action="append", default=[],
                    help="dotted override, e.g. --set run.nof_slots=200")
    ap.add_argument("--trace", default="")
    ap.add_argument("--dump-config", action="store_true")
    ap.add_argument("--remote-port", type=int, default=-1,
                    help="enable the remote-control WebSocket JSON server "
                         "on this port (0 = ephemeral)")
    ap.add_argument("--pcap", default="",
                    help="capture FAPI slot messages to this pcap file")
    ap.add_argument("--e2", default="",
                    help="connect the E2/KPM agent to a RIC at host:port")
    ap.add_argument("--page", action="append", default=[],
                    help="page a UE (48-bit 5G-S-TMSI, decimal or "
                         "0x-prefixed hex); sched mode only — the record "
                         "transmits on its TS38.304 paging frame")
    args = ap.parse_args()

    from srsran_tpu.utils import config as config_mod
    cfg = config_mod.load(args.config, args.set)
    if args.dump_config:
        print(config_mod.dump(cfg))
        return

    import numpy as np
    import jax
    import jax.numpy as jnp
    from srsran_tpu.fapi.conductor import SlotConductor
    from srsran_tpu.mac.test_mode import TestModeMac
    from srsran_tpu.ran.slot_point import SlotPoint
    from srsran_tpu.utils.metrics import registry
    from srsran_tpu.utils import tracing

    if args.trace:
        tracing.enable_all()

    print(f"gnb_sim: cell {cfg.cell.nof_rb} RB mu={cfg.cell.numerology} "
          f"{cfg.cell.nof_ports} ports, {len(cfg.ues)} UE(s), "
          f"{cfg.nof_slots} slots on {jax.devices()[0]}")

    use_sched = cfg.mac == "sched"
    bb = bb_ru = prach_cfg = None
    if use_sched:
        from srsran_tpu.mac.scheduler import CellScheduler, SchedUeConfig
        if cfg.prach_period_slots > 0:
            # PRACH occasions route through the lower-PHY baseband collector
            # FSM (host-sample path, like samples arriving from a radio).
            from srsran_tpu.phy.upper.prach import PrachConfig
            from srsran_tpu.phy.lower.baseband import BasebandProcessor
            prach_cfg = PrachConfig(
                format="B4", root_sequence_index=1, zero_correlation_zone=0,
                ra_scs_hz=15_000 << cfg.cell.numerology)
            # The host-sample baseband path copies device arrays per PRACH
            # slot — on the tunnelled TPU that flips per-op sync mode, so
            # slot timings below are not deployment numbers (bench.py is).
            print("note: PRACH host-sample path active; slot timings are "
                  "functional only, use bench.py for performance")
            bb_ru = _UlFeedRu()
            bb_stash = {}
            bb = BasebandProcessor(
                bb_ru, nof_ports=cfg.cell.nof_ports,
                dft_size=cfg.cell.dft_size, numerology=cfg.cell.numerology,
                rx_notifier=lambda s, x, ts: bb_stash.update(samples=x),
                prach_notifier=lambda req, fd: bb_stash.setdefault(
                    "prach_fd", []).append(fd))
            bb.start()
        sched = CellScheduler(
            cfg.cell, cfg.phys_cell_id,
            ues=[SchedUeConfig(rnti=u.rnti, mcs_table=u.mcs_table,
                               dl_mcs=u.mcs_index,
                               ul_mcs=min(u.mcs_index, 25),
                               nof_layers_dl=u.nof_layers_dl,
                               nof_layers_ul=u.nof_layers_ul)
                 for u in cfg.ues],
            tdd=cfg.tdd, seed=cfg.seed, prach=prach_cfg,
            prach_period_slots=max(cfg.prach_period_slots, 1),
            csi_period_slots=cfg.csi_period_slots,
            # short DRX cycle + PO on a DL slot so short sim drives hit
            # the paging frame (deployment values are ctor defaults)
            **({"paging_drx_frames": 4, "paging_po_slot": 0}
               if args.page else {}))
        for pid in args.page:
            sched.page_ue(int(pid, 0))
        mac = None
    else:
        if args.page:
            print("warning: --page requires run.mac=sched; ignored")
        mac = TestModeMac(cfg.cell, cfg.phys_cell_id, cfg.ues, cfg.tdd,
                          cfg.seed)
    fapi_pcap = None
    if args.pcap:
        from srsran_tpu.utils.pcap import FapiPcap
        fapi_pcap = FapiPcap(args.pcap)
    cond = SlotConductor(cfg.cell, pcap=fapi_pcap)
    m_dl = registry.block("dl_slot")
    m_ul = registry.block("ul_slot")

    # Remote control (apps/services/remote_control analogue): metrics /
    # status queries and quit, live while the slot loop runs.
    stop_flag = threading.Event()
    progress = {"slot": 0}
    remote = None
    if args.remote_port >= 0:
        from srsran_tpu.utils import remote_control as rc
        remote = rc.RemoteServer(
            commands=[
                rc.FunctionCommand("metrics", "Report per-block PHY metrics",
                                   lambda p: {"report": registry.report()}),
                rc.FunctionCommand("status", "Slot-loop progress",
                                   lambda p: {"slot": progress["slot"],
                                              "nof_slots": cfg.nof_slots}),
            ],
            port=args.remote_port, stop_cb=stop_flag.set)
        remote.start()
        print(f"remote control listening on ws://127.0.0.1:{remote.port}")

    from srsran_tpu.utils import resource_usage
    usage0 = resource_usage.snapshot()
    crc_ok = crc_fail = dl_slots = ul_slots = 0

    # E2/KPM agent (lib/e2 analogue): cumulative counters updated by the
    # slot loop; the provider derives throughput gauges per report period.
    kpm = {"dl_bits": 0.0, "ul_bits": 0.0, "dl_prb_slots": 0.0,
           "ul_prb_slots": 0.0, "prach_detected": 0.0, "snr_db": 0.0}
    e2_agent = None
    if args.e2:
        from srsran_tpu.utils.e2_kpm import E2Agent
        t_e2 = [time.monotonic(), 0.0, 0.0]  # prev time, prev dl/ul bits

        def kpm_provider():
            now = time.monotonic()
            dt = max(now - t_e2[0], 1e-6)
            thp_dl = (kpm["dl_bits"] - t_e2[1]) / dt / 1e3
            thp_ul = (kpm["ul_bits"] - t_e2[2]) / dt / 1e3
            t_e2[0], t_e2[1], t_e2[2] = now, kpm["dl_bits"], kpm["ul_bits"]
            slots = dl_slots + ul_slots
            return {
                "DRB.UEThpDl": thp_dl, "DRB.UEThpUl": thp_ul,
                "DRB.RlcSduTransmittedVolumeDL": kpm["dl_bits"] / 1e3,
                "DRB.RlcSduTransmittedVolumeUL": kpm["ul_bits"] / 1e3,
                "RRU.PrbTotDl": kpm["dl_prb_slots"] / max(dl_slots, 1),
                "RRU.PrbTotUl": kpm["ul_prb_slots"] / max(ul_slots, 1),
                "RRU.PrbAvailDl": float(cfg.cell.nof_rb),
                "RRU.PrbAvailUl": float(cfg.cell.nof_rb),
                "L1M.UL-SNR": kpm["snr_db"],
                "L1M.PUSCH-CRC-OK": float(crc_ok),
                "L1M.PUSCH-CRC-NOK": float(crc_fail),
                "L1M.PRACH-Detected": kpm["prach_detected"],
                "L1M.SlotsProcessed": float(slots),
            }

        host, _, port = args.e2.rpartition(":")
        e2_agent = E2Agent(
            host or "127.0.0.1", int(port), kpm_provider,
            control_handler=(sched.apply_ric_control if use_sched else None))
        e2_agent.start()
        print(f"E2 agent connected to RIC at {args.e2}")

    t_start = time.monotonic()

    # UL indications resolve ``resolve_lag`` slots behind the launch front:
    # PendingSlotResults holds only device arrays, so the d2h + decode of
    # slot N happens while N+1..N+lag are already dispatched (the
    # reference's async result notifiers + its 5-deep processing pipeline,
    # phy_to_fapi_results_event_translator.cpp:137, du_low_config.h:40).
    from collections import deque as _deque
    ul_inflight = _deque()

    def consume_ul(pending, ul, launch_count):
        nonlocal crc_ok, crc_fail
        res = pending.resolve()
        for r in res.rach:
            kpm["prach_detected"] += 1
            tc = sched.handle_rach(r.preamble_index)
            print(f"slot {launch_count}: PRACH preamble "
                  f"{r.preamble_index} detected (metric "
                  f"{r.metric:.1f}) -> TC-RNTI 0x{tc:04x}")
        for c, pu, (hid, _) in zip(res.crc, ul.pusch,
                                   ul.pusch_harq or ()):
            crc_ok += int(c.tb_crc_ok)
            crc_fail += int(not c.tb_crc_ok)
            if c.tb_crc_ok:
                kpm["ul_bits"] += pu.tbs
            kpm["snr_db"] = float(c.snr_db)
            if use_sched:
                sched.handle_crc(c.rnti, hid,
                                 bool(c.tb_crc_ok), c.snr_db)
        kpm["ul_prb_slots"] += sum(p.rb_count for p in ul.pusch)
        if use_sched:
            pusch_uci = [u for u in res.uci if u.source == "pusch"]
            for u in pusch_uci:
                # gate on the decode validity flag (like the F2 path's
                # `detected`): garbage CSI at low SINR must not drive
                # link adaptation to max MCS
                if u.detected and u.csi_bits is not None:
                    sched.handle_csi_pusch(u.rnti, u.csi_bits, u.csi2_bits)
            sched.handle_uci_indications(
                launch_count, [u for u in res.uci if u.source != "pusch"])

    for count in range(cfg.nof_slots):
        if stop_flag.is_set():
            print(f"remote quit at slot {count}")
            break
        progress["slot"] = count
        slot = SlotPoint(cfg.cell.numerology, count)
        with tracing.app_tracer.span("slot", count=count):
            if use_sched:
                dl, tx, ul = sched.slot_indication(slot)
            else:
                dl = tx = ul = None
            if cfg.tdd.is_dl(slot.count):
                if not use_sched:
                    dl, tx = mac.dl_requests(slot)
                if dl.pdsch or dl.ssb:
                    with m_dl.measure(units=1), \
                         tracing.l1_dl_tracer.span("dl_slot"):
                        samples, _ = cond.process_dl(dl, tx)
                    dl_slots += 1
                    kpm["dl_bits"] += sum(p.tbs for p in dl.pdsch)
                    kpm["dl_prb_slots"] += sum(p.rb_count for p in dl.pdsch)
            if cfg.tdd.is_ul(slot.count):
                if not use_sched:
                    ul = mac.ul_requests(slot)
                if ul.pusch or (bb is not None and ul.prach):
                    # UE TX emulation: run the same chain as a waveform source
                    ue_tx = _emulate_ue(cond, mac, ul, cfg,
                                        sched if use_sched else None)
                    prach_fds = ()
                    if bb is not None:
                        # route samples through the lower-PHY baseband loop:
                        # PRACH windows are collected by its FSM, the slot
                        # samples come back via the rx notifier.
                        ue_np = np.asarray(ue_tx)
                        if ul.prach:
                            from srsran_tpu.phy.lower.baseband import \
                                PrachOccasionRequest
                            pre_idx = int(sched.rng.integers(0, 16))
                            # PRACH rides the low edge of the grid — the
                            # PRBs _prach_guard_rb() reserves — which is
                            # NEGATIVE baseband frequency (grid SC 0 maps
                            # to -nof_sc/2 * scs after the half-spectrum
                            # swap).  Waveform and demod window agree.
                            scs = 15_000 << cfg.cell.numerology
                            prach_f0 = -(cfg.cell.nof_sc // 2) * scs
                            ue_np = ue_np + _ue_prach_waveform(
                                prach_cfg, pre_idx, cfg.cell, ue_np.shape,
                                freq_offset_hz=prach_f0)
                            bb.request_prach(PrachOccasionRequest(
                                slot=bb.current_slot, start_sample=0,
                                fmt=prach_cfg.format,
                                freq_offset_hz=prach_f0,
                                ra_scs_hz=prach_cfg.scs_hz))
                        bb_stash.pop("prach_fd", None)
                        bb_ru.push(ue_np)
                        bb.push_dl(bb.current_slot,
                                   np.zeros_like(ue_np))   # rx-only tick
                        bb.tick()
                        from srsran_tpu.utils.transfer import \
                            device_put_complex
                        ue_tx = device_put_complex(bb_stash["samples"])
                        prach_fds = tuple(bb_stash.get("prach_fd", ()))
                        if len(prach_fds) < len(ul.prach):
                            # a window straddling the slot boundary has not
                            # completed yet — defer those PDUs (the FSM
                            # notifies on a later tick)
                            import dataclasses as _dc
                            ul = _dc.replace(
                                ul, prach=ul.prach[:len(prach_fds)])
                    with m_ul.measure(units=1), \
                         tracing.l1_ul_tracer.span("ul_slot"):
                        pending = cond.process_ul(ul, ue_tx,
                                                  prach_fd=prach_fds)
                    ul_inflight.append((pending, ul, slot.count))
                    while len(ul_inflight) > max(cfg.resolve_lag, 0):
                        consume_ul(*ul_inflight.popleft())
                    ul_slots += 1
                elif use_sched:
                    sched.handle_uci_indications(slot.count, [])
    while ul_inflight:                 # drain deferred indications
        consume_ul(*ul_inflight.popleft())
    elapsed = time.monotonic() - t_start
    if e2_agent is not None:
        e2_agent.stop()
    if remote is not None:
        remote.stop()
    if fapi_pcap is not None:
        fapi_pcap.close()
        print(f"FAPI pcap written to {args.pcap}")

    print(f"done: {cfg.nof_slots} slots in {elapsed:.2f}s "
          f"({cfg.nof_slots / elapsed:.0f} slots/s wall; "
          f"{dl_slots} DL, {ul_slots} UL)")
    print(f"UL CRC: {crc_ok} ok / {crc_fail} failed")
    if use_sched:
        print(f"scheduler: {sched.counters}")
    for s in registry.report():
        if s.get("count"):
            print(f"  {s['name']}: avg {s['lat_us_avg']:.0f}us "
                  f"p99 {s['lat_us_p99']:.0f}us max {s['lat_us_max']:.0f}us")
    print(f"resource usage: {resource_usage.diff(usage0, resource_usage.snapshot())}")
    if args.trace:
        tracing.app_tracer.dump(args.trace)
        print(f"trace written to {args.trace}")
    if ul_slots and crc_ok == 0:
        sys.exit("ERROR: no UL transport block decoded")


_UE_CACHE = {}
_UE_HARQ_TBS = {}   # UE-side HARQ buffers: (rnti, harq_id) -> payload bits


class _UlFeedRu:
    """RadioUnit served one UL slot block at a time (UE emulator feeds it,
    the baseband processor consumes it — the rx half of a radio session)."""

    def __init__(self):
        from collections import deque
        self._q = deque()
        self._ts = 0

    def start(self):
        pass

    def stop(self):
        pass

    def send_dl(self, samples, timestamp=0):
        pass

    def push(self, samples):
        import numpy as np
        self._q.append(np.asarray(samples, dtype=np.complex64))

    def receive_ul(self, count):
        if not self._q:
            return None
        s = self._q.popleft()
        assert s.shape[-1] == count, (s.shape, count)
        ts, self._ts = self._ts, self._ts + count
        return s, ts


def _ue_prach_waveform(prach_cfg, preamble, cell, shape,
                       freq_offset_hz: float = 0.0):
    """Short-preamble time waveform at the cell rate (UE-side TX, host-pure
    numpy so no device round trip happens on the PRACH path).

    freq_offset_hz positions the preamble's first RA subcarrier in baseband
    (negative = below DC = low grid PRBs) — must match the demod window's
    PrachOccasionRequest.freq_offset_hz."""
    import numpy as np
    from srsran_tpu.phy.upper import prach as prach_mod
    from srsran_tpu.ran.prach_params import SHORT_FORMATS, zc_sequence
    roots, pmap, _ = prach_mod._root_set(prach_cfg)
    root_idx, cs = pmap[prach_cfg.start_preamble + preamble]
    td_seq = zc_sequence(roots[root_idx], prach_cfg.l_ra, cs)
    fd = np.fft.fft(td_seq) / np.sqrt(prach_cfg.l_ra)
    fs = cell.dft_size * (15_000 << cell.numerology)
    n_u = fs // prach_cfg.scs_hz
    first_bin = int(round(freq_offset_hz / prach_cfg.scs_hz)) % n_u
    spec = np.zeros(n_u, dtype=np.complex64)
    bins = (first_bin + np.arange(fd.shape[0])) % n_u
    spec[bins] = fd
    td = np.fft.ifft(spec) * np.sqrt(n_u)       # unitary, matches prach_demod
    sig = np.tile(td, SHORT_FORMATS[prach_cfg.format]).astype(np.complex64)
    out = np.zeros(shape, dtype=np.complex64)
    out[:, : sig.shape[0]] = sig[None, :]
    return out


def _emulate_ue(cond, mac, ul, cfg, sched=None):
    """Build the UL waveform for this slot's PUSCH PDUs (UE-side TX).

    In scheduler mode (sched not None), HARQ retransmissions resend the
    SAME transport block (UE HARQ buffer), and PUCCH F1 occasions carry
    ACKs so the DL HARQ feedback loop closes.
    """
    import numpy as np
    import jax.numpy as jnp
    from srsran_tpu.phy.slot_programs import CellConfig, dl_slot_fn
    from srsran_tpu.phy.upper.pdsch import PdschConfig
    from srsran_tpu.emulation import channel as chan
    import jax

    rng = (sched.rng if sched is not None else mac.rng)
    harq_meta = ul.pusch_harq or tuple((0, True) for _ in ul.pusch)
    pd_cfgs, payloads = [], []
    uci_pdus = []                  # (cfg, tb): PDUs with UCI ride ue_tx
    for pu, (hid, new) in zip(ul.pusch, harq_meta):
        if sched is not None and (pu.uci.o_csi1 or pu.uci.o_ack):
            key = (pu.rnti, hid)
            if new or key not in _UE_HARQ_TBS                     or len(_UE_HARQ_TBS[key]) != pu.tbs:
                _UE_HARQ_TBS[key] = rng.integers(
                    0, 2, pu.tbs).astype(np.int8)
            uci_pdus.append((pu, _UE_HARQ_TBS[key]))
            continue
        pd_cfgs.append(PdschConfig(
            rnti=pu.rnti, rb_start=pu.rb_start, rb_count=pu.rb_count,
            first_symbol=pu.first_symbol, nof_symbols=pu.nof_symbols,
            modulation=pu.modulation, target_code_rate=pu.target_code_rate,
            tbs=pu.tbs, nof_layers=pu.nof_layers, rv=pu.rv, n_id=pu.n_id,
            dmrs_symbols=pu.dmrs_symbols,
            dmrs_scrambling_id=pu.dmrs_scrambling_id,
            slot_in_frame=pu.slot_in_frame))
        key = (pu.rnti, hid)
        if sched is None:
            tb = rng.integers(0, 2, pu.tbs).astype(np.int8)
        else:
            if new or key not in _UE_HARQ_TBS \
                    or len(_UE_HARQ_TBS[key]) != pu.tbs:
                _UE_HARQ_TBS[key] = rng.integers(
                    0, 2, pu.tbs).astype(np.int8)
            tb = _UE_HARQ_TBS[key]
        payloads.append(jnp.asarray(tb))
    from srsran_tpu.fapi.conductor import normalize_dl_plan
    from srsran_tpu.fapi.messages import DlTtiRequest
    ue_cell = CellConfig(nof_ports=cfg.cell.nof_ports, nof_rb=cfg.cell.nof_rb,
                         dft_size=cfg.cell.dft_size,
                         numerology=cfg.cell.numerology,
                         center_freq_hz=cfg.cell.center_freq_hz)
    plan, ctx = normalize_dl_plan(
        DlTtiRequest(slot=ul.slot, pdsch=tuple(pd_cfgs)))
    slot_in_sf = ul.slot.subframe_slot_index
    fn = dl_slot_fn(ue_cell, plan, slot_in_sf)
    samples, grid = fn((), (), tuple(payloads), ctx)
    if uci_pdus:
        # CSI-on-PUSCH PDUs: UE packs the rank-restricted report and
        # multiplexes it into the PUSCH codeword (phy/upper/ue_tx)
        from srsran_tpu.phy.upper import ue_tx as ue_tx_mod
        from srsran_tpu.ran import csi_report as csi_mod
        for pu, tb in uci_pdus:
            uec = sched.ues.get(pu.rnti)
            cfg_r = uec.pusch_csi_cfg if uec is not None else None
            csi1 = csi2 = None
            if cfg_r is not None and pu.uci.o_csi1:
                sinr = (cfg.channel_sinr_db
                        if cfg.channel_profile != "none" else 30.0)
                cqi = int(np.clip((sinr + 6.0) / 1.9, 1, 15))
                rep = csi_mod.CsiReportData(
                    ri=cfg_r.allowed_ranks()[0], wideband_cqi=cqi,
                    i_1_1=pu.rnti % 8, i_2=pu.rnti % 2)
                csi1, csi2 = csi_mod.pack(rep, cfg_r)
                if csi2.size == 0:
                    csi2 = None
            g1 = ue_tx_mod.pusch_transmit(pu, tb, csi1=csi1, csi2=csi2,
                                          nof_sc=cfg.cell.nof_sc)
            from srsran_tpu.utils.transfer import device_put_complex
            grid = grid.at[:1].add(device_put_complex(g1))
        grid_dirty = True
    else:
        grid_dirty = False
    if sched is not None and (ul.pucch_f1 or ul.pucch_f2):
        # UE transmits ACKs on its PUCCH F1 occasions (bit 0 = ACK) and
        # packed wideband CSI reports on its F2 occasions, closing the DL
        # HARQ and link-adaptation loops.
        from srsran_tpu.phy.upper import pucch as pucch_mod
        from srsran_tpu.ops import ofdm as ofdm_mod
        from srsran_tpu.ran import csi_report as csi_mod
        for fc in ul.pucch_f1:
            grid = pucch_mod.transmit_format1(
                grid, fc, [0] * max(fc.nof_harq_bits, 1))
        for fc in ul.pucch_f2:
            # UE-side CSI: CQI from the emulated channel SINR, rank from
            # its configured DL layers, a deterministic per-UE beam PMI.
            sinr = (cfg.channel_sinr_db if cfg.channel_profile != "none"
                    else 30.0)
            cqi = int(np.clip((sinr + 6.0) / 1.9, 1, 15))
            uec = sched.ues.get(fc.rnti)
            ranks = sched.csi_cfg.allowed_ranks()
            want_ri = uec.cfg.nof_layers_dl if uec is not None else 1
            ri = max(r for r in ranks if r <= max(want_ri, ranks[0]))
            data = csi_mod.CsiReportData(
                ri=ri, wideband_cqi=cqi, i_1_1=fc.rnti % 8,
                i_2=fc.rnti % 2)
            bits = csi_mod.pack_pucch(data, sched.csi_cfg)
            grid = pucch_mod.transmit_format2(grid, fc, bits)
        grid_dirty = True
    if grid_dirty:
        # ONE re-OFDM after all grid writes (jitted: eager complex ops
        # are fatal on the tunnel backend)
        from srsran_tpu.ops import ofdm as ofdm_mod2
        samples = jax.jit(lambda g: ofdm_mod2.modulate_slot(
            g, cfg.cell.dft_size, cfg.cell.numerology,
            slot_in_subframe=slot_in_sf,
            center_freq_hz=cfg.cell.center_freq_hz))(grid)
    if cfg.channel_profile != "none":
        ch = chan.ChannelConfig(
            profile=cfg.channel_profile, sinr_db=cfg.channel_sinr_db,
            nof_tx_ports=cfg.cell.nof_ports, nof_rx_ports=cfg.cell.nof_ports,
            nof_subc=cfg.cell.nof_sc,
            scs_hz=15000 << cfg.cell.numerology)
        key = jax.random.PRNGKey(ul.slot.count)
        rx_grid, _ = chan.run(key, grid, ch)
        from srsran_tpu.ops import ofdm
        return ofdm.modulate_slot(rx_grid, cfg.cell.dft_size,
                                  cfg.cell.numerology,
                                  slot_in_subframe=slot_in_sf,
                                  center_freq_hz=cfg.cell.center_freq_hz)
    return samples


if __name__ == "__main__":
    main()
