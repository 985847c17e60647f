"""OFH radio unit: the split-7.2 grid boundary (lib/ru/ofh analogue).

The DU side transmits DL resource grids as compressed eCPRI U-plane frames
and receives UL grids from the peer; an O-RU emulator (the reference ships
one as apps/examples/ofh/ru_emulator.cpp) answers on the same cable.  The
"cable" is any object with send(bytes)/recv()->bytes|None — in-memory
deques in tests, a socket in a two-process deployment.

Compression runs batched on the device (ofh.compression); framing is host
bytes.  Each (port, symbol) becomes one or more U-plane sections of at
most 255 PRBs.
"""

from __future__ import annotations

from collections import deque

import numpy as np

from ..ofh import cplane, ecpri
from ..ofh.compression import bfp_compress, bfp_decompress
from ..ofh.uplane import UplaneHeader, build_uplane, parse_uplane

_BCAST = b"\xff" * 6


class InMemoryCable:
    """Bidirectional frame pipe: a_to_b / b_to_a deques (tests, loopback)."""

    def __init__(self):
        self.a_to_b: deque = deque()
        self.b_to_a: deque = deque()

    def endpoint_a(self):
        return _Endpoint(self.a_to_b, self.b_to_a)

    def endpoint_b(self):
        return _Endpoint(self.b_to_a, self.a_to_b)


class _Endpoint:
    def __init__(self, tx: deque, rx: deque):
        self._tx, self._rx = tx, rx

    def send(self, frame: bytes):
        self._tx.append(frame)

    def recv(self):
        return self._rx.popleft() if self._rx else None


class SocketEndpoint:
    """Frame pipe over a stream socket: 4-byte big-endian length prefix per
    eth frame (the two-process deployment cable; the reference's OFH runs
    over raw eth/DPDK, which this container cannot open — the frame bytes
    are identical)."""

    def __init__(self, sock):
        import socket as _socket
        self._sock = sock
        self._sock.setblocking(False)
        self._buf = b""
        self._socket = _socket

    def send(self, frame: bytes):
        import struct
        self._sock.setblocking(True)
        try:
            self._sock.sendall(struct.pack(">I", len(frame)) + frame)
        finally:
            self._sock.setblocking(False)

    def recv(self):
        import struct
        try:
            while True:
                chunk = self._sock.recv(65536)
                if not chunk:
                    break
                self._buf += chunk
        except (BlockingIOError, InterruptedError):
            pass
        if len(self._buf) < 4:
            return None
        (n,) = struct.unpack(">I", self._buf[:4])
        if len(self._buf) < 4 + n:
            return None
        frame, self._buf = self._buf[4:4 + n], self._buf[4 + n:]
        return frame


class RuOfh:
    """DU-side OFH radio unit (grid plane).

    send_dl_grid / receive_ul_grid move [ports, nsym, nsc] complex grids
    across the fronthaul; sequence ids are tracked per eAxC like the
    reference's tx window checker counts (receiver drops reordered frames).
    """

    def __init__(self, cable_endpoint, nof_ports: int, nof_prb: int,
                 iq_width: int = 9, vlan_tci: int = 1,
                 mac_local: bytes = b"\x02\x00\x00\x00\x00\x01",
                 mac_remote: bytes = b"\x02\x00\x00\x00\x00\x02",
                 timing=None):
        self.ep = cable_endpoint
        self.nof_ports = nof_ports
        self.nof_prb = nof_prb
        self.iq_width = iq_width
        self.vlan_tci = vlan_tci
        self.mac_local = mac_local
        self.mac_remote = mac_remote
        # OFH timing plane (ofh.timing.OfhTiming): OTA clock + TX/RX window
        # checkers.  When present, late DL grids are dropped and counted
        # (ofh_downlink_handler_impl.cpp:78-86) and each received U-plane
        # message is classified against the Ta4 reception window.
        self.timing = timing
        self._seq = {}
        self._rx_seq = {}
        # C-plane schedule received from the peer: (pc_id) -> CplaneType1/3
        self.rx_schedule = {}
        self.metrics = {"tx_frames": 0, "rx_frames": 0, "dropped_seq": 0,
                        "cplane_tx": 0, "cplane_rx": 0,
                        "unscheduled_uplane": 0, "late_dl_grids": 0,
                        "rx_on_time": 0, "rx_early": 0, "rx_late": 0}

    def _next_seq(self, pc_id: int) -> int:
        s = self._seq.get(pc_id, 0)
        self._seq[pc_id] = (s + 1) & 0xFFFF
        return s

    def send_cplane(self, msg, pc_id: int):
        """Send one C-plane message (type 1 or 3) for the given eAxC."""
        payload = (cplane.build_type1(msg)
                   if isinstance(msg, cplane.CplaneType1)
                   else cplane.build_type3(msg))
        pdu = ecpri.build_ecpri(ecpri.MSG_TYPE_RT_CONTROL, pc_id,
                                self._next_seq(0x8000 | pc_id), payload)
        self.ep.send(ecpri.build_eth(self.mac_remote, self.mac_local,
                                     self.vlan_tci, pdu))
        self.metrics["cplane_tx"] += 1

    def send_dl_grid(self, grid, slot: int = 0, frame_id: int = 0,
                     subframe: int = 0, direction: int = 1):
        """Compress + frame one slot grid [ports, nsym, nsc].

        A section-type-1 C-plane message per eAxC precedes the U-plane
        frames, like the reference's data-flow pairing
        (ofh_data_flow_cplane_scheduling_commands_impl).

        Returns False (and transmits nothing) when the grid misses its
        transmission window (ofh_downlink_handler_impl.cpp:78-86).
        """
        # The T1a TX window gates DOWNLINK only (the reference's
        # tx_window_checker sits in ofh_downlink_handler_impl); UL U-plane
        # (direction=0, e.g. the RU emulator's loopback) is judged by the
        # receiver's Ta4 window instead.
        if self.timing is not None and direction == 1:
            self.timing.poll()
            mu = self.timing.clock.numerology
            slot_in_frame = subframe * (1 << mu) + slot
            if self.timing.tx.is_late(frame_id, slot_in_frame):
                self.metrics["late_dl_grids"] += 1
                return False
        exp, mant = bfp_compress(grid, self.iq_width)     # device, batched
        exp_h = np.asarray(exp)                           # [P, S, nprb]
        mant_h = np.asarray(mant)
        nsym = exp_h.shape[1]
        for port in range(self.nof_ports):
            self.send_cplane(cplane.CplaneType1(
                direction=direction, sfn=frame_id, subframe=subframe,
                slot=slot, start_symbol=0,
                section=cplane.CplaneSection(
                    section_id=port, prb_start=0, nof_prb=self.nof_prb,
                    nof_symbols=nsym),
                iq_width=self.iq_width), pc_id=port)
        for port in range(self.nof_ports):
            for sym in range(nsym):
                for p0 in range(0, self.nof_prb, 255):
                    n = min(255, self.nof_prb - p0)
                    hdr = UplaneHeader(
                        direction=direction, frame=frame_id,
                        subframe=subframe, slot=slot, symbol=sym,
                        start_prb=p0, nof_prb=n, iq_width=self.iq_width)
                    payload = build_uplane(hdr, exp_h[port, sym, p0:p0 + n],
                                           mant_h[port, sym, p0:p0 + n])
                    pdu = ecpri.build_ecpri(ecpri.MSG_TYPE_IQ_DATA, port,
                                            self._next_seq(port), payload)
                    self.ep.send(ecpri.build_eth(self.mac_remote,
                                                 self.mac_local,
                                                 self.vlan_tci, pdu))
                    self.metrics["tx_frames"] += 1
        return True

    def receive_ul_grid(self, nsym: int):
        """Drain the cable into one [ports, nsym, nof_prb*12] grid."""
        grid = np.zeros((self.nof_ports, nsym, self.nof_prb * 12),
                        dtype=np.complex64)
        got = False
        if self.timing is not None:
            self.timing.poll()
        while True:
            frame = self.ep.recv()
            if frame is None:
                break
            _, _, _, pdu = ecpri.parse_eth(frame)
            mtype, pc_id, seq, payload = ecpri.parse_ecpri(pdu)
            if mtype == ecpri.MSG_TYPE_RT_CONTROL:
                self.rx_schedule[pc_id] = cplane.parse(payload)
                self.metrics["cplane_rx"] += 1
                continue
            if mtype != ecpri.MSG_TYPE_IQ_DATA:
                continue
            expect = self._rx_seq.get(pc_id, seq)
            delta = (seq - expect) & 0xFFFF
            if delta >= 0x8000:                   # stale/reordered -> drop
                self.metrics["dropped_seq"] += 1
                continue
            if delta:                             # forward jump: frames lost
                self.metrics["dropped_seq"] += delta
            self._rx_seq[pc_id] = (seq + 1) & 0xFFFF
            hdr, exp, mant = parse_uplane(payload)
            # validate against the C-plane schedule for this eAxC (the
            # reference's rx window/section checkers): a U-plane frame
            # outside the scheduled symbol/PRB range is counted.
            sched = self.rx_schedule.get(pc_id)
            if sched is not None:
                sec = sched.section
                nof_prb = sec.nof_prb or self.nof_prb
                in_sym = (sched.start_symbol <= hdr.symbol
                          < sched.start_symbol + sec.nof_symbols)
                in_prb = (sec.prb_start <= hdr.start_prb
                          and hdr.start_prb + hdr.nof_prb
                          <= sec.prb_start + nof_prb)
                if not (in_sym and in_prb):
                    self.metrics["unscheduled_uplane"] += 1
            if self.timing is not None:
                mu = self.timing.clock.numerology
                verdict = self.timing.rx.update(
                    hdr.frame, hdr.subframe * (1 << mu) + hdr.slot,
                    hdr.symbol)
                self.metrics[f"rx_{verdict}"] += 1
            res = np.asarray(bfp_decompress(exp, mant))
            sc0 = hdr.start_prb * 12
            grid[pc_id, hdr.symbol, sc0:sc0 + res.shape[-1]] = res
            self.metrics["rx_frames"] += 1
            got = True
        return grid if got else None
