"""DLT pcap writers (postmortem capture, Wireshark-compatible).

Analogue of the reference's lib/pcap (pcap_file_writer.cpp +
dlt_pcap_impl.cpp): classic little-endian pcap format, one DLT per layer
(the reference registers user DLTs 152-156 for NGAP/E1AP/F1AP/E2AP/GTP-U,
dlt_pcap_impl.cpp:29-34, and uses UDP-framed DLT 149 for MAC).  Here the
captured protocol is the split-6 FAPI transport's JSON frames plus an
in-process slot-message capture, written on a background thread like the
reference's backend_pcap_writer so the slot path never blocks on disk.
"""

from __future__ import annotations

import queue
import struct
import threading
import time

# User DLTs, following the reference's numbering convention.
DLT_FAPI = 157          # our FAPI slot-message frames (reference stops at 156)
DLT_MAC = 149           # mac_pcap_impl's UDP-framed DLT

_PCAP_MAGIC = 0xA1B2C3D4
_SNAPLEN = 1 << 20


class PcapWriter:
    """Asynchronous single-DLT pcap file writer (backend_pcap_writer)."""

    def __init__(self, filename: str, dlt: int = DLT_FAPI):
        self._f = open(filename, "wb")
        # global header: magic, v2.4, thiszone=0, sigfigs=0, snaplen, dlt
        self._f.write(struct.pack("<IHHiIII", _PCAP_MAGIC, 2, 4, 0, 0,
                                  _SNAPLEN, dlt))
        self._q: queue.Queue = queue.Queue(maxsize=8192)
        self._thread = threading.Thread(target=self._run, name="pcap_writer",
                                        daemon=True)
        self._closed = False
        self._thread.start()

    def write(self, payload: bytes, ts: float | None = None) -> None:
        """Enqueue one record; drops (like the reference's bounded queue)
        rather than blocking the real-time path when the disk falls behind."""
        if self._closed:
            return
        try:
            self._q.put_nowait((ts if ts is not None else time.time(),
                                bytes(payload)))
        except queue.Full:
            pass

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        self._q.put((None, None))
        self._thread.join(timeout=10.0)
        self._f.close()

    def _run(self) -> None:
        while True:
            ts, payload = self._q.get()
            if ts is None:
                return
            sec = int(ts)
            usec = int((ts - sec) * 1e6)
            n = min(len(payload), _SNAPLEN)
            self._f.write(struct.pack("<IIII", sec, usec, n, len(payload)))
            self._f.write(payload[:n])
            self._f.flush()


class FapiPcap:
    """Capture FAPI slot messages (fapi_adaptor logging decorator analogue).

    Records each message as the same length-prefixed JSON frame the split-6
    transport puts on the wire, so one decoder serves both."""

    def __init__(self, filename: str):
        self._writer = PcapWriter(filename, DLT_FAPI)

    def capture(self, msg_type: str, body) -> None:
        import json
        from ..fapi.transport import encode
        payload = json.dumps({"t": msg_type, "b": encode(body)}).encode()
        self._writer.write(struct.pack(">Q", len(payload)) + payload)

    def close(self) -> None:
        self._writer.close()


def read_pcap(filename: str):
    """Parse a pcap written by PcapWriter: (dlt, [(ts, payload), ...])."""
    with open(filename, "rb") as f:
        hdr = f.read(24)
        magic, _, _, _, _, _, dlt = struct.unpack("<IHHiIII", hdr)
        assert magic == _PCAP_MAGIC, hex(magic)
        records = []
        while True:
            rec = f.read(16)
            if len(rec) < 16:
                break
            sec, usec, incl, _orig = struct.unpack("<IIII", rec)
            records.append((sec + usec / 1e6, f.read(incl)))
    return dlt, records
