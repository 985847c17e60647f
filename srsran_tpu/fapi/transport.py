"""Split-6 FAPI transport: slot messages over a local TCP socket.

Analogue of the reference's split-6 deployment, where the MAC (du_high)
and the PHY (apps/du_low — upper PHY + FAPI, no MAC) run in separate
processes and exchange SCF-222 FAPI slot messages over the network
(SURVEY §1 layer 7; apps/du_low/du_low.cpp).  The wire format here is
length-prefixed JSON with base64 arrays — self-describing for the
dataclass message types in fapi/messages.py, with an import allowlist so
decoding cannot instantiate arbitrary classes.

Message types:
  config       MAC -> PHY: cell configuration (once, on connect)
  dl_tti       MAC -> PHY: {dl: DlTtiRequest, tx: TxDataRequest}
  ul_tti       MAC -> PHY: {ul: UlTtiRequest} -> reply slot_results
  rx_samples   test/RU-emulator path: inject UL antenna samples for a slot
               (the reference's ru_emulator plays this role over eCPRI,
               apps/examples/ofh/ru_emulator.cpp)
  slot_results PHY -> MAC: SlotResults (crc/rx_data/uci/rach indications)
  stop         MAC -> PHY: shut down
"""

from __future__ import annotations

import base64
import dataclasses
import enum
import importlib
import json
import socket
import struct

import numpy as np

_ALLOWED_MODULE_PREFIXES = ("srsran_tpu.",)


# ---------------------------------------------------------------------------
# Codec
# ---------------------------------------------------------------------------

def encode(obj):
    if obj is None or isinstance(obj, (bool, int, float, str)):
        return obj
    if isinstance(obj, enum.Enum):
        cls = type(obj)
        return {"__enum__": f"{cls.__module__}:{cls.__qualname__}",
                "v": obj.name}
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        cls = type(obj)
        return {"__dc__": f"{cls.__module__}:{cls.__qualname__}",
                "f": {f.name: encode(getattr(obj, f.name))
                      for f in dataclasses.fields(obj)}}
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, (np.bool_,)):
        return bool(obj)
    if isinstance(obj, tuple):
        return {"__tu__": [encode(x) for x in obj]}
    if isinstance(obj, list):
        return [encode(x) for x in obj]
    if isinstance(obj, dict):
        assert all(isinstance(k, str) for k in obj), "dict keys must be str"
        return {"__map__": {k: encode(v) for k, v in obj.items()}}
    arr = np.asarray(obj)   # ndarray / jax.Array / scalars thereof
    return {"__nd__": {"d": arr.dtype.str, "s": list(arr.shape),
                       "b": base64.b64encode(arr.tobytes()).decode()}}


def _resolve(spec: str):
    mod, qual = spec.split(":")
    if not mod.startswith(_ALLOWED_MODULE_PREFIXES):
        raise ValueError(f"refusing to import {spec!r}")
    target = importlib.import_module(mod)
    for part in qual.split("."):
        target = getattr(target, part)
    return target


def decode(obj):
    if isinstance(obj, list):
        return [decode(x) for x in obj]
    if not isinstance(obj, dict):
        return obj
    if "__tu__" in obj:
        return tuple(decode(x) for x in obj["__tu__"])
    if "__map__" in obj:
        return {k: decode(v) for k, v in obj["__map__"].items()}
    if "__nd__" in obj:
        d = obj["__nd__"]
        raw = base64.b64decode(d["b"])
        return np.frombuffer(raw, dtype=np.dtype(d["d"])).reshape(d["s"]).copy()
    if "__enum__" in obj:
        return _resolve(obj["__enum__"])[obj["v"]]
    if "__dc__" in obj:
        cls = _resolve(obj["__dc__"])
        if not dataclasses.is_dataclass(cls):
            raise ValueError(f"{obj['__dc__']} is not a dataclass")
        return cls(**{k: decode(v) for k, v in obj["f"].items()})
    return {k: decode(v) for k, v in obj.items()}


# ---------------------------------------------------------------------------
# Framing
# ---------------------------------------------------------------------------

def send_msg(sock: socket.socket, msg_type: str, body=None) -> None:
    payload = json.dumps({"t": msg_type, "b": encode(body)}).encode()
    sock.sendall(struct.pack(">Q", len(payload)) + payload)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return buf


def recv_msg(sock: socket.socket):
    (n,) = struct.unpack(">Q", _recv_exact(sock, 8))
    if n > (1 << 31):
        raise ValueError(f"oversized frame: {n}")
    msg = json.loads(_recv_exact(sock, n).decode())
    return msg["t"], decode(msg.get("b"))


# ---------------------------------------------------------------------------
# MAC-side client
# ---------------------------------------------------------------------------

class FapiClient:
    """MAC-side endpoint of the split-6 link (fapi message gateway)."""

    def __init__(self, host: str, port: int, timeout: float = 300.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)

    def configure(self, cell) -> None:
        send_msg(self._sock, "config", cell)
        t, _ = recv_msg(self._sock)
        assert t == "config_ok", t

    def dl_tti(self, dl, tx, want_samples: bool = False):
        """Send the DL slot.  want_samples=True returns the modulated
        antenna samples (the RU-emulator loopback path, for tests)."""
        send_msg(self._sock, "dl_tti",
                 {"dl": dl, "tx": tx, "want_samples": want_samples})
        if want_samples:
            t, body = recv_msg(self._sock)
            assert t == "dl_samples", t
            return body
        return None

    def rx_samples(self, samples) -> None:
        send_msg(self._sock, "rx_samples", samples)

    def ul_tti(self, ul):
        send_msg(self._sock, "ul_tti", {"ul": ul})
        t, body = recv_msg(self._sock)
        assert t == "slot_results", t
        return body

    def stop(self) -> None:
        try:
            send_msg(self._sock, "stop")
        finally:
            self._sock.close()


# ---------------------------------------------------------------------------
# PHY-side server
# ---------------------------------------------------------------------------

def serve_phy(port: int = 0, host: str = "127.0.0.1",
              ready_cb=None) -> None:
    """Run the DU-low FAPI server: one MAC client, slot messages in order.

    The PHY owns the conductor and an RU-emulator-style UL sample buffer:
    `rx_samples` messages stand in for the radio's receive path, exactly
    like the reference's ru_emulator feeds the OFH receiver.
    """
    from .conductor import SlotConductor

    lsock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    lsock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    lsock.bind((host, port))
    lsock.listen(1)
    if ready_cb is not None:
        ready_cb(lsock.getsockname()[1])
    conn, _ = lsock.accept()
    cond = None
    pending_samples = None
    try:
        while True:
            t, body = recv_msg(conn)
            if t == "stop":
                return
            if t == "config":
                cond = SlotConductor(body)
                send_msg(conn, "config_ok")
            elif cond is None and t in ("dl_tti", "ul_tti", "rx_samples"):
                # Protocol-level error reply instead of AttributeError —
                # mirrors the reference's FAPI error indication on messages
                # arriving before cell configuration.
                send_msg(conn, "error",
                         {"msg": f"{t} before config", "type": t})
            elif t == "dl_tti":
                samples, _ = cond.process_dl(body["dl"], body["tx"])
                if body.get("want_samples"):
                    send_msg(conn, "dl_samples", np.asarray(samples))
                else:
                    samples.block_until_ready()
            elif t == "rx_samples":
                pending_samples = body
            elif t == "ul_tti":
                assert pending_samples is not None, "no UL samples available"
                res = cond.process_ul(body["ul"], pending_samples).resolve()
                pending_samples = None
                send_msg(conn, "slot_results", res)
            else:
                raise ValueError(f"unknown message type {t!r}")
    except ConnectionError:
        pass
    finally:
        conn.close()
        lsock.close()
