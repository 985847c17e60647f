"""Split-6 FAPI transport: slot messages over a local TCP socket.

Analogue of the reference's split-6 deployment, where the MAC (du_high)
and the PHY (apps/du_low — upper PHY + FAPI, no MAC) run in separate
processes and exchange SCF-222 FAPI slot messages over the network
(SURVEY §1 layer 7; apps/du_low/du_low.cpp).  The wire format here is
length-prefixed JSON with base64 arrays — self-describing for the
dataclass message types in fapi/messages.py, with an import allowlist so
decoding cannot instantiate arbitrary classes.

Message types:
  fapi_config  MAC -> PHY: a config-plane message (ParamRequest,
               ConfigRequest, StartRequest, StopRequest from
               fapi/config_messages.py — the SCF-222 config plane,
               include/srsran/fapi/messages/config_messages.h); the reply
               is fapi_config_reply carrying the response dataclass (or
               None for start.request accepted).  Cells reconfigure
               without process restart: stop.request -> config.request ->
               start.request.
  config       legacy shorthand: bare CellConfig == config.request +
               start.request (kept for round-2/3 clients)
  dl_tti       MAC -> PHY: {dl: DlTtiRequest, tx: TxDataRequest}
  ul_tti       MAC -> PHY: {ul: UlTtiRequest} -> reply slot_results
  rx_samples   test/RU-emulator path: inject UL antenna samples for a slot
               (the reference's ru_emulator plays this role over eCPRI,
               apps/examples/ofh/ru_emulator.cpp)
  slot_results PHY -> MAC: SlotResults (crc/rx_data/uci/rach indications)
  error_indication PHY -> MAC: fapi::error_indication analogue for slot
               messages in the wrong state or outside the processing window
  stop         MAC -> PHY: shut down the server process
"""

from __future__ import annotations

import base64
import dataclasses
import enum
import importlib
import json
import functools
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
        self.error_indications: list = []   # async fapi::error_indication
        self.results: list = []             # pushed slot_results_nb

    def _recv(self):
        """recv_msg that transparently collects pushed slot_results_nb
        (pipelined indications may precede any request's reply)."""
        while True:
            t, body = recv_msg(self._sock)
            if t == "slot_results_nb":
                self.results.append(body)
                continue
            return t, body

    def configure(self, cell) -> None:
        """Legacy one-shot: config.request + start.request."""
        send_msg(self._sock, "config", cell)
        t, _ = self._recv()
        assert t == "config_ok", t

    def config_msg(self, msg):
        """Send one config-plane message (fapi/config_messages.py) and
        return the PHY's reply dataclass (None for an accepted
        start.request)."""
        send_msg(self._sock, "fapi_config", msg)
        t, body = self._recv()
        assert t == "fapi_config_reply", t
        return body

    def reconfigure(self, cell):
        """Cell reconfiguration without restarting the PHY process:
        stop.request -> config.request -> start.request."""
        from .config_messages import (ConfigRequest, StartRequest,
                                      StopRequest, ErrorCode)
        self.config_msg(StopRequest())
        resp = self.config_msg(ConfigRequest(cell=cell))
        if resp.error_code is not ErrorCode.MSG_OK:
            raise ValueError(f"config rejected: {resp.invalid_params}")
        self.config_msg(StartRequest())
        return resp

    def dl_tti(self, dl, tx, want_samples: bool = False):
        """Send the DL slot.  want_samples=True returns the modulated
        antenna samples (the RU-emulator loopback path, for tests).  A slot
        rejected by the PHY (wrong state / outside the processing window)
        returns the ErrorIndication instead."""
        send_msg(self._sock, "dl_tti",
                 {"dl": dl, "tx": tx, "want_samples": want_samples})
        if want_samples:
            while True:
                t, body = self._recv()
                if t == "dl_samples":
                    return body
                assert t == "error_indication", t
                if (body.message_id == "dl_tti" and body.sfn == dl.slot.sfn
                        and body.slot == dl.slot.slot_index):
                    return body
                self.error_indications.append(body)
        return None

    def rx_samples(self, samples) -> None:
        send_msg(self._sock, "rx_samples", samples)

    def ul_tti(self, ul):
        """Returns SlotResults, or ErrorIndication if the PHY rejected THIS
        slot.  Error indications for earlier un-replied messages (a gated
        dl_tti without want_samples) arrive first and are collected into
        self.error_indications — the analogue of the reference's
        asynchronous error.indication notifier."""
        send_msg(self._sock, "ul_tti", {"ul": ul})
        while True:
            t, body = self._recv()
            if t == "slot_results":
                return body
            assert t == "error_indication", t
            if (body.message_id == "ul_tti" and body.sfn == ul.slot.sfn
                    and body.slot == ul.slot.slot_index):
                return body
            self.error_indications.append(body)

    # ---- pipelined indications (the deployment pattern over the wire:
    # the PHY resolves resolve_lag slots BEHIND the launch front and
    # pushes slot_results_nb messages; the MAC never blocks per slot) ----

    def ul_tti_nb(self, ul) -> None:
        """Non-blocking UL slot: the PHY launches it and pushes this (and
        earlier) slots' results as they resolve; collect them from
        self.results (filled by any later receive) or via flush()."""
        send_msg(self._sock, "ul_tti_nb", {"ul": ul})
        # opportunistic drain: pushed results must be consumed between
        # sends or the server's blocking push + our blocking send can
        # mutually fill both socket buffers and deadlock
        self.drain_pushed()

    def drain_pushed(self) -> int:
        """Consume any ALREADY-ARRIVED pushed messages without blocking
        (select()-gated; a readable socket holds at least the start of a
        whole server frame, which then completes promptly)."""
        import select
        n = 0
        while select.select([self._sock], [], [], 0.0)[0]:
            t, body = recv_msg(self._sock)
            if t == "slot_results_nb":
                self.results.append(body)
            elif t == "error_indication":
                self.error_indications.append(body)
            else:
                raise AssertionError(f"unexpected pushed message {t!r}")
            n += 1
        return n

    def flush(self) -> list:
        """Resolve + deliver every in-flight non-blocking UL slot.
        Returns all results received so far (drains self.results)."""
        send_msg(self._sock, "flush", None)
        while True:
            t, body = self._recv()
            if t == "error_indication":
                self.error_indications.append(body)
            else:
                assert t == "flush_done", t
                out, self.results = self.results, []
                return out

    def stop(self) -> None:
        try:
            send_msg(self._sock, "stop")
        finally:
            self._sock.close()


# ---------------------------------------------------------------------------
# PHY-side server
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=1)
def _split_planes():
    """Jitted real/imag splitter, cached so the per-slot dl_samples path
    never re-traces (a fresh lambda per message would)."""
    import jax
    import jax.numpy as jnp
    return jax.jit(lambda v: (jnp.real(v), jnp.imag(v)))


def serve_phy(port: int = 0, host: str = "127.0.0.1",
              ready_cb=None) -> None:
    """Run the DU-low FAPI server: one MAC client, slot messages in order.

    The PHY owns the conductor and an RU-emulator-style UL sample buffer:
    `rx_samples` messages stand in for the radio's receive path, exactly
    like the reference's ru_emulator feeds the OFH receiver.
    """
    from .config_messages import (CellManager, ConfigRequest, StartRequest,
                                  ErrorCode, ErrorIndication, PhyState)

    lsock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    lsock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    lsock.bind((host, port))
    lsock.listen(1)
    if ready_cb is not None:
        ready_cb(lsock.getsockname()[1])
    conn, _ = lsock.accept()
    mgr = CellManager()
    pending_samples = None
    # non-blocking UL slots in flight (resolve_lag behind the launch
    # front, like PendingSlotResults in-process)
    from collections import deque
    nb_pending = deque()
    resolve_lag = 2

    def gate(msg_id, slot):
        err = mgr.gate_slot(msg_id, slot)
        if err is not None:
            send_msg(conn, "error_indication", err)
        return err

    try:
        while True:
            t, body = recv_msg(conn)
            if t == "stop":
                return
            if t == "fapi_config":
                send_msg(conn, "fapi_config_reply",
                         mgr.handle_config_msg(body))
            elif t == "config":
                # legacy shorthand: configure + start in one step
                resp = mgr.handle_config_msg(ConfigRequest(cell=body))
                if resp.error_code is ErrorCode.MSG_OK:
                    mgr.handle_config_msg(StartRequest())
                    send_msg(conn, "config_ok")
                else:
                    send_msg(conn, "error",
                             {"msg": f"bad config: {resp.invalid_params}",
                              "type": t})
            elif mgr.state is not PhyState.RUNNING and t in (
                    "dl_tti", "ul_tti", "rx_samples"):
                if t == "rx_samples":
                    send_msg(conn, "error_indication", ErrorIndication(
                        0, 0, t, ErrorCode.MSG_INVALID_STATE,
                        f"state={mgr.state.name}"))
                else:
                    slot = (body["dl"] if t == "dl_tti" else body["ul"]).slot
                    gate(t, slot)
            elif t == "dl_tti":
                if gate(t, body["dl"].slot) is not None:
                    continue
                samples, _ = mgr.conductor.process_dl(body["dl"], body["tx"])
                if body.get("want_samples"):
                    # complex d2h is unsafe on the tunnel backend: fetch
                    # float planes and recombine on host (utils/transfer)
                    re_d, im_d = _split_planes()(samples)
                    host = (np.asarray(re_d)
                            + 1j * np.asarray(im_d)).astype(np.complex64)
                    send_msg(conn, "dl_samples", host)
                else:
                    samples.block_until_ready()
            elif t == "rx_samples":
                from ..utils.transfer import device_put_complex
                pending_samples = device_put_complex(body)
            elif t == "ul_tti":
                if gate(t, body["ul"].slot) is not None:
                    continue
                assert pending_samples is not None, "no UL samples available"
                res = mgr.conductor.process_ul(
                    body["ul"], pending_samples).resolve()
                pending_samples = None
                send_msg(conn, "slot_results", res)
            elif t == "ul_tti_nb":
                if gate("ul_tti", body["ul"].slot) is not None:
                    continue
                assert pending_samples is not None, "no UL samples available"
                nb_pending.append(mgr.conductor.process_ul(
                    body["ul"], pending_samples))
                pending_samples = None
                while len(nb_pending) > resolve_lag:
                    send_msg(conn, "slot_results_nb",
                             nb_pending.popleft().resolve())
            elif t == "flush":
                while nb_pending:
                    send_msg(conn, "slot_results_nb",
                             nb_pending.popleft().resolve())
                send_msg(conn, "flush_done")
            else:
                raise ValueError(f"unknown message type {t!r}")
    except ConnectionError:
        pass
    finally:
        conn.close()
        lsock.close()
