"""E2 agent with KPM (monitoring) and RC (RAN control) service models.

Host-runtime analogue of the reference's E2 stack (lib/e2/, ~9.5 kLoC):
the E2AP procedures (E2 setup, RIC subscription, RIC indication,
subscription delete — lib/e2/e2ap/e2ap_impl and lib/e2/e2sm/e2sm_kpm/*)
carried as length-prefixed JSON over TCP instead of ASN.1/SCTP (ASN.1
transports are out of PHY scope per SURVEY §7.4; the message *semantics*
are kept 1:1 so a RIC-side shim can translate).

Mirrored semantics:
- E2 setup request advertising the supported RAN function (KPM) and its
  measurement types (e2sm_kpm_du_meas_provider_impl.cpp's supported_metrics
  list: CQI/RSRP-style radio measurements, DRB throughput volumes, RRU PRB
  usage counters).
- RIC subscription (ric_request_id, report period, action list with
  measurement types + optional cell/UE scope) accepted/rejected per
  measurement support, like e2sm_kpm_asn1_packer / e2_subscription_manager.
- Periodic RIC indications: one KPM report per period with a header
  (collection start time) and measurement records per type
  (e2sm_kpm report_service_style_1 granularity).

The measurement provider is injected as a callable returning the current
counter snapshot (the du_metrics_interface analogue); the agent computes
per-period deltas for cumulative counters the same way the reference's
meas provider consumes scheduler/MAC metric reports.

RC service model (lib/e2/e2sm/e2sm_rc/): the reference registers a second
RAN function for RIC-initiated control (e2sm_rc_control_service styles,
e2sm_rc_control_action_du_executor.cpp executing slice-level PRB quota
changes on the DU config).  Here the agent advertises RAN function id 3
with its supported control actions and routes ric_control_request to an
injected control handler (the scheduler's apply_ric_control), answering
ric_control_ack / ric_control_failure per the E2AP control procedure.
"""

from __future__ import annotations

import json
import socket
import struct
import threading
import time

# Measurement types supported by the reference's DU KPM provider
# (lib/e2/e2sm/e2sm_kpm/e2sm_kpm_du_meas_provider_impl.cpp) mapped to the
# counters this PHY runtime produces.  "cumulative" metrics are reported as
# per-period deltas; "gauge" metrics as the latest value.
SUPPORTED_MEAS = {
    "DRB.UEThpDl": "gauge",        # DL throughput, kbit/s
    "DRB.UEThpUl": "gauge",        # UL throughput, kbit/s
    "DRB.RlcSduTransmittedVolumeDL": "cumulative",  # kbit
    "DRB.RlcSduTransmittedVolumeUL": "cumulative",
    "RRU.PrbTotDl": "gauge",       # mean PRBs used per slot
    "RRU.PrbTotUl": "gauge",
    "RRU.PrbAvailDl": "gauge",
    "RRU.PrbAvailUl": "gauge",
    "L1M.UL-SNR": "gauge",         # dB (PUSCH estimate)
    "L1M.PUSCH-CRC-OK": "cumulative",
    "L1M.PUSCH-CRC-NOK": "cumulative",
    "L1M.PRACH-Detected": "cumulative",
    "L1M.SlotsProcessed": "cumulative",
}


def _send_msg(sock: socket.socket, obj: dict) -> None:
    data = json.dumps(obj).encode()
    sock.sendall(struct.pack(">I", len(data)) + data)


def _recv_msg(sock: socket.socket) -> dict | None:
    hdr = b""
    while len(hdr) < 4:
        chunk = sock.recv(4 - len(hdr))
        if not chunk:
            return None
        hdr += chunk
    n = struct.unpack(">I", hdr)[0]
    data = b""
    while len(data) < n:
        chunk = sock.recv(n - len(data))
        if not chunk:
            return None
        data += chunk
    return json.loads(data)


# Control actions supported by the RC service model, mirroring the
# executor set of e2sm_rc_control_action_du_executor.cpp (slice PRB quota
# -> qos_weight; UE-level MCS control; cell admin state).
SUPPORTED_CONTROLS = ("set_ue_mcs_cap", "set_ue_qos_weight",
                      "cell_stop", "cell_start")


class E2Agent:
    """E2 agent: connects to a RIC, handles KPM subscriptions, pushes
    periodic indications, and executes RC control requests.
    provider() -> {meas_name: value} snapshot;
    control_handler(action, params) -> result dict (raises on failure)."""

    def __init__(self, ric_addr: str, ric_port: int, provider,
                 gnb_id: int = 411, plmn: str = "00101",
                 control_handler=None):
        self._addr = (ric_addr, ric_port)
        self._provider = provider
        self._control_handler = control_handler
        self._gnb_id = gnb_id
        self._plmn = plmn
        self._sock: socket.socket | None = None
        self._subs: dict[int, dict] = {}
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._seq = 0

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> None:
        self._sock = socket.create_connection(self._addr, timeout=5.0)
        _send_msg(self._sock, {
            "msg": "e2_setup_request",
            "gnb_id": self._gnb_id, "plmn": self._plmn,
            "ran_functions": [{
                "ran_function_id": 2,  # the reference registers KPM as id 2
                "oid": "1.3.6.1.4.1.53148.1.2.2.2",  # e2sm_kpm OID
                "meas_types": sorted(SUPPORTED_MEAS)},
                *([] if self._control_handler is None else [{
                    "ran_function_id": 3,  # reference: RC is id 3
                    "oid": "1.3.6.1.4.1.53148.1.1.2.3",  # e2sm_rc OID
                    "control_actions": list(SUPPORTED_CONTROLS)}])],
        })
        resp = _recv_msg(self._sock)
        if not resp or resp.get("msg") != "e2_setup_response":
            raise ConnectionError(f"E2 setup failed: {resp}")
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="e2-agent")
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2.0)
        if self._sock:
            try:
                self._sock.close()
            except OSError:
                pass

    # -- main loop ---------------------------------------------------------

    def _run(self) -> None:
        assert self._sock is not None
        self._sock.settimeout(0.05)
        while not self._stop.is_set():
            try:
                msg = _recv_msg(self._sock)
                if msg is None:
                    return
                self._handle(msg)
            except socket.timeout:
                pass
            except OSError:
                return
            now = time.monotonic()
            for sub in self._subs.values():
                if now >= sub["next_report"]:
                    self._send_indication(sub)
                    sub["next_report"] = now + sub["period_s"]

    def _handle(self, msg: dict) -> None:
        kind = msg.get("msg")
        if kind == "ric_subscription_request":
            req_id = msg["ric_request_id"]
            meas = [m for m in msg.get("meas_types", [])
                    if m in SUPPORTED_MEAS]
            rejected = [m for m in msg.get("meas_types", [])
                        if m not in SUPPORTED_MEAS]
            if not meas:
                _send_msg(self._sock, {"msg": "ric_subscription_failure",
                                       "ric_request_id": req_id,
                                       "cause": "no supported measurements"})
                return
            self._subs[req_id] = {
                "ric_request_id": req_id,
                "meas_types": meas,
                "period_s": msg.get("report_period_ms", 1000) / 1e3,
                "next_report": time.monotonic(),
                "prev": dict(self._provider()),
                "t0": time.time(),
            }
            _send_msg(self._sock, {"msg": "ric_subscription_response",
                                   "ric_request_id": req_id,
                                   "admitted": meas, "not_admitted": rejected})
        elif kind == "ric_subscription_delete_request":
            req_id = msg["ric_request_id"]
            self._subs.pop(req_id, None)
            _send_msg(self._sock, {"msg": "ric_subscription_delete_response",
                                   "ric_request_id": req_id})
        elif kind == "ric_control_request":
            # E2AP RIC control procedure through the RC service model
            # (e2sm_rc_control_service -> du executor): execute, ack/fail.
            req_id = msg.get("ric_request_id", 0)
            action = msg.get("action")
            if self._control_handler is None \
                    or action not in SUPPORTED_CONTROLS:
                _send_msg(self._sock, {
                    "msg": "ric_control_failure", "ric_request_id": req_id,
                    "cause": f"unsupported control action {action!r}"})
                return
            try:
                outcome = self._control_handler(action,
                                                msg.get("params", {}))
            except Exception as e:  # noqa: BLE001 — fault isolation to NACK
                _send_msg(self._sock, {
                    "msg": "ric_control_failure", "ric_request_id": req_id,
                    "cause": str(e)})
                return
            _send_msg(self._sock, {
                "msg": "ric_control_ack", "ric_request_id": req_id,
                "action": action, "outcome": outcome or {}})

    def _send_indication(self, sub: dict) -> None:
        snap = dict(self._provider())
        records = {}
        for m in sub["meas_types"]:
            val = snap.get(m, 0.0)
            if SUPPORTED_MEAS[m] == "cumulative":
                records[m] = val - sub["prev"].get(m, 0.0)
            else:
                records[m] = val
        sub["prev"] = snap
        self._seq += 1
        _send_msg(self._sock, {
            "msg": "ric_indication",
            "ric_request_id": sub["ric_request_id"],
            "sequence": self._seq,
            "header": {"collection_start_time": time.time(),
                       "gnb_id": self._gnb_id},
            "message": {"granularity_period_ms": sub["period_s"] * 1e3,
                        "meas_data": records},
        })


class RicServer:
    """Minimal RIC-side endpoint (near-RT-RIC test double): accepts one E2
    agent, answers setup, and records indications.  Test analogue of the
    reference's e2 mock gateways (tests/unittests/e2/common/)."""

    def __init__(self, port: int = 0):
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind(("127.0.0.1", port))
        self._srv.listen(1)
        self.port = self._srv.getsockname()[1]
        self.setup: dict | None = None
        self.indications: list[dict] = []
        self.responses: list[dict] = []
        self._conn: socket.socket | None = None
        self._lock = threading.Lock()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="ric-server")
        self._thread.start()

    def _run(self) -> None:
        conn, _ = self._srv.accept()
        self._conn = conn
        while True:
            msg = _recv_msg(conn)
            if msg is None:
                return
            if msg.get("msg") == "e2_setup_request":
                self.setup = msg
                _send_msg(conn, {"msg": "e2_setup_response",
                                 "accepted": [f["ran_function_id"]
                                              for f in msg["ran_functions"]]})
            elif msg.get("msg") == "ric_indication":
                with self._lock:
                    self.indications.append(msg)
            else:
                with self._lock:
                    self.responses.append(msg)

    def subscribe(self, ric_request_id: int, meas_types: list,
                  report_period_ms: int = 100) -> None:
        _send_msg(self._conn, {"msg": "ric_subscription_request",
                               "ric_request_id": ric_request_id,
                               "meas_types": meas_types,
                               "report_period_ms": report_period_ms})

    def delete_subscription(self, ric_request_id: int) -> None:
        _send_msg(self._conn, {"msg": "ric_subscription_delete_request",
                               "ric_request_id": ric_request_id})

    def control(self, ric_request_id: int, action: str,
                params: dict | None = None) -> None:
        """RIC-initiated control (e2sm_rc): ack/failure arrives via
        wait_response()."""
        _send_msg(self._conn, {"msg": "ric_control_request",
                               "ric_request_id": ric_request_id,
                               "ran_function_id": 3, "action": action,
                               "params": params or {}})

    def wait_indications(self, n: int, timeout_s: float = 5.0) -> list:
        t0 = time.monotonic()
        while time.monotonic() - t0 < timeout_s:
            with self._lock:
                if len(self.indications) >= n:
                    return list(self.indications)
            time.sleep(0.01)
        with self._lock:
            return list(self.indications)

    def wait_response_for(self, ric_request_id: int,
                          timeout_s: float = 5.0) -> dict | None:
        """Wait for the response matching a specific request id (avoids
        racing a previous request's ack)."""
        t0 = time.monotonic()
        while time.monotonic() - t0 < timeout_s:
            with self._lock:
                for r in self.responses:
                    if r.get("ric_request_id") == ric_request_id:
                        return r
            time.sleep(0.01)
        return None

    def wait_response(self, timeout_s: float = 5.0) -> dict | None:
        t0 = time.monotonic()
        while time.monotonic() - t0 < timeout_s:
            with self._lock:
                if self.responses:
                    return self.responses[-1]
            time.sleep(0.01)
        return None

    def close(self) -> None:
        for s in (self._conn, self._srv):
            if s:
                try:
                    s.close()
                except OSError:
                    pass
