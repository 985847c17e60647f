"""Remote control server: wire-protocol parity with remote_server.cpp."""

import threading

from srsran_tpu.utils import remote_control as rc


def _start(commands=(), stop_cb=None):
    srv = rc.RemoteServer(commands=commands, stop_cb=stop_cb)
    srv.start()
    return srv


def test_command_dispatch_and_errors():
    calls = []

    def do_set(payload):
        calls.append(payload)
        if payload.get("ssb_block_power_dbm", 0) < -60:
            raise rc.CommandError("power out of range")

    cmd = rc.FunctionCommand("ssb_set", "Modifies the SSB parameters", do_set)
    srv = _start([cmd], stop_cb=lambda: None)
    try:
        cli = rc.connect(port=srv.port)
        # Success: response carries only the command name (remote_server.cpp:53-58)
        resp = cli.request({"cmd": "ssb_set", "ssb_block_power_dbm": -10})
        assert resp == {"cmd": "ssb_set"}
        assert calls[-1]["ssb_block_power_dbm"] == -10
        # Command failure -> error + cmd echo
        resp = cli.request({"cmd": "ssb_set", "ssb_block_power_dbm": -90})
        assert resp["cmd"] == "ssb_set" and "out of range" in resp["error"]
        # Unknown command
        resp = cli.request({"cmd": "nope"})
        assert "Unknown command type: nope" in resp["error"]
        # Missing cmd key
        resp = cli.request({"x": 1})
        assert "mandatory" in resp["error"]
        # Wrong cmd value type
        resp = cli.request({"cmd": 3})
        assert "not valid" in resp["error"]
        cli.close()
    finally:
        srv.stop()


def test_quit_invokes_stop_callback():
    stopped = threading.Event()
    srv = _start(stop_cb=stopped.set)
    try:
        cli = rc.connect(port=srv.port)
        resp = cli.request({"cmd": "quit"})
        assert resp == {"cmd": "quit"}
        assert stopped.wait(2.0)
        cli.close()
    finally:
        srv.stop()


def test_command_returning_data():
    cmd = rc.FunctionCommand("metrics", "Report metrics",
                             lambda p: {"report": [{"name": "dl", "count": 3}]})
    srv = _start([cmd], stop_cb=lambda: None)
    try:
        cli = rc.connect(port=srv.port)
        resp = cli.request({"cmd": "metrics"})
        assert resp["cmd"] == "metrics"
        assert resp["report"][0]["count"] == 3
        cli.close()
    finally:
        srv.stop()


def test_large_frame_roundtrip():
    # >125-byte payloads exercise the 16-bit length path both directions.
    big = "x" * 70000
    cmd = rc.FunctionCommand("echo", "", lambda p: {"data": p["data"]})
    srv = _start([cmd], stop_cb=lambda: None)
    try:
        cli = rc.connect(port=srv.port)
        resp = cli.request({"cmd": "echo", "data": big}, timeout=10.0)
        assert resp["data"] == big
        cli.close()
    finally:
        srv.stop()
