"""Remote control server: JSON commands over WebSocket.

Analogue of the reference's apps/services/remote_control
(remote_server.cpp, remote_command.h): a WebSocket server receives JSON
text messages ``{"cmd": "<name>", ...}``, dispatches them to a registry of
named commands, and answers ``{"cmd": "<name>"}`` on success or
``{"error": "...", "cmd": "..."}`` on failure — the same wire protocol as
the reference (build_success_response / build_error_response,
remote_server.cpp:41-58).  A ``quit`` command is always registered
(quit_remote_command, remote_server.cpp:63-78).

The reference embeds uWebSockets; here the RFC 6455 framing + handshake are
~100 lines of stdlib (no external deps in the TPU image), which also gives
tests a dependency-free client (`connect`).
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import signal
import socket
import struct
import threading

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


class CommandError(Exception):
    """Raised by a command's execute() to report failure to the client."""


class RemoteCommand:
    """Interface mirror of app_services::remote_command (remote_command.h)."""

    name = ""
    description = ""

    def execute(self, payload: dict) -> None:
        raise NotImplementedError


class FunctionCommand(RemoteCommand):
    """Adapter: build a command from a plain callable."""

    def __init__(self, name: str, description: str, fn):
        self.name = name
        self.description = description
        self._fn = fn

    def execute(self, payload: dict) -> None:
        return self._fn(payload)


class _QuitCommand(RemoteCommand):
    name = "quit"
    description = "Quit application"

    def __init__(self, stop_cb=None):
        self._stop_cb = stop_cb

    def execute(self, payload: dict) -> None:
        if self._stop_cb is not None:
            self._stop_cb()
        else:
            os.kill(os.getpid(), signal.SIGTERM)


# ---------------------------------------------------------------------------
# RFC 6455 framing
# ---------------------------------------------------------------------------

def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return buf


def _read_frame(sock: socket.socket):
    """Returns (opcode, payload).  Raises ConnectionError on EOF."""
    b0, b1 = _recv_exact(sock, 2)
    opcode = b0 & 0x0F
    masked = bool(b1 & 0x80)
    length = b1 & 0x7F
    if length == 126:
        (length,) = struct.unpack(">H", _recv_exact(sock, 2))
    elif length == 127:
        (length,) = struct.unpack(">Q", _recv_exact(sock, 8))
    mask = _recv_exact(sock, 4) if masked else b""
    payload = _recv_exact(sock, length) if length else b""
    if masked:
        payload = bytes(c ^ mask[i % 4] for i, c in enumerate(payload))
    return opcode, payload


def _write_frame(sock: socket.socket, payload: bytes, opcode: int = 1,
                 mask: bool = False) -> None:
    b0 = 0x80 | opcode  # FIN + opcode
    header = bytes([b0])
    flag = 0x80 if mask else 0
    n = len(payload)
    if n < 126:
        header += bytes([flag | n])
    elif n < (1 << 16):
        header += bytes([flag | 126]) + struct.pack(">H", n)
    else:
        header += bytes([flag | 127]) + struct.pack(">Q", n)
    if mask:
        key = os.urandom(4)
        payload = bytes(c ^ key[i % 4] for i, c in enumerate(payload))
        header += key
    sock.sendall(header + payload)


def _accept_key(client_key: str) -> str:
    digest = hashlib.sha1((client_key + _WS_GUID).encode()).digest()
    return base64.b64encode(digest).decode()


# ---------------------------------------------------------------------------
# Server
# ---------------------------------------------------------------------------

class RemoteServer:
    """WebSocket JSON command server (remote_server_impl analogue).

    Commands are dispatched on the connection's reader thread — like the
    reference, which executes them inline in the uWS event loop; command
    implementations must hand heavy work to their own executor.
    """

    def __init__(self, commands=(), bind_addr: str = "127.0.0.1",
                 port: int = 0, stop_cb=None):
        self._commands: dict = {}
        self.register(_QuitCommand(stop_cb))
        for cmd in commands:
            self.register(cmd)
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((bind_addr, port))
        self._sock.listen(8)
        self.port = self._sock.getsockname()[1]
        self._stopping = threading.Event()
        self._thread = threading.Thread(target=self._accept_loop,
                                        name="remote_control", daemon=True)

    def register(self, cmd: RemoteCommand) -> None:
        self._commands[cmd.name] = cmd

    def start(self) -> None:
        self._thread.start()

    def stop(self) -> None:
        self._stopping.set()
        try:
            self._sock.close()
        except OSError:
            pass

    # -- internals ----------------------------------------------------------

    def _accept_loop(self) -> None:
        while not self._stopping.is_set():
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            t = threading.Thread(target=self._serve_conn, args=(conn,),
                                 daemon=True)
            t.start()

    def _serve_conn(self, conn: socket.socket) -> None:
        try:
            self._handshake(conn)
            while True:
                opcode, payload = _read_frame(conn)
                if opcode == 8:  # close
                    _write_frame(conn, payload, opcode=8)
                    return
                if opcode == 9:  # ping -> pong
                    _write_frame(conn, payload, opcode=10)
                    continue
                if opcode not in (1, 2):
                    continue
                response = self._handle_command(payload)
                _write_frame(conn, response.encode())
        except (ConnectionError, OSError, ValueError):
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    @staticmethod
    def _handshake(conn: socket.socket) -> None:
        data = b""
        while b"\r\n\r\n" not in data:
            chunk = conn.recv(4096)
            if not chunk:
                raise ConnectionError("eof during handshake")
            data += chunk
        headers = {}
        for line in data.split(b"\r\n")[1:]:
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.strip().lower().decode()] = v.strip().decode()
        key = headers.get("sec-websocket-key")
        if not key:
            conn.sendall(b"HTTP/1.1 400 Bad Request\r\n\r\n")
            raise ConnectionError("not a websocket upgrade")
        conn.sendall((
            "HTTP/1.1 101 Switching Protocols\r\n"
            "Upgrade: websocket\r\nConnection: Upgrade\r\n"
            f"Sec-WebSocket-Accept: {_accept_key(key)}\r\n\r\n").encode())

    def _handle_command(self, raw: bytes) -> str:
        """Mirror of remote_server_impl::handle_command (:155-184)."""
        try:
            req = json.loads(raw.decode())
        except (ValueError, UnicodeDecodeError):
            return json.dumps({"error": "Invalid request: JSON parse error"})
        if not isinstance(req, dict) or "cmd" not in req:
            return json.dumps({"error": "'cmd' object is missing and it is mandatory"})
        name = req["cmd"]
        if not isinstance(name, str):
            return json.dumps({"error": "'cmd' object value type is not valid"})
        cmd = self._commands.get(name)
        if cmd is None:
            return json.dumps(
                {"error": f"Unknown command type: {name}", "cmd": name})
        try:
            result = cmd.execute(req)
        except CommandError as e:
            return json.dumps({"error": str(e), "cmd": name})
        response = {"cmd": name}
        if isinstance(result, dict):  # extension: commands may return data
            response.update(result)
        return json.dumps(response)


# ---------------------------------------------------------------------------
# Minimal client (tests / tooling)
# ---------------------------------------------------------------------------

class RemoteClient:
    def __init__(self, sock: socket.socket):
        self._sock = sock

    def request(self, payload: dict, timeout: float = 5.0) -> dict:
        self._sock.settimeout(timeout)
        _write_frame(self._sock, json.dumps(payload).encode(), mask=True)
        while True:
            opcode, data = _read_frame(self._sock)
            if opcode in (1, 2):
                return json.loads(data.decode())
            if opcode == 8:
                raise ConnectionError("server closed")

    def close(self) -> None:
        try:
            _write_frame(self._sock, b"", opcode=8, mask=True)
        except OSError:
            pass
        self._sock.close()


def connect(host: str = "127.0.0.1", port: int = 0,
            timeout: float = 5.0) -> RemoteClient:
    sock = socket.create_connection((host, port), timeout=timeout)
    key = base64.b64encode(os.urandom(16)).decode()
    sock.sendall((
        f"GET / HTTP/1.1\r\nHost: {host}:{port}\r\n"
        "Upgrade: websocket\r\nConnection: Upgrade\r\n"
        f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
    ).encode())
    data = b""
    while b"\r\n\r\n" not in data:
        chunk = sock.recv(4096)
        if not chunk:
            raise ConnectionError("eof during handshake")
        data += chunk
    status = data.split(b"\r\n", 1)[0]
    if b"101" not in status:
        raise ConnectionError(f"handshake rejected: {status!r}")
    expect = _accept_key(key).encode()
    if expect not in data:
        raise ConnectionError("bad Sec-WebSocket-Accept")
    return RemoteClient(sock)
