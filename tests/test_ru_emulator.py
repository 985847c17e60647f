"""O-RU emulator app: socket cable, loopback, window/seq checking.

Mirrors the reference's apps/examples/ofh/ru_emulator.cpp role: a DU-side
RuOfh exchanges C/U-plane frames with the emulator over a socketpair and
receives its own DL grid back as UL."""

import socket
import threading

import numpy as np
import jax.numpy as jnp

from srsran_tpu.ru.ofh import RuOfh, SocketEndpoint


def test_socket_endpoint_framing():
    a, b = socket.socketpair()
    ea, eb = SocketEndpoint(a), SocketEndpoint(b)
    assert eb.recv() is None
    ea.send(b"hello")
    ea.send(b"world!!")
    got = []
    for _ in range(100):
        f = eb.recv()
        if f is not None:
            got.append(f)
        if len(got) == 2:
            break
    assert got == [b"hello", b"world!!"]


def test_ru_emulator_loopback():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "apps"))
    import ru_emulator

    a, b = socket.socketpair()
    du = RuOfh(SocketEndpoint(a), nof_ports=2, nof_prb=4)
    metrics_box = {}

    def serve():
        metrics_box.update(ru_emulator.run(
            SocketEndpoint(b), nof_ports=2, nof_prb=4, nof_slots=1,
            loopback_delay=0, poll_sleep_s=0.001))

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    rng = np.random.default_rng(0)
    # |IQ| <= 1: the BFP fixed-point full scale (int16, O-RAN CUS) clips
    # beyond +-1.0 like the reference's float->int16 conversion
    g = 0.25 * (rng.normal(size=(2, 14, 48))
                + 1j * rng.normal(size=(2, 14, 48))).astype(np.complex64)
    assert du.send_dl_grid(jnp.asarray(g), slot=0)
    t.join(timeout=30)
    assert not t.is_alive(), "emulator did not finish"

    back = None
    for _ in range(200):
        back = du.receive_ul_grid(nsym=14)
        if back is not None:
            break
    assert back is not None, "no UL loopback received"
    # BFP 9-bit IQ compression round trip: ~2^-8 relative accuracy
    np.testing.assert_allclose(back, g, atol=2e-2 * np.abs(g).max())
    assert metrics_box["rx_frames"] > 0
    assert metrics_box["dropped_seq"] == 0
