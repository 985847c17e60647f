#!/usr/bin/env python3
"""ru_emulator — standalone O-RU endpoint emulator (split 7.2).

Analogue of the reference's apps/examples/ofh/ru_emulator.cpp: answers a
DU's Open-Fronthaul C/U-plane on a cable, with reception-window and
sequence-id checking, and (optionally) loops each received DL slot grid
back as UL after a configurable slot delay — so an OFH DU (`ru/ofh.py`
RuOfh) can be exercised end-to-end without radio hardware.

The cable is a framed TCP socket (`ru.ofh.SocketEndpoint`; 4-byte length
prefix per eth frame — this container cannot open raw eth/DPDK, the frame
bytes are identical).

Usage:
  python apps/ru_emulator.py --listen 9400 [--ports 2] [--prb 52]
      [--loopback-delay 1] [--slots 100]
"""

import argparse
import os
import socket
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(endpoint, nof_ports: int, nof_prb: int, nof_slots: int,
        loopback_delay: int = 1, numerology: int = 1,
        time_fn=time.time, poll_sleep_s: float = 0.0005):
    """Serve ``nof_slots`` slot exchanges; returns the RU-side metrics."""
    import numpy as np
    import jax.numpy as jnp
    from srsran_tpu.ofh.timing import OfhTiming
    from srsran_tpu.ru.ofh import RuOfh

    timing = OfhTiming(numerology, time_fn=time_fn)
    ru = RuOfh(endpoint, nof_ports=nof_ports, nof_prb=nof_prb,
               timing=timing)
    nsym = 14
    pending = []                      # (due_slot_count, grid)
    served = 0
    slot_count = 0
    idle_since = time.monotonic()
    while served < nof_slots:
        grid = ru.receive_ul_grid(nsym)   # drains whatever the DU sent
        if grid is not None:
            pending.append((slot_count + loopback_delay, grid))
            served += 1
            idle_since = time.monotonic()
        # transmit any due loopback grids as UL U-plane, stamped with the
        # OTA slot the samples belong to (now): UL messages are judged by
        # the DU's Ta4 RX window, not the T1a TX window (send_dl_grid only
        # gates direction=1), so an on-time RU stamps "now" and the DU's
        # RxWindowChecker classifies it within [Ta4_min, Ta4_max].
        for due, g in [p for p in pending]:
            if due <= slot_count:
                ota = timing.clock.now()
                tgt = ota.count // ota.nof_symbols
                spf = 10 * (1 << numerology)
                sif = tgt % spf
                from srsran_tpu.utils.transfer import device_put_complex
                ru.send_dl_grid(device_put_complex(g),
                                slot=sif % (1 << numerology),
                                subframe=sif >> numerology,
                                frame_id=(tgt // spf) % 256, direction=0)
                pending.remove((due, g))
        slot_count += 1
        if grid is None:
            if time.monotonic() - idle_since > 10.0:
                break                  # DU went away
            time.sleep(poll_sleep_s)
    return ru.metrics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--listen", type=int, default=9400)
    ap.add_argument("--ports", type=int, default=2)
    ap.add_argument("--prb", type=int, default=52)
    ap.add_argument("--slots", type=int, default=100)
    ap.add_argument("--loopback-delay", type=int, default=1)
    args = ap.parse_args()

    from srsran_tpu.ru.ofh import SocketEndpoint
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", args.listen))
    srv.listen(1)
    print(f"ru_emulator listening on 127.0.0.1:{args.listen}", flush=True)
    conn, peer = srv.accept()
    print(f"DU connected from {peer}", flush=True)
    metrics = run(SocketEndpoint(conn), args.ports, args.prb, args.slots,
                  loopback_delay=args.loopback_delay)
    print(f"ru_emulator done: {metrics}")


if __name__ == "__main__":
    main()
