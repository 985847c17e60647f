#!/usr/bin/env python3
"""du_low — standalone split-6 DU-low: upper PHY + FAPI over a socket.

Analogue of the reference's apps/du_low (du_low.cpp): no MAC in this
process — a remote MAC (e.g. apps/gnb_sim.py --split6, or any FapiClient)
drives the PHY with FAPI slot messages over TCP.  UL antenna samples enter
through `rx_samples` messages (the RU-emulator path) in lieu of a radio.

Usage:
  python apps/du_low.py [-c config.yaml] [--set cell.nof_rb=52] [--port 9000]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", default=None)
    ap.add_argument("--set", action="append", default=[])
    ap.add_argument("--port", type=int, default=0,
                    help="FAPI TCP port (0 = ephemeral, printed on stdout)")
    args = ap.parse_args()

    from srsran_tpu.utils import config as config_mod
    cfg = config_mod.load(args.config, args.set)

    import jax
    from srsran_tpu.fapi.transport import serve_phy

    print(f"du_low: cell {cfg.cell.nof_rb} RB mu={cfg.cell.numerology} "
          f"{cfg.cell.nof_ports} ports on {jax.devices()[0]}")

    def ready(port):
        print(f"du_low: FAPI listening on 127.0.0.1:{port}", flush=True)

    serve_phy(port=args.port, ready_cb=ready)
    print("du_low: client disconnected, exiting")


if __name__ == "__main__":
    main()
