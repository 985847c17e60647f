#!/usr/bin/env python3
"""Split-6 deployment proof: du_low serving FAPI ON THE TPU, MAC client
in a separate CPU process, UL indications resolved on device and
delivered over the wire (VERDICT r4 #6's second half).

Launches `apps/du_low.py` with the default (TPU tunnel) environment,
then drives N DL+UL slots from THIS process as the MAC: the client
builds the UE waveform on CPU, sends `rx_samples`, and receives
CRC/RxData indications in the `ul_tti` reply — the server-side
`PendingSlotResults.resolve()` (d2h) runs on the real device every slot.

Prints a per-slot latency log + summary, and writes DU_LOW_TPU_DRIVE.txt.
"""

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# The axon plugin registers at interpreter startup (sitecustomize) and
# in-process env mutation cannot disable it (same reason tests re-exec):
# re-exec THIS process with the CPU env for the client, stashing the
# original (TPU tunnel) environment for the server subprocess.
if not os.environ.get("_DRIVE_REEXEC"):
    env = dict(os.environ,
               _DRIVE_REEXEC="1",
               _DRIVE_SERVER_ENV=json.dumps(dict(os.environ)),
               JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               PALLAS_AXON_REMOTE_COMPILE="0")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def main():
    nof_slots = int(os.environ.get("DRIVE_SLOTS", "20"))
    server_env = json.loads(os.environ["_DRIVE_SERVER_ENV"])
    server_env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".jax_cache")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "apps", "du_low.py"),
         "--port", "0", "--set", "cell.nof_rb=24",
         "--set", "cell.dft_size=512", "--set", "cell.nof_ports=2"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=server_env, cwd=REPO)
    lines = []
    try:
        port = None
        for line in proc.stdout:
            lines.append(line.rstrip())
            print("server:", line.rstrip(), flush=True)
            m = re.search(r"FAPI listening on 127.0.0.1:(\d+)", line)
            if m:
                port = int(m.group(1))
                break
        assert port, "du_low did not report a port"

        import numpy as np
        import jax.numpy as jnp
        from srsran_tpu.fapi import transport
        from srsran_tpu.fapi.messages import (DlTtiRequest, TxDataRequest,
                                              UlTtiRequest)
        from srsran_tpu.phy.slot_programs import CellConfig, dl_slot_fn
        from srsran_tpu.phy.upper.pdsch import PdschConfig
        from srsran_tpu.phy.upper.pusch import PuschConfig
        from srsran_tpu.ran.slot_point import SlotPoint

        cell = CellConfig(nof_ports=2, nof_rb=24, dft_size=512, numerology=1)
        pusch = PuschConfig(rnti=0x17, rb_start=0, rb_count=24,
                            first_symbol=0, nof_symbols=14,
                            modulation="qam16", target_code_rate=0.5,
                            tbs=8448, nof_layers=1, n_id=1,
                            dmrs_symbols=(2, 7, 11))
        pdsch = PdschConfig(rnti=0x46, rb_start=0, rb_count=24,
                            first_symbol=1, nof_symbols=12,
                            modulation="qam16", target_code_rate=0.5,
                            tbs=8192, nof_layers=2, n_id=1,
                            dmrs_symbols=(2, 11))
        ue = PdschConfig(rnti=0x17, rb_start=0, rb_count=24, first_symbol=0,
                         nof_symbols=14, modulation="qam16",
                         target_code_rate=0.5, tbs=pusch.tbs, nof_layers=1,
                         n_id=1, dmrs_symbols=(2, 7, 11))
        rng = np.random.default_rng(0)
        ue_fn = dl_slot_fn(cell, ((), (), (ue,), ()))
        payload = rng.integers(0, 2, pusch.tbs).astype(np.int8)
        rx = np.asarray(ue_fn((), (), (jnp.asarray(payload),))[0])

        cli = transport.FapiClient("127.0.0.1", port, timeout=600.0)
        cli.configure(cell)
        # warmup: one slot end-to-end pays the server compiles + the
        # tunnel's one-time first-d2h init, reported separately
        t0 = time.time()
        slot = SlotPoint(1, 0)
        cli.dl_tti(DlTtiRequest(slot=slot, pdsch=(pdsch,)),
                   TxDataRequest(slot=slot, pdsch_payloads=(
                       rng.integers(0, 2, pdsch.tbs).astype(np.int8),)))
        cli.rx_samples(rx)
        cli.ul_tti_nb(UlTtiRequest(slot=slot, pusch=(pusch,)))
        warm = cli.flush()
        warm_s = time.time() - t0
        assert len(warm) == 1 and warm[0].crc[0].tb_crc_ok
        lines.append(f"warmup: {warm_s:.1f} s (compiles + first-d2h init)")
        print(lines[-1], flush=True)
        slot_ms = []
        # PIPELINED indications (ul_tti_nb): the PHY resolves 2 slots
        # behind the launch front and pushes results — the MAC never
        # blocks per slot (the in-process PendingSlotResults pattern,
        # now over the wire)
        t_steady = time.time()
        for k in range(nof_slots):
            slot = SlotPoint(1, 2 * (k + 1))
            t0 = time.time()
            cli.dl_tti(DlTtiRequest(slot=slot, pdsch=(pdsch,)),
                       TxDataRequest(slot=slot, pdsch_payloads=(
                           rng.integers(0, 2, pdsch.tbs).astype(np.int8),)))
            cli.rx_samples(rx)
            cli.ul_tti_nb(UlTtiRequest(slot=slot, pusch=(pusch,)))
            ms = (time.time() - t0) * 1e3
            slot_ms.append(ms)
            line = f"slot {2 * (k + 1)}: launch {ms:8.1f} ms"
            lines.append(line)
            print(line, flush=True)
        t0 = time.time()
        results = cli.flush()
        flush_s = time.time() - t0
        steady_s = time.time() - t_steady
        cli.stop()
        crc_ok = sum(bool(r.crc and r.crc[0].tb_crc_ok) for r in results)
        pay_ok = sum(bool(r.rx_data and np.array_equal(
            r.rx_data[0].payload.astype(np.int8), payload))
            for r in results)
        steady = sorted(slot_ms)
        summary = (
            f"du_low ON TPU split-6 drive (PIPELINED indications, "
            f"resolve_lag=2): warmup {warm_s:.1f} s (compiles + first-d2h "
            f"init), then {nof_slots} DL+UL slots over the wire, CRC "
            f"{crc_ok}/{nof_slots} ok, payload {pay_ok}/{nof_slots} ok; "
            f"launch median {steady[len(steady)//2]:.1f} ms/slot, "
            f"STEADY end-to-end {steady_s/nof_slots*1e3:.1f} ms/slot "
            f"(launches + resolve-behind + flush tail {flush_s:.1f} s) — "
            f"vs ~101 ms/slot with per-slot synchronous ul_tti")
        lines.append(summary)
        print(summary, flush=True)
        assert crc_ok == nof_slots and pay_ok == nof_slots, \
            "CRC/payload failures over the split-6 wire"
        with open(os.path.join(REPO, "DU_LOW_TPU_DRIVE.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
        print("written: DU_LOW_TPU_DRIVE.txt")
    finally:
        if proc.poll() is None:
            proc.kill()


if __name__ == "__main__":
    main()
