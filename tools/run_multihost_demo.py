#!/usr/bin/env python3
"""Multi-process jax.distributed DCN slot pipeline + weak-scaling measure.

Runs the ACTUAL multi-cell DL+UL slot programs (parallel.mesh
multi_cell_dl_fn / multi_cell_ul_fn, CRC-verified PUSCH decode) across
jax.distributed processes on one machine (CPU backend, 2 virtual devices
per process), and measures weak scaling: 1 process vs N processes with the
SAME cells per process.

Writes MULTIHOST_SCALING.json:
  {"slots_per_s": {1: .., N: ..}, "cells_per_s": {..},
   "weak_scaling_efficiency": cells_per_s[N] / (N * cells_per_s[1]), ...}

Caveat recorded in the JSON: this host has 2 physical cores, so N
processes SHARE the compute that one process had alone — the measured
efficiency is a lower bound dominated by core sharing, not by the DCN
path the harness exercises (coordinator, global mesh, cross-process
sharded arrays, allgather).  On real multi-host TPUs each process brings
its own chips.

Usage:
  PALLAS_AXON_POOL_IPS= PALLAS_AXON_REMOTE_COMPILE=0 \
      python tools/run_multihost_demo.py [--procs 2] [--slots 20]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_slot_pipeline(mesh, nof_slots: int, depth: int = 0,
                      nof_rb: int = 24):
    """Run nof_slots DL+UL multi-cell slots on the given mesh; returns
    (elapsed_s, nof_cells, crc_ok).

    depth: max slots in flight per process (the analogue of the
    reference's max_processing_delay_slots=5, du_low_config.h:40) —
    slot N+depth only launches once slot N's results are ready, hiding
    the per-dispatch DCN cost behind depth slots of device work.
    0 = unbounded (enqueue everything, block once at the end).
    nof_rb: cell size — deployment-sized cells amortize the fixed
    per-slot cross-process cost that toy cells expose.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from srsran_tpu.phy.slot_programs import CellConfig
    from srsran_tpu.phy.upper.pdsch import PdschConfig
    from srsran_tpu.phy.upper.pusch import PuschConfig
    from srsran_tpu.parallel.mesh import multi_cell_dl_fn, multi_cell_ul_fn
    from srsran_tpu.ran.ldpc_params import segment_tb, select_base_graph
    from jax.sharding import NamedSharding, PartitionSpec as P

    nof_cells = mesh.shape["cell"]
    from srsran_tpu.ran.mcs_tbs import tbs as tbs_calc
    dft = 1 << int(np.ceil(np.log2(nof_rb * 12 / 0.85)))
    cell = CellConfig(nof_ports=2, nof_rb=nof_rb, dft_size=dft,
                      numerology=1, center_freq_hz=0.0)
    t_dl = tbs_calc(nof_rb, 12, 12, "qam16", 0.5, 2)
    t_ul = tbs_calc(nof_rb, 14, 36, "qam16", 0.5, 1)
    pdsch = PdschConfig(rnti=0x10, rb_start=0, rb_count=nof_rb,
                        first_symbol=1,
                        nof_symbols=12, modulation="qam16",
                        target_code_rate=0.5, tbs=t_dl, nof_layers=2,
                        n_id=0, dmrs_symbols=(2,))
    pusch = PuschConfig(rnti=0x11, rb_start=0, rb_count=nof_rb,
                        first_symbol=0,
                        nof_symbols=14, modulation="qam16",
                        target_code_rate=0.5, tbs=t_ul, nof_layers=1,
                        n_id=0, dmrs_symbols=(2, 7, 11))
    dl_plan = ((), (), (pdsch,), ())
    ul_plan = ((pusch,), (), (), (), ())

    rng = np.random.default_rng(0)

    def gshard(local):
        return multihost_utils.host_local_array_to_global_array(
            local, mesh, P("cell"))

    local_cells = nof_cells // jax.process_count()
    dl_fn = multi_cell_dl_fn(cell, dl_plan, nof_cells, mesh)
    ul_fn = multi_cell_ul_fn(cell, ul_plan, nof_cells, mesh)
    dl_payload = gshard(np.ascontiguousarray(
        rng.integers(0, 2, (local_cells, pdsch.tbs)).astype(np.int8)))

    # UE TX per cell closing the UL loop
    ue_cfg = PdschConfig(rnti=pusch.rnti, rb_start=0, rb_count=nof_rb,
                         first_symbol=0, nof_symbols=14, modulation="qam16",
                         target_code_rate=0.5, tbs=pusch.tbs, nof_layers=1,
                         n_id=0, dmrs_symbols=(2, 7, 11))
    ue_fn = multi_cell_dl_fn(cell, ((), (), (ue_cfg,), ()), nof_cells, mesh)
    ul_payload = gshard(np.ascontiguousarray(
        rng.integers(0, 2, (local_cells, pusch.tbs)).astype(np.int8)))
    ue_samples, _ = ue_fn((), (), (ul_payload,))
    rx = jnp.concatenate([ue_samples[:, :1]] * 2, axis=1)

    seg = segment_tb(pusch.tbs, select_base_graph(pusch.tbs, 0.5))
    softs = (gshard(np.zeros(
        (local_cells, seg.nof_codeblocks, seg.codeword_bits), np.float32)),)

    # warm/compile
    out = (dl_fn((), (), (dl_payload,)), ul_fn(rx, (), softs))
    jax.block_until_ready(out)
    crc = np.asarray(multihost_utils.process_allgather(
        out[1]["pusch"][0]["tb_crc_ok"], tiled=True))
    multihost_utils.sync_global_devices("warm")

    t0 = time.time()
    keep = []
    for _ in range(nof_slots):
        keep.append((dl_fn((), (), (dl_payload,))[0],
                     ul_fn(rx, (), softs)["pusch"][0]["tb_crc_ok"]))
        if depth and len(keep) >= depth:
            jax.block_until_ready(keep.pop(0))
    jax.block_until_ready(keep)
    multihost_utils.sync_global_devices("timed")
    elapsed = time.time() - t0
    return elapsed, nof_cells, bool(crc.all())


def worker(pid: int, nprocs: int, nof_slots: int, out_path: str,
           depth: int = 0, nof_rb: int = 24, port: int = 29513):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, REPO)
    import jax
    from srsran_tpu.parallel import multihost

    if nprocs > 1:
        ok = multihost.initialize(f"127.0.0.1:{port}", nprocs, pid)
        assert ok and jax.process_count() == nprocs
    mesh = multihost.global_cell_mesh()
    elapsed, nof_cells, crc_ok = run_slot_pipeline(mesh, nof_slots, depth,
                                                   nof_rb)
    assert crc_ok, "multi-cell UL decode failed"
    if pid == 0:
        res = {"procs": nprocs, "devices": jax.device_count(),
               "mesh": dict(mesh.shape), "nof_slots": nof_slots,
               "depth": depth, "nof_rb": nof_rb,
               "slots_per_s": round(nof_slots / elapsed, 2),
               "cells_per_s": round(nof_slots * nof_cells / elapsed, 2),
               "crc_ok": crc_ok}
        with open(out_path, "w") as f:
            json.dump(res, f)
        print("worker result:", res)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--pin", action="store_true",
                    help="pin each worker to its own CPU core (taskset) so "
                         "cores-per-process stays constant across the 1-proc "
                         "and N-proc runs — the fair weak-scaling protocol "
                         "on a single shared host")
    ap.add_argument("--slots", type=int, default=20)
    ap.add_argument("--depth", type=int, default=0,
                    help="slots in flight per process (0 = unbounded); the "
                         "max_processing_delay_slots analogue")
    ap.add_argument("--depth-sweep", default="",
                    help="comma list of depths to sweep (e.g. 1,2,4,8,0); "
                         "writes the efficiency-vs-depth curve")
    ap.add_argument("--rb", type=int, default=24,
                    help="PRBs per cell (24 = toy; 106/273 = "
                         "deployment-sized, amortizes per-slot DCN cost)")
    ap.add_argument("--worker", type=int, default=-1)
    ap.add_argument("--nprocs", type=int, default=1)
    ap.add_argument("--port", type=int, default=29513)
    ap.add_argument("--out", default="/tmp/mh_result.json")
    args = ap.parse_args()
    if args.worker >= 0:
        worker(args.worker, args.nprocs, args.slots, args.out,
               depth=args.depth, nof_rb=args.rb, port=args.port)
        return

    env = dict(os.environ)

    def launch(nprocs, depth, port):
        out = f"/tmp/mh_result_{nprocs}_{depth}.json"
        if os.path.exists(out):
            os.remove(out)
        procs = [subprocess.Popen(
            ((["taskset", "-c", str(p % (os.cpu_count() or 1))]
              if args.pin else [])
             + [sys.executable, os.path.abspath(__file__), "--worker",
                str(p), "--nprocs", str(nprocs), "--slots", str(args.slots),
                "--depth", str(depth), "--rb", str(args.rb),
                "--port", str(port), "--out", out]), env=env)
            for p in range(nprocs)]
        rcs = [p.wait(timeout=1800) for p in procs]
        # XLA:CPU intermittently SIGABRTs in thread-pool teardown AFTER the
        # measurement completed and the result was written; the result file
        # (written post-measure, pre-teardown) is the success signal.
        if not os.path.exists(out):
            raise AssertionError(f"workers failed rcs={rcs}, no result")
        if rcs != [0] * nprocs:
            print(f"note: worker teardown rcs={rcs} (result file present, "
                  "accepted)")
        return json.load(open(out))

    if args.depth_sweep:
        depths = [int(d) for d in args.depth_sweep.split(",")]
        curve = {}
        port = args.port
        for d in depths:
            base = launch(1, d, port)
            port += 1
            multi = launch(args.procs, d, port)
            port += 1
            eff = multi["cells_per_s"] / (args.procs * base["cells_per_s"])
            curve[str(d)] = {
                "cells_per_s_1p": base["cells_per_s"],
                "cells_per_s_np": multi["cells_per_s"],
                "efficiency": round(eff, 3)}
            print(f"depth {d}: eff {eff:.3f} "
                  f"(1p {base['cells_per_s']}, "
                  f"{args.procs}p {multi['cells_per_s']})")
        best = max(curve.values(), key=lambda v: v["efficiency"])
        summary = {
            "mode": "depth_sweep",
            "procs": args.procs,
            "nof_rb": args.rb,
            "slots": args.slots,
            "pinned": args.pin,
            "depth_curve": curve,
            "best_efficiency": best["efficiency"],
            "target": 0.8,
            "caveat": ("in-flight depth bounds outstanding slots per "
                       "process (max_processing_delay_slots analogue); "
                       "Gloo-TCP-loopback DCN on a 2-core host — real "
                       "multi-host TPU DCN does not share cores or a "
                       "loopback NIC"),
        }
        path = os.path.join(REPO, "MULTIHOST_SCALING.json")
        with open(path, "w") as f:
            json.dump(summary, f, indent=1)
        print("best efficiency:", best["efficiency"])
        print("written:", path)
        return

    results = {}
    for nprocs in (1, args.procs):
        results[nprocs] = launch(nprocs, args.depth, args.port + nprocs)

    base, multi = results[1], results[args.procs]
    eff = multi["cells_per_s"] / (args.procs * base["cells_per_s"])
    summary = {
        "slots_per_s": {str(k): v["slots_per_s"] for k, v in results.items()},
        "cells_per_s": {str(k): v["cells_per_s"] for k, v in results.items()},
        "weak_scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "depth": args.depth,
        "nof_rb": args.rb,
        "pinned": args.pin,
        "caveat": ("each process pinned to its own core: cores-per-process "
                   "constant, efficiency measures DCN/framework overhead"
                   if args.pin else
                   "single machine with 2 physical cores: all processes "
                   "share the cores one process had alone, so this bounds "
                   "the DCN/harness overhead from below; on real multi-host "
                   "TPUs each process adds its own chips"),
        "per_run": results,
    }
    path = os.path.join(REPO, "MULTIHOST_SCALING.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary["slots_per_s"]), "efficiency:", eff)
    print("written:", path)


if __name__ == "__main__":
    main()
