#!/usr/bin/env python3
"""A/B: complex64 vs cbf16 (PackedGrid) resource grid on the flagship cell.

Measures the raw DL (samples-only) + UL slot programs with
CellConfig.grid_cbf16 off/on in ONE process (halves tunnel run-to-run
variance), copy-free, best-of-N batches.  Decides the reference's cbf16
design point (resource_grid_impl.h:40-64) for the TPU grid layout; the
verdict goes to BASELINE.md.

Usage: python tools/bench_cbf16_ab.py   (TPU; env defaults)
       BENCH_SLOTS=30 BENCH_BATCHES=3 ... for quicker runs
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(repo, ".jax_cache"))
    import jax
    import jax.numpy as jnp
    from srsran_tpu.phy.slot_programs import (CellConfig, dl_slot_fn,
                                              dl_slot_fn_samples, ul_slot_fn)
    from srsran_tpu.phy.upper.pdsch import PdschConfig
    from srsran_tpu.phy.upper.pdcch import PdcchConfig, CoresetConfig
    from srsran_tpu.phy.upper.pusch import PuschConfig
    from srsran_tpu.phy.upper.pucch import PucchF1Config

    nof_slots = int(os.environ.get("BENCH_SLOTS", "50"))
    nof_batches = int(os.environ.get("BENCH_BATCHES", "3"))

    cell64 = CellConfig(nof_ports=4, nof_rb=273, dft_size=4096, numerology=1)
    cellbf = dataclasses.replace(cell64, grid_cbf16=True)

    coreset = CoresetConfig(rb_start=0, nof_rb=48, start_symbol=0, duration=1)
    pdcch = PdcchConfig(coreset=coreset, rnti=0x4601, aggregation_level=8,
                        cce_index=0, payload_bits=60, n_id=1, n_id_data=1)
    pdsch = PdschConfig(rnti=0x4601, rb_start=0, rb_count=273, first_symbol=1,
                        nof_symbols=12, modulation="qam256",
                        target_code_rate=0.8, tbs=835584, nof_layers=4,
                        n_id=1, dmrs_symbols=(2, 11))
    pusch = PuschConfig(rnti=0x17, rb_start=0, rb_count=273, first_symbol=0,
                        nof_symbols=14, modulation="qam64",
                        target_code_rate=0.7, tbs=311400, nof_layers=2,
                        n_id=1, dmrs_symbols=(2, 7, 11))
    pucch = PucchF1Config(prb=0, start_symbol=0, nof_symbols=14,
                          initial_cyclic_shift=0, time_domain_occ=0, n_id=1)

    rng = np.random.default_rng(0)
    sch = jnp.asarray(rng.integers(0, 2, pdsch.tbs).astype(np.int8))
    dci = jnp.asarray(rng.integers(0, 2, 60).astype(np.int8))
    ul_payload = jnp.asarray(rng.integers(0, 2, pusch.tbs).astype(np.int8))

    # UE TX once (c64 path) -> identical rx samples for both receivers
    ue_cfg = PdschConfig(rnti=pusch.rnti, rb_start=0, rb_count=273,
                         first_symbol=0, nof_symbols=14, modulation="qam64",
                         target_code_rate=0.7, tbs=pusch.tbs, nof_layers=2,
                         n_id=1, dmrs_symbols=(2, 7, 11))
    rx, _ = dl_slot_fn(cell64, ((), (), (ue_cfg,), ()))((), (), (ul_payload,))
    jax.block_until_ready(rx)

    dl_plan = ((), (pdcch,), (pdsch,), ())
    ul_plan = ((pusch,), (), (pucch,), (), ())

    out = {"metric": "cbf16_ab_100mhz_4x4", "unit": "us/slot",
           "nof_slots": nof_slots}
    fns = {}
    for tag, cell in (("c64", cell64), ("cbf16", cellbf)):
        t0 = time.time()
        dfn = dl_slot_fn_samples(cell, dl_plan)
        ufn = ul_slot_fn(cell, ul_plan)
        d0 = dfn((), (dci,), (sch,))
        u0 = ufn(rx, (), None)
        jax.block_until_ready((d0, u0))
        out[f"{tag}_compile_s"] = round(time.time() - t0, 1)
        fns[tag] = (dfn, ufn)

    # Interleaved batches (c64 batch, cbf16 batch, c64, ...) so tunnel
    # drift hits both sides equally; best-of-N per side.
    def batch(launch):
        t0 = time.time()
        keep = [launch() for _ in range(nof_slots)]
        jax.block_until_ready(keep)
        return (time.time() - t0) / nof_slots * 1e6

    launches = {}
    for tag, (dfn, ufn) in fns.items():
        launches[f"{tag}"] = (lambda d=dfn, u=ufn:
                              (d((), (dci,), (sch,)), u(rx, (), None)))
        launches[f"{tag}_dl"] = lambda d=dfn: d((), (dci,), (sch,))
        launches[f"{tag}_ul"] = lambda u=ufn: u(rx, (), None)
    results = {k: [] for k in launches}
    for _ in range(nof_batches):
        for k, launch in launches.items():
            results[k].append(batch(launch))
    for k, us in results.items():
        out[f"{k}_us"] = round(min(us), 1)
        out[f"{k}_batches"] = [round(u, 1) for u in us]
    out["speedup"] = round(out["c64_us"] / out["cbf16_us"], 3)
    out["speedup_dl"] = round(out["c64_dl_us"] / out["cbf16_dl_us"], 3)
    out["speedup_ul"] = round(out["c64_ul_us"] / out["cbf16_ul_us"], 3)
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
