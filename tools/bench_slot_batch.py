#!/usr/bin/env python3
"""Slot-batched THROUGHPUT mode on the flagship 100 MHz cell.

The reference's PUSCH benchmark has a throughput mode (many transport
blocks in flight across threads, pusch_processor_benchmark.cpp); the
TPU-native equivalent vmaps the FULL DL and UL slot programs over a
batch of B slots — one dispatch per B slots amortizes the tunnel's
fixed launch cost and deepens chip utilization.  B slots of added
latency stays inside the reference's own 5-slot processing pipeline
(max_processing_delay_slots, du_low_config.h:40) for B <= 4.

Prints ONE JSON line with us/slot per batch size.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(REPO, ".jax_cache"))
    import jax
    import jax.numpy as jnp
    from srsran_tpu.phy.slot_programs import (CellConfig, dl_slot_core,
                                              ul_slot_core, dl_slot_fn)
    from srsran_tpu.phy.upper.pdsch import PdschConfig
    from srsran_tpu.phy.upper.pusch import PuschConfig
    from srsran_tpu.ran.ldpc_params import segment_tb, select_base_graph

    cell = CellConfig(nof_ports=4, nof_rb=273, dft_size=4096, numerology=1)
    pdsch = PdschConfig(rnti=0x4601, rb_start=0, rb_count=273,
                        first_symbol=1, nof_symbols=12, modulation="qam256",
                        target_code_rate=0.8, tbs=835584, nof_layers=4,
                        n_id=1, dmrs_symbols=(2, 11))
    pusch = PuschConfig(rnti=0x17, rb_start=0, rb_count=273,
                        first_symbol=0, nof_symbols=14, modulation="qam64",
                        target_code_rate=0.7, tbs=311400, nof_layers=2,
                        n_id=1, dmrs_symbols=(2, 7, 11))
    ue = PdschConfig(rnti=0x17, rb_start=0, rb_count=273, first_symbol=0,
                     nof_symbols=14, modulation="qam64",
                     target_code_rate=0.7, tbs=pusch.tbs, nof_layers=2,
                     n_id=1, dmrs_symbols=(2, 7, 11))
    rng = np.random.default_rng(0)
    ue_fn = dl_slot_fn(cell, ((), (), (ue,), ()))
    rx1, _ = ue_fn((), (), (jnp.asarray(
        rng.integers(0, 2, pusch.tbs).astype(np.int8)),))
    seg = segment_tb(pusch.tbs, select_base_graph(pusch.tbs, 0.7))

    out = {"metric": "slot_batched_throughput_100mhz_4x4",
           "unit": "us/slot", "by_batch": {}}
    nof, batches = 24, 3
    for b in (1, 2, 4):
        dl = jax.jit(jax.vmap(
            dl_slot_core(cell, ((), (), (pdsch,), ()))))
        ul = jax.jit(jax.vmap(
            ul_slot_core(cell, ((pusch,), (), (), (), ()))))
        bits = jnp.asarray(rng.integers(
            0, 2, (b, pdsch.tbs)).astype(np.int8))
        rx = jnp.broadcast_to(rx1, (b,) + tuple(rx1.shape))
        softs = (jnp.zeros((b, seg.nof_codeblocks, seg.codeword_bits),
                           jnp.float32),)
        o = (dl((), (), (bits,))[0], ul(rx, (), softs))
        jax.block_until_ready(o)
        us = []
        for _ in range(batches):
            t0 = time.time()
            keep = []
            for _ in range(nof):
                keep.append(dl((), (), (bits,))[0])
                keep.append(ul(rx, (), softs)["pusch"][0]["tb_crc_ok"])
            jax.block_until_ready(keep)
            us.append((time.time() - t0) / (nof * b) * 1e6)
        out["by_batch"][str(b)] = {
            "best_us_per_slot": round(min(us), 1),
            "median_us_per_slot": round(sorted(us)[len(us) // 2], 1),
            "batch_us": [round(x, 1) for x in us]}
    b1 = out["by_batch"]["1"]["best_us_per_slot"]
    b4 = out["by_batch"]["4"]["best_us_per_slot"]
    out["value"] = b4
    out["speedup_b4_vs_b1"] = round(b1 / b4, 2)
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
