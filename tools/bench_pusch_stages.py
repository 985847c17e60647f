#!/usr/bin/env python3
"""Per-stage PUSCH receiver timing on the flagship UL shape.

Each stage is its own jitted program timed with the pipelined copy-free
method (profiler attribution is unreliable through the tunnel).  Stages
overlap in coverage, so differences give per-stage costs:

  chest   = DM-RS channel estimate only
  front   = estimate + gather + equalize
  llrs    = front + demap + descramble (codeword_llrs)
  full    = llrs + rate dematch + LDPC decode + CRC (process)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, iters, batches):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(batches):
        t0 = time.time()
        keep = [fn(*args) for _ in range(iters)]
        jax.block_until_ready(keep)
        best = min(best, (time.time() - t0) / iters * 1e6)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batches", type=int, default=3)
    args = ap.parse_args()

    import jax
    import numpy as np
    import jax.numpy as jnp
    from srsran_tpu.phy.slot_programs import CellConfig, dl_slot_fn
    from srsran_tpu.phy.upper import pusch as pusch_mod
    from srsran_tpu.phy.upper.pdsch import PdschConfig
    from srsran_tpu.ops import ofdm
    from srsran_tpu.ran.ldpc_params import segment_tb, select_base_graph

    cell = CellConfig(nof_ports=4, nof_rb=273, dft_size=4096, numerology=1)
    pusch = pusch_mod.PuschConfig(
        rnti=0x17, rb_start=0, rb_count=273, first_symbol=0,
        nof_symbols=14, modulation="qam64", target_code_rate=0.7,
        tbs=311400, nof_layers=2, n_id=1, dmrs_symbols=(2, 7, 11))
    rng = np.random.default_rng(0)
    ue_cfg = PdschConfig(rnti=pusch.rnti, rb_start=0, rb_count=273,
                         first_symbol=0, nof_symbols=14, modulation="qam64",
                         target_code_rate=0.7, tbs=pusch.tbs, nof_layers=2,
                         n_id=1, dmrs_symbols=(2, 7, 11))
    ue_fn = dl_slot_fn(cell, ((), (), (ue_cfg,), ()))
    payload = jnp.asarray(rng.integers(0, 2, pusch.tbs).astype(np.int8))
    rx, _ = ue_fn((), (), (payload,))

    seg = segment_tb(pusch.tbs, select_base_graph(pusch.tbs, 0.7))
    soft = jnp.zeros((seg.nof_codeblocks, seg.codeword_bits), jnp.float32)

    demod = jax.jit(lambda s: ofdm.demodulate_slot(
        s, cell.nof_sc, cell.dft_size, cell.numerology))
    grid = demod(rx)
    grid.block_until_ready()

    stages = {
        "ofdm_demod": (demod, (rx,)),
        "chest": (jax.jit(lambda g: pusch_mod.estimate_channel(g, pusch)),
                  (grid,)),
        "front": (jax.jit(lambda g: pusch_mod._frontend_hop(g, pusch)[:2]),
                  (grid,)),
        "llrs": (jax.jit(lambda g: pusch_mod.codeword_llrs(g, pusch)[0]),
                 (grid,)),
        "full": (jax.jit(lambda g, sb: pusch_mod.process(
            g, pusch, soft_buffer=sb).tb_crc_ok), (grid, soft)),
    }
    for name, (fn, a) in stages.items():
        us = timeit(fn, a, args.iters, args.batches)
        print(f"{name}: {us:.1f} us")


if __name__ == "__main__":
    main()
