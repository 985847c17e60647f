#!/usr/bin/env python3
"""Same-process A/B of the rate match/dematch formulations (gather-plan vs
slice+transpose) on the flagship UL and DL slot programs.

The tunnel has 1.5-2x run-to-run variance BETWEEN processes; alternating
both variants inside one process several times gives honest deltas.
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
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax
    import numpy as np
    import jax.numpy as jnp
    from srsran_tpu.ops import ldpc_rate_match as rm
    from srsran_tpu.phy.slot_programs import CellConfig, dl_slot_core, \
        ul_slot_core
    from srsran_tpu.phy.upper.pdsch import PdschConfig
    from srsran_tpu.phy.upper.pusch import PuschConfig
    from srsran_tpu.ran.ldpc_params import segment_tb, select_base_graph

    cell = CellConfig(nof_ports=4, nof_rb=273, dft_size=4096, numerology=1)
    pdsch = PdschConfig(rnti=0x4601, rb_start=0, rb_count=273, first_symbol=1,
                        nof_symbols=12, modulation="qam256",
                        target_code_rate=0.8, tbs=835584, nof_layers=4,
                        n_id=1, dmrs_symbols=(2, 11))
    pusch = PuschConfig(rnti=0x17, rb_start=0, rb_count=273, first_symbol=0,
                        nof_symbols=14, modulation="qam64",
                        target_code_rate=0.7, tbs=311400, nof_layers=2,
                        n_id=1, dmrs_symbols=(2, 7, 11))
    rng = np.random.default_rng(0)
    tb = (jnp.asarray(rng.integers(0, 2, pdsch.tbs).astype(np.int8)),)
    seg = segment_tb(pusch.tbs, select_base_graph(pusch.tbs, 0.7))
    softs = (jnp.zeros((seg.nof_codeblocks, seg.codeword_bits), jnp.float32),)

    ue_cfg = PdschConfig(rnti=pusch.rnti, rb_start=0, rb_count=273,
                         first_symbol=0, nof_symbols=14, modulation="qam64",
                         target_code_rate=0.7, tbs=pusch.tbs, nof_layers=2,
                         n_id=1, dmrs_symbols=(2, 7, 11))
    rm.RM_IMPL = "gather"
    ue_fn = jax.jit(dl_slot_core(cell, ((), (), (ue_cfg,), ())))
    ul_payload = jnp.asarray(rng.integers(0, 2, pusch.tbs).astype(np.int8))
    rx, _ = ue_fn((), (), (ul_payload,))
    rx.block_until_ready()

    fns = {}
    for impl in ("gather", "slice"):
        rm.RM_IMPL = impl
        fns[f"dl_{impl}"] = (jax.jit(
            dl_slot_core(cell, ((), (), (pdsch,), ()))), ((), (), tb))
        fns[f"ul_{impl}"] = (jax.jit(
            ul_slot_core(cell, ((pusch,), (), (), (), ()))),
            (rx, (), softs))
    results = {k: [] for k in fns}
    for _ in range(args.rounds):
        for name, (fn, a) in fns.items():
            results[name].append(timeit(fn, a, args.iters, args.batches))
    for name, vals in results.items():
        print(f"{name}: {min(vals):.1f} us  (rounds: "
              + ", ".join(f"{v:.1f}" for v in vals) + ")")


if __name__ == "__main__":
    main()
