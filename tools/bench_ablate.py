#!/usr/bin/env python3
"""Ablation timing for the flagship DL/UL slot programs.

The axon tunnel serializes per-op execution under the XLA profiler, so
tools/profile_blocks.py attributions are unreliable there; this tool times
whole pipelined programs (best-of-N batches, copy-free) with components
removed one at a time — differences give honest per-component costs.

Usage: python tools/bench_ablate.py [--iters 30] [--batches 3]
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
    ap.add_argument("--skip-dl", action="store_true")
    ap.add_argument("--skip-ul", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax.numpy as jnp
    from srsran_tpu.phy.slot_programs import CellConfig, dl_slot_fn, ul_slot_fn
    from srsran_tpu.phy.upper.ssb import SsbConfig
    from srsran_tpu.phy.upper.pdsch import PdschConfig
    from srsran_tpu.phy.upper.pdcch import PdcchConfig, CoresetConfig
    from srsran_tpu.phy.upper.pusch import PuschConfig
    from srsran_tpu.phy.upper.pucch import PucchF1Config
    from srsran_tpu.ran.ldpc_params import segment_tb, select_base_graph

    cell = CellConfig(nof_ports=4, nof_rb=273, dft_size=4096, numerology=1)
    ssb = SsbConfig(phys_cell_id=1, ssb_idx=0, l_max=8, sfn=0,
                    first_symbol=2, first_subcarrier=48)
    coreset = CoresetConfig(rb_start=0, nof_rb=48, start_symbol=0, duration=1)
    pdcch = PdcchConfig(coreset=coreset, rnti=0x4601, aggregation_level=8,
                        cce_index=0, payload_bits=60, n_id=1, n_id_data=1)
    pdsch = PdschConfig(rnti=0x4601, rb_start=0, rb_count=273, first_symbol=1,
                        nof_symbols=12, modulation="qam256",
                        target_code_rate=0.8, tbs=835584, nof_layers=4,
                        n_id=1, dmrs_symbols=(2, 11))
    rng = np.random.default_rng(0)
    mib = (jnp.asarray(rng.integers(0, 2, 24).astype(np.int8)),)
    dci = (jnp.asarray(rng.integers(0, 2, 60).astype(np.int8)),)
    tb = (jnp.asarray(rng.integers(0, 2, pdsch.tbs).astype(np.int8)),)

    if not args.skip_dl:
        dl_variants = {
            "dl_full": (((ssb,), (pdcch,), (pdsch,), ()), (mib, dci, tb)),
            "dl_no_ssb": (((), (pdcch,), (pdsch,), ()), ((), dci, tb)),
            "dl_no_pdcch": (((ssb,), (), (pdsch,), ()), (mib, (), tb)),
            "dl_pdsch_only": (((), (), (pdsch,), ()), ((), (), tb)),
            "dl_empty": (((), (), (), ()), ((), (), ())),
        }
        for name, (plan, a) in dl_variants.items():
            us = timeit(dl_slot_fn(cell, plan), a, args.iters, args.batches)
            print(f"{name}: {us:.1f} us")

    if args.skip_ul:
        return
    pusch = PuschConfig(rnti=0x17, rb_start=0, rb_count=273, first_symbol=0,
                        nof_symbols=14, modulation="qam64",
                        target_code_rate=0.7, tbs=311400, nof_layers=2,
                        n_id=1, dmrs_symbols=(2, 7, 11))
    pucch = PucchF1Config(prb=0, start_symbol=0, nof_symbols=14,
                          initial_cyclic_shift=0, time_domain_occ=0, n_id=1)
    seg = segment_tb(pusch.tbs, select_base_graph(pusch.tbs, 0.7))
    softs = (jnp.zeros((seg.nof_codeblocks, seg.codeword_bits), jnp.float32),)
    ue_cfg = PdschConfig(rnti=pusch.rnti, rb_start=0, rb_count=273,
                         first_symbol=0, nof_symbols=14, modulation="qam64",
                         target_code_rate=0.7, tbs=pusch.tbs, nof_layers=2,
                         n_id=1, dmrs_symbols=(2, 7, 11))
    ue_fn = dl_slot_fn(cell, ((), (), (ue_cfg,), ()))
    ul_payload = jnp.asarray(rng.integers(0, 2, pusch.tbs).astype(np.int8))
    rx, _ = ue_fn((), (), (ul_payload,))

    ul_variants = {
        "ul_full": ((pusch,), (), (pucch,), (), ()),
        "ul_no_pucch": ((pusch,), (), (), (), ()),
        "ul_pucch_only": ((), (), (pucch,), (), ()),
        "ul_empty": ((), (), (), (), ()),
    }
    for name, plan in ul_variants.items():
        fn = ul_slot_fn(cell, plan)
        need_soft = softs if plan[0] else ()
        us = timeit(fn, (rx, (), need_soft), args.iters, args.batches)
        print(f"{name}: {us:.1f} us")


if __name__ == "__main__":
    main()
