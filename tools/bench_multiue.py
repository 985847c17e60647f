#!/usr/bin/env python3
"""Multi-UE slot on the flagship cell: N PDSCH+PDCCH / N PUSCH+PUCCH PDUs.

The reference's du_high benchmark measures slots/s with many UEs
(tests/benchmarks/du_high/du_high_benchmark.cpp); here the PHY-side
equivalent: ONE fused slot program carrying N independent UE PDUs in
each direction, pipelined copy-free.  Prints ONE JSON line with per-slot
and per-UE costs (marginal PDU cost = how the fused program amortizes
per-UE overhead vs the 1-UE flagship).

Usage: [UES=8] python tools/bench_multiue.py
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
    n_ue = int(os.environ.get("UES", "8"))
    import jax
    import jax.numpy as jnp
    from srsran_tpu.phy.slot_programs import CellConfig, dl_slot_fn
    from srsran_tpu.phy.upper.pdsch import PdschConfig
    from srsran_tpu.phy.upper.pusch import PuschConfig
    from srsran_tpu.phy.upper.pdcch import PdcchConfig, CoresetConfig
    from srsran_tpu.phy.upper.pucch import PucchF1Config
    from srsran_tpu.fapi.conductor import (normalize_dl_plan,
                                           normalize_ul_plan,
                                           _packed_ul_fn)
    from srsran_tpu.fapi.messages import DlTtiRequest, UlTtiRequest
    from srsran_tpu.ran.slot_point import SlotPoint
    from srsran_tpu.ran.ldpc_params import segment_tb, select_base_graph
    from srsran_tpu.ran.mcs_tbs import tbs as tbs_calc

    cell = CellConfig(nof_ports=4, nof_rb=273, dft_size=4096, numerology=1)
    rb_dl = 273 // n_ue
    rb_ul = (273 - 1) // n_ue
    coreset = CoresetConfig(rb_start=0, nof_rb=48, start_symbol=0,
                            duration=1)
    pdcch = [PdcchConfig(coreset=coreset, rnti=0x4601 + u,
                         aggregation_level=2, cce_index=(2 * u) % 8,
                         payload_bits=40, n_id=1, n_id_data=1)
             for u in range(n_ue)]
    t_dl = tbs_calc(rb_dl, 12, 24, "qam64", 0.6, 2)
    pdsch = [PdschConfig(rnti=0x4601 + u, rb_start=u * rb_dl,
                         rb_count=rb_dl, first_symbol=1, nof_symbols=12,
                         modulation="qam64", target_code_rate=0.6, tbs=t_dl,
                         nof_layers=2, n_id=1, dmrs_symbols=(2, 11))
             for u in range(n_ue)]
    t_ul = tbs_calc(rb_ul, 14, 36, "qam16", 0.5, 1)
    pusch = [PuschConfig(rnti=0x4601 + u, rb_start=u * rb_ul,
                         rb_count=rb_ul, first_symbol=0, nof_symbols=14,
                         modulation="qam16", target_code_rate=0.5, tbs=t_ul,
                         nof_layers=1, n_id=1, dmrs_symbols=(2, 7, 11))
             for u in range(n_ue)]
    pucch = [PucchF1Config(prb=272, start_symbol=0, nof_symbols=14,
                           initial_cyclic_shift=(3 * u) % 12,
                           time_domain_occ=0, n_id=1)
             for u in range(n_ue)]
    rng = np.random.default_rng(0)

    slot = SlotPoint(1, 0)
    dl = DlTtiRequest(slot=slot, pdcch=tuple(pdcch), pdsch=tuple(pdsch))
    dl_plan, dl_ctx = normalize_dl_plan(dl, (), cell.nof_ports)
    dfn = dl_slot_fn(cell, dl_plan, 0)
    dl_args = ((), tuple(jnp.asarray(rng.integers(0, 2, 40).astype(np.int8))
                         for _ in range(n_ue)),
               tuple(jnp.asarray(rng.integers(0, 2, t_dl).astype(np.int8))
                     for _ in range(n_ue)))

    # UE waveforms: all UL PDUs through one TX slot program
    ue_cfgs = tuple(PdschConfig(
        rnti=p.rnti, rb_start=p.rb_start, rb_count=p.rb_count,
        first_symbol=0, nof_symbols=14, modulation="qam16",
        target_code_rate=0.5, tbs=t_ul, nof_layers=1, n_id=1,
        dmrs_symbols=(2, 7, 11)) for p in pusch)
    ue_fn = dl_slot_fn(cell, ((), (), ue_cfgs, ()))
    rx, _ = ue_fn((), (), tuple(
        jnp.asarray(rng.integers(0, 2, t_ul).astype(np.int8))
        for _ in range(n_ue)))
    rx.block_until_ready()

    ul = UlTtiRequest(slot=slot, pusch=tuple(pusch), pucch_f1=tuple(pucch))
    ul_plan, ul_ctx = normalize_ul_plan(ul)
    ufn = _packed_ul_fn(cell, ul_plan, 0)
    segs = [segment_tb(t_ul, select_base_graph(t_ul, 0.5))
            for _ in range(n_ue)]
    softs = tuple(jnp.zeros((s.nof_codeblocks, s.codeword_bits),
                            jnp.float32) for s in segs)

    t0 = time.time()
    jax.block_until_ready((dfn((), dl_args[1], dl_args[2], dl_ctx)[0],
                           ufn(rx, (), softs, ul_ctx)[0]))
    compile_s = time.time() - t0

    nof, batches = 40, 3
    us = []
    for _ in range(batches):
        t0 = time.time()
        keep = []
        for _ in range(nof):
            keep.append(dfn((), dl_args[1], dl_args[2], dl_ctx)[0])
            keep.append(ufn(rx, (), softs, ul_ctx)[0])
        jax.block_until_ready(keep)
        us.append((time.time() - t0) / nof * 1e6)
    best = min(us)
    print(json.dumps({
        "metric": f"dl+ul_slot_{n_ue}ue_100mhz_4x4",
        "value": round(best, 1), "unit": "us/slot",
        "median": round(sorted(us)[len(us) // 2], 1),
        "batch_us": [round(b, 1) for b in us],
        "nof_ue": n_ue, "us_per_ue": round(best / n_ue, 1),
        "dl_tbs_per_ue": int(t_dl), "ul_tbs_per_ue": int(t_ul),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0])}), flush=True)


if __name__ == "__main__":
    main()
