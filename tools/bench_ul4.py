#!/usr/bin/env python3
"""4-layer UL MIMO slot on the flagship cell — a BEYOND-REFERENCE point.

The reference's UL equalizer caps at ZF 1-2 layers / MMSE 1 layer
(channel_equalizer_generic_impl.cpp:265-271); this framework decodes
4-layer PUSCH through the same fused slot program.  Measures the
273-RB 4x4 4-layer QAM64 PUSCH full receive (CRC early stop) with the
same pipelined copy-free protocol as bench.py and prints ONE JSON line.
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
    from srsran_tpu.phy.slot_programs import CellConfig, dl_slot_fn
    from srsran_tpu.phy.upper.pdsch import PdschConfig
    from srsran_tpu.phy.upper.pusch import PuschConfig
    from srsran_tpu.fapi.conductor import normalize_ul_plan, _packed_ul_fn
    from srsran_tpu.fapi.messages import UlTtiRequest
    from srsran_tpu.ran.slot_point import SlotPoint
    from srsran_tpu.ran.ldpc_params import segment_tb, select_base_graph
    from srsran_tpu.ran.mcs_tbs import tbs as tbs_calc

    cell = CellConfig(nof_ports=4, nof_rb=273, dft_size=4096, numerology=1)
    t = tbs_calc(273, 14, 36, "qam64", 0.6, 4)
    pusch = PuschConfig(rnti=0x17, rb_start=0, rb_count=273,
                        first_symbol=0, nof_symbols=14, modulation="qam64",
                        target_code_rate=0.6, tbs=t, nof_layers=4,
                        n_id=1, dmrs_symbols=(2, 7, 11))
    ue = PdschConfig(rnti=0x17, rb_start=0, rb_count=273, first_symbol=0,
                     nof_symbols=14, modulation="qam64",
                     target_code_rate=0.6, tbs=t, nof_layers=4, n_id=1,
                     dmrs_symbols=(2, 7, 11))
    rng = np.random.default_rng(0)
    ue_fn = dl_slot_fn(cell, ((), (), (ue,), ()))
    rx, _ = ue_fn((), (), (jnp.asarray(
        rng.integers(0, 2, t).astype(np.int8)),))
    rx.block_until_ready()

    ul = UlTtiRequest(slot=SlotPoint(1, 0), pusch=(pusch,))
    plan, ctx = normalize_ul_plan(ul)
    fn = _packed_ul_fn(cell, plan, 0)
    seg = segment_tb(t, select_base_graph(t, 0.6))
    softs = (jnp.zeros((seg.nof_codeblocks, seg.codeword_bits),
                       jnp.float32),)
    t0 = time.time()
    out = fn(rx, (), softs, ctx)
    jax.block_until_ready(out[0])
    compile_s = time.time() - t0

    nof, batches = 40, 3
    us = []
    for _ in range(batches):
        t0 = time.time()
        keep = [fn(rx, (), softs, ctx)[0] for _ in range(nof)]
        jax.block_until_ready(keep)
        us.append((time.time() - t0) / nof * 1e6)
    print(json.dumps({
        "metric": "ul_4layer_slot_100mhz_4x4",
        "value": round(min(us), 1), "unit": "us/slot",
        "median": round(sorted(us)[len(us) // 2], 1),
        "batch_us": [round(b, 1) for b in us],
        "tbs": int(t), "compile_s": round(compile_s, 1),
        "tput_gbps": round(t / min(us) * 1e6 / 1e9, 2),
        "device": str(jax.devices()[0]),
        "note": ("4-layer ZF UL decode: beyond the reference's 1-2 layer "
                 "equalizer cap")}), flush=True)


if __name__ == "__main__":
    main()
