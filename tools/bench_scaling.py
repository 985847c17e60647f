#!/usr/bin/env python3
"""Weak-scaling benchmark: N cells sharded over N devices.

Measures the multi-cell DL+UL slot program on a ('cell','port') mesh at
increasing device counts with cells proportional to devices — the
BASELINE.json >=80% weak-scaling criterion.  On this environment real
multi-chip hardware is unavailable; run with JAX_PLATFORMS=cpu and
--xla_force_host_platform_device_count=N for a virtual-mesh validation, or
on a real pod slice for true numbers.

Prints one JSON line per point: {devices, cells, us_per_slot, efficiency}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "0"
    flags = os.environ.get("XLA_FLAGS", "")
    if "device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags +
                                   " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from srsran_tpu.phy.slot_programs import CellConfig, dl_slot_core, ul_slot_core
    from srsran_tpu.phy.upper.pdsch import PdschConfig
    from srsran_tpu.phy.upper.pusch import PuschConfig
    from srsran_tpu.ran.ldpc_params import segment_tb, select_base_graph

    small = "--cpu" in sys.argv
    if small:
        cell = CellConfig(nof_ports=2, nof_rb=24, dft_size=512, numerology=1,
                          center_freq_hz=0.0)
        pdsch = PdschConfig(rnti=1, rb_start=0, rb_count=24, first_symbol=1,
                            nof_symbols=12, modulation="qam16",
                            target_code_rate=0.5, tbs=6664, nof_layers=2,
                            n_id=1, dmrs_symbols=(2, 11))
        pusch = PuschConfig(rnti=2, rb_start=0, rb_count=24, first_symbol=0,
                            nof_symbols=14, modulation="qam16",
                            target_code_rate=0.5, tbs=5128, nof_layers=1,
                            n_id=1, dmrs_symbols=(2, 7, 11))
    else:
        cell = CellConfig(nof_ports=4, nof_rb=273, dft_size=4096, numerology=1)
        pdsch = PdschConfig(rnti=1, rb_start=0, rb_count=273, first_symbol=1,
                            nof_symbols=12, modulation="qam256",
                            target_code_rate=0.8, tbs=835584, nof_layers=4,
                            n_id=1, dmrs_symbols=(2, 11))
        pusch = PuschConfig(rnti=2, rb_start=0, rb_count=273, first_symbol=0,
                            nof_symbols=14, modulation="qam64",
                            target_code_rate=0.7, tbs=311400, nof_layers=2,
                            n_id=1, dmrs_symbols=(2, 7, 11))

    rng = np.random.default_rng(0)
    seg = segment_tb(pusch.tbs, select_base_graph(pusch.tbs,
                                                  pusch.target_code_rate))

    if "--multicell" in sys.argv:
        # Single-device cell densification: C cells vmapped on one chip
        # (20 MHz cells), the per-cell-slot cost curve.
        cell = CellConfig(nof_ports=4, nof_rb=106, dft_size=2048,
                          numerology=1)
        mc_pdsch = PdschConfig(rnti=1, rb_start=0, rb_count=106,
                               first_symbol=1, nof_symbols=12,
                               modulation="qam256", target_code_rate=0.8,
                               tbs=319784, nof_layers=4, n_id=1,
                               dmrs_symbols=(2, 11))
        mc_pusch = PuschConfig(rnti=2, rb_start=0, rb_count=106,
                               first_symbol=0, nof_symbols=14,
                               modulation="qam64", target_code_rate=0.7,
                               tbs=122536, nof_layers=2, n_id=1,
                               dmrs_symbols=(2, 7, 11))
        mseg = segment_tb(mc_pusch.tbs, select_base_graph(mc_pusch.tbs, 0.7))
        for cells in (1, 4, 8, 16):
            dl = jax.jit(jax.vmap(dl_slot_core(cell, ((), (), (mc_pdsch,), ()))))
            ul = jax.jit(jax.vmap(ul_slot_core(cell, ((mc_pusch,), (), (), (), ()))))
            pay = (jnp.asarray(rng.integers(
                0, 2, (cells, mc_pdsch.tbs)).astype(np.int8)),)
            softs = (jnp.zeros((cells, mseg.nof_codeblocks,
                                mseg.codeword_bits), jnp.float32),)
            s, _ = dl((), (), pay)
            out = ul(s, (), softs)
            jax.block_until_ready(out)
            best = 1e18
            for _ in range(3):
                t0 = time.time()
                keep = []
                for _ in range(20):
                    s, _ = dl((), (), pay)
                    keep.append(ul(s, (), softs))
                jax.block_until_ready(keep)
                best = min(best, (time.time() - t0) / 20 * 1e6)
            print(json.dumps({"cells": cells,
                              "us_per_slot": round(best, 1),
                              "us_per_cell_slot": round(best / cells, 1)}))
        return

    devs = jax.devices()
    base_us = None
    counts = [n for n in (1, 2, 4, 8) if n <= len(devs)]
    for n in counts:
        mesh = Mesh(np.array(devs[:n]).reshape(n, 1), ("cell", "port"))
        sh = NamedSharding(mesh, P("cell"))
        cells = n  # weak scaling: one cell per device
        dl = jax.jit(jax.vmap(dl_slot_core(cell, ((), (), (pdsch,), ()))),
                     in_shardings=sh)
        ul = jax.jit(jax.vmap(ul_slot_core(cell, ((pusch,), (), (), (), ()))),
                     in_shardings=sh)
        pay = (jax.device_put(jnp.asarray(
            rng.integers(0, 2, (cells, pdsch.tbs)).astype(np.int8)), sh),)
        softs = (jax.device_put(jnp.zeros(
            (cells, seg.nof_codeblocks, seg.codeword_bits), jnp.float32), sh),)
        s, _ = dl((), (), pay)
        out = ul(jax.device_put(s, sh), (), softs)
        jax.block_until_ready(out)
        reps = 20
        t0 = time.time()
        for _ in range(reps):
            s, _ = dl((), (), pay)
            out = ul(s, (), softs)
        jax.block_until_ready((s, out))
        us = (time.time() - t0) / reps * 1e6
        if base_us is None:
            base_us = us
        eff = base_us / us
        print(json.dumps({"devices": n, "cells": cells,
                          "us_per_slot": round(us, 1),
                          "weak_scaling_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
