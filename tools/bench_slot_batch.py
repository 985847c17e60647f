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
    from srsran_tpu.phy.upper.pucch import PucchF1Config
    from srsran_tpu.phy.upper.prach import PrachConfig, generate_np
    from srsran_tpu.phy.upper.srs import SrsConfig, map_to_grid as map_srs
    from srsran_tpu.ops import ofdm as ofdm_mod
    from srsran_tpu.utils.transfer import device_put_complex
    from srsran_tpu.ran.ldpc_params import segment_tb, select_base_graph

    cell = CellConfig(nof_ports=4, nof_rb=273, dft_size=4096, numerology=1)
    pdsch = PdschConfig(rnti=0x4601, rb_start=0, rb_count=273,
                        first_symbol=1, nof_symbols=12, modulation="qam256",
                        target_code_rate=0.8, tbs=835584, nof_layers=4,
                        n_id=1, dmrs_symbols=(2, 11))
    # the bench.py headline UL mix: 269-RB PUSCH + PUCCH F1 + 64-preamble
    # B4 PRACH occasion + SRS
    pusch = PuschConfig(rnti=0x17, rb_start=0, rb_count=269,
                        first_symbol=0, nof_symbols=14, modulation="qam64",
                        target_code_rate=0.7, tbs=311400, nof_layers=2,
                        n_id=1, dmrs_symbols=(2, 7, 11))
    pucch = PucchF1Config(prb=0, start_symbol=0, nof_symbols=14,
                          initial_cyclic_shift=0, time_domain_occ=0, n_id=1)
    prach_cfg = PrachConfig(format="B4", root_sequence_index=39,
                            zero_correlation_zone=10, ra_scs_hz=30_000)
    srs_cfg = SrsConfig(rb_start=269, rb_count=4, start_symbol=13,
                        nof_symbols=1, comb=2, comb_offset=0,
                        cyclic_shift=0, nof_ports=1, sequence_id=1,
                        numerology=1, rnti=0x17)
    ue = PdschConfig(rnti=0x17, rb_start=0, rb_count=269, first_symbol=0,
                     nof_symbols=14, modulation="qam64",
                     target_code_rate=0.7, tbs=pusch.tbs, nof_layers=2,
                     n_id=1, dmrs_symbols=(2, 7, 11))
    rng = np.random.default_rng(0)
    ue_fn = dl_slot_fn(cell, ((), (), (ue,), ()))
    _, ue_grid = ue_fn((), (), (jnp.asarray(
        rng.integers(0, 2, pusch.tbs).astype(np.int8)),))
    rx1 = jax.jit(lambda g: ofdm_mod.modulate_slot(
        map_srs(g, srs_cfg), cell.dft_size, cell.numerology,
        center_freq_hz=cell.center_freq_hz))(ue_grid)
    tx_pre = generate_np(prach_cfg, 21)
    k = np.arange(prach_cfg.l_ra)
    ramp = np.exp(-2j * np.pi * k * prach_cfg.scs_hz * 2e-6)
    fd = np.stack([g * tx_pre * ramp
                   for g in np.linspace(0.9, 0.6, 4)])[:, None]
    fd = np.tile(fd, (1, 12, 1)).astype(np.complex64)
    fd = fd + 0.05 * (rng.standard_normal(fd.shape)
                      + 1j * rng.standard_normal(fd.shape))
    prach_fd = (device_put_complex(fd.astype(np.complex64)),)
    seg = segment_tb(pusch.tbs, select_base_graph(pusch.tbs, 0.7))

    out = {"metric": "slot_batched_throughput_100mhz_4x4",
           "unit": "us/slot", "by_batch": {}}
    nof, batches = 24, 3
    for b in (1, 2, 4):
        dl = jax.jit(jax.vmap(
            dl_slot_core(cell, ((), (), (pdsch,), ()))))
        ul = jax.jit(jax.vmap(
            ul_slot_core(cell, ((pusch,), (), (pucch,), (),
                                (prach_cfg,), (srs_cfg,))),
            in_axes=(0, None, 0)))
        bits = jnp.asarray(rng.integers(
            0, 2, (b, pdsch.tbs)).astype(np.int8))
        rx = jnp.broadcast_to(rx1, (b,) + tuple(rx1.shape))
        softs = (jnp.zeros((b, seg.nof_codeblocks, seg.codeword_bits),
                           jnp.float32),)
        o = (dl((), (), (bits,))[0], ul(rx, prach_fd, softs))
        jax.block_until_ready(o)
        us = []
        for _ in range(batches):
            t0 = time.time()
            keep = []
            for _ in range(nof):
                keep.append(dl((), (), (bits,))[0])
                keep.append(ul(rx, prach_fd, softs)["pusch"][0]["tb_crc_ok"])
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
