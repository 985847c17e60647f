#!/usr/bin/env python3
"""Per-block device-time report for the flagship DL+UL slot programs.

Analogue of the reference's upper-PHY metrics printout (the per-block
aggregators in lib/phy/upper/metrics/aggregators/): joins an XLA profiler
capture with HLO op_name metadata (see srsran_tpu/utils/device_metrics.py)
and prints device microseconds per named PHY block.

Usage:  python tools/profile_blocks.py [--iters 10] [--small]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--small", action="store_true",
                    help="52-RB cell (fast CPU iteration) instead of 273 RB")
    args = ap.parse_args()

    import numpy as np
    import jax.numpy as jnp
    from srsran_tpu.phy.slot_programs import CellConfig, dl_slot_fn, ul_slot_fn
    from srsran_tpu.phy.upper.ssb import SsbConfig
    from srsran_tpu.phy.upper.pdsch import PdschConfig
    from srsran_tpu.phy.upper.pusch import PuschConfig
    from srsran_tpu.ran.ldpc_params import segment_tb, select_base_graph
    from srsran_tpu.utils import device_metrics

    if args.small:
        cell = CellConfig(nof_ports=2, nof_rb=52, dft_size=1024, numerology=1)
        rb, tbs_dl, tbs_ul, mod_dl = 52, 24576, 16384, "qam64"
    else:
        cell = CellConfig(nof_ports=4, nof_rb=273, dft_size=4096, numerology=1)
        rb, tbs_dl, tbs_ul, mod_dl = 273, 835584, 311400, "qam256"

    ssb = SsbConfig(phys_cell_id=1, ssb_idx=0, l_max=8, sfn=0,
                    first_symbol=2, first_subcarrier=48)
    pdsch = PdschConfig(rnti=0x4601, rb_start=0, rb_count=rb, first_symbol=1,
                        nof_symbols=12, modulation=mod_dl,
                        target_code_rate=0.8, tbs=tbs_dl,
                        nof_layers=min(4, cell.nof_ports), n_id=1,
                        dmrs_symbols=(2, 11))
    dl = dl_slot_fn(cell, ((ssb,), (), (pdsch,), ()))
    rng = np.random.default_rng(0)
    dl_args = ((jnp.asarray(rng.integers(0, 2, 24).astype(np.int8)),), (),
               (jnp.asarray(rng.integers(0, 2, tbs_dl).astype(np.int8)),))

    # UL plan mirrors bench.py's full mix: PUSCH + PRACH occasion + SRS
    from srsran_tpu.phy.upper.prach import PrachConfig, generate_np
    from srsran_tpu.phy.upper.srs import SrsConfig
    pusch = PuschConfig(rnti=0x17, rb_start=0, rb_count=rb - 4,
                        first_symbol=0,
                        nof_symbols=14, modulation="qam64",
                        target_code_rate=0.7, tbs=tbs_ul,
                        nof_layers=min(2, cell.nof_ports), n_id=1,
                        dmrs_symbols=(2, 7, 11))
    prach_cfg = PrachConfig(format="B4", root_sequence_index=39,
                            zero_correlation_zone=10, ra_scs_hz=30_000)
    srs_cfg = SrsConfig(rb_start=rb - 4, rb_count=4, start_symbol=13,
                        nof_symbols=1, comb=2, comb_offset=0,
                        cyclic_shift=0, nof_ports=1, sequence_id=1,
                        numerology=1, rnti=0x17)
    tx_pre = generate_np(prach_cfg, 21)
    k = np.arange(prach_cfg.l_ra)
    ramp = np.exp(-2j * np.pi * k * prach_cfg.scs_hz * 2e-6)
    fd = np.stack([g * tx_pre * ramp
                   for g in np.linspace(0.9, 0.6, cell.nof_ports)])[:, None]
    fd = np.tile(fd, (1, 12, 1)).astype(np.complex64)
    from srsran_tpu.utils.transfer import device_put_complex
    prach_fd = (device_put_complex(fd),)
    ul = ul_slot_fn(cell, ((pusch,), (), (), (), (prach_cfg,), (srs_cfg,)))
    seg = segment_tb(tbs_ul, select_base_graph(tbs_ul, 0.7))
    softs = (jnp.zeros((seg.nof_codeblocks, seg.codeword_bits), jnp.float32),)

    samples, _ = dl(*dl_args)
    # a VALID PUSCH waveform (UE-side TX + SRS) so the LDPC decoder
    # early-stops like the deployment path — profiling the DL waveform as
    # UL input would CRC-fail and always run all 6 sweeps
    from srsran_tpu.ops import ofdm as ofdm_mod
    from srsran_tpu.phy.upper.srs import map_to_grid as map_srs
    ue_cfg = PdschConfig(rnti=pusch.rnti, rb_start=0, rb_count=rb - 4,
                         first_symbol=0, nof_symbols=14, modulation="qam64",
                         target_code_rate=0.7, tbs=tbs_ul,
                         nof_layers=pusch.nof_layers, n_id=1,
                         dmrs_symbols=(2, 7, 11))
    ue_fn = dl_slot_fn(cell, ((), (), (ue_cfg,), ()))
    import jax
    _, ue_grid = ue_fn((), (), (jnp.asarray(
        np.random.default_rng(1).integers(0, 2, tbs_ul).astype(np.int8)),))
    ul_rx = jax.jit(lambda g: ofdm_mod.modulate_slot(
        map_srs(g, srs_cfg), cell.dft_size, cell.numerology,
        center_freq_hz=cell.center_freq_hz))(ue_grid)

    print(f"== DL slot ({rb} RB, {cell.nof_ports} ports), "
          f"{args.iters} iters ==")
    agg = device_metrics.profile_blocks(dl, *dl_args, iters=args.iters)
    for line in device_metrics.report_lines(agg, args.iters):
        print("  " + line)

    print(f"== UL slot ({rb} RB, PUSCH+PRACH+SRS) ==")
    agg = device_metrics.profile_blocks(ul, ul_rx, prach_fd, softs,
                                        iters=args.iters)
    for line in device_metrics.report_lines(agg, args.iters):
        print("  " + line)


if __name__ == "__main__":
    main()
