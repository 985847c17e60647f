#!/usr/bin/env python3
"""Profile the HOST-side per-slot cost of the SlotConductor launch path.

The conductor's launch is async (no device sync), so wall time of
process_dl/process_ul *without* block_until_ready is the host launch
overhead — the number VERDICT r3 measured at ~600-800 us/slot on TPU.
Run on CPU (host Python work is identical):

  _SRSRAN_TPU_TEST_REEXEC=1 PALLAS_AXON_POOL_IPS= \
  PALLAS_AXON_REMOTE_COMPILE=0 JAX_PLATFORMS=cpu \
  python tools/profile_conductor.py [--cprofile]
"""

import argparse
import cProfile
import dataclasses
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cprofile", action="store_true")
    ap.add_argument("--rb", type=int, default=52)
    ap.add_argument("--slots", type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from srsran_tpu.phy.slot_programs import CellConfig
    from srsran_tpu.phy.upper.pdsch import PdschConfig
    from srsran_tpu.phy.upper.pdcch import PdcchConfig, CoresetConfig
    from srsran_tpu.phy.upper.pusch import PuschConfig
    from srsran_tpu.phy.upper.pucch import PucchF1Config
    from srsran_tpu.fapi.messages import (DlTtiRequest, TxDataRequest,
                                          UlTtiRequest)
    from srsran_tpu.fapi.conductor import SlotConductor
    from srsran_tpu.ran.slot_point import SlotPoint

    rb = args.rb
    dft = 1024 if rb * 12 <= 1024 else 4096
    cell = CellConfig(nof_ports=4, nof_rb=rb, dft_size=dft, numerology=1)
    coreset = CoresetConfig(rb_start=0, nof_rb=48, start_symbol=0, duration=1)
    pdcch = PdcchConfig(coreset=coreset, rnti=0x4601, aggregation_level=8,
                        cce_index=0, payload_bits=60, n_id=1, n_id_data=1)
    tbs = 8 * ((rb * 12 * 11 * 4 * 6 * 7 // 10) // 8)
    pdsch = PdschConfig(rnti=0x4601, rb_start=0, rb_count=rb, first_symbol=1,
                        nof_symbols=12, modulation="qam64",
                        target_code_rate=0.7, tbs=tbs, nof_layers=4,
                        n_id=1, dmrs_symbols=(2, 11))
    utbs = 8 * ((rb * 12 * 11 * 2 * 6 * 7 // 10) // 8)
    pusch = PuschConfig(rnti=0x17, rb_start=0, rb_count=rb, first_symbol=0,
                        nof_symbols=14, modulation="qam64",
                        target_code_rate=0.7, tbs=utbs, nof_layers=2,
                        n_id=1, dmrs_symbols=(2, 7, 11))
    pucch = PucchF1Config(prb=0, start_symbol=0, nof_symbols=14,
                          initial_cyclic_shift=0, time_domain_occ=0, n_id=1)

    rng = np.random.default_rng(0)
    pdsch_pl = np.packbits(rng.integers(0, 2, tbs).astype(np.uint8))
    dci_pl = np.packbits(rng.integers(0, 2, 60).astype(np.uint8))

    def dl_request(i):
        slot = SlotPoint(1, 2 * i)
        return DlTtiRequest(
            slot=slot,
            pdcch=(dataclasses.replace(pdcch, slot_in_frame=slot.slot_index),),
            pdsch=(dataclasses.replace(pdsch, slot_in_frame=slot.slot_index),))

    def ul_request(i):
        slot = SlotPoint(1, 2 * i)
        return UlTtiRequest(
            slot=slot,
            pusch=(dataclasses.replace(pusch, slot_in_frame=slot.slot_index),),
            pucch_f1=(dataclasses.replace(pucch, slot=slot.slot_index),))

    cond = SlotConductor(cell)
    rx = jnp.zeros((cell.nof_ports, cell.slot_samples(0)), jnp.complex64)

    def conductor_slot(i):
        dl_tti = dl_request(i)
        tx = TxDataRequest(slot=dl_tti.slot, pdsch_payloads=(pdsch_pl,),
                           pdcch_payloads=(dci_pl,))
        samples, _ = cond.process_dl(dl_tti, tx, return_grid=False)
        pend = cond.process_ul(ul_request(i), rx)
        return samples, pend

    # warm / compile
    t0 = time.time()
    w = conductor_slot(0)
    jax.block_until_ready((w[0], w[1].scalars))
    print(f"compile: {time.time() - t0:.1f}s")

    # async-launch timing: measure host overhead per stage
    N = args.slots

    def timed(fn, n=N):
        # let the device drain first so backpressure doesn't pollute
        jax.block_until_ready(conductor_slot(0)[0])
        t0 = time.perf_counter()
        keep = [fn(i) for i in range(n)]
        dt = (time.perf_counter() - t0) / n * 1e6
        jax.block_until_ready([k[0] for k in keep])
        return dt

    us_launch = timed(conductor_slot)
    print(f"host launch overhead (dl+ul, async): {us_launch:.1f} us/slot")

    # stage breakdown
    from srsran_tpu.fapi import conductor as cmod
    from srsran_tpu.fapi.validators import validate_dl_tti, validate_tx_data, \
        validate_ul_tti
    reqs = [dl_request(i) for i in range(N)]
    ulreqs = [ul_request(i) for i in range(N)]
    txs = [TxDataRequest(slot=r.slot, pdsch_payloads=(pdsch_pl,),
                         pdcch_payloads=(dci_pl,)) for r in reqs]

    def bench_stage(name, fn):
        t0 = time.perf_counter()
        for i in range(N):
            fn(i)
        print(f"  {name:35s} {(time.perf_counter()-t0)/N*1e6:8.1f} us")

    bench_stage("build requests", lambda i: (dl_request(i), ul_request(i)))
    bits_txs = [TxDataRequest(slot=r.slot,
                              pdsch_payloads=(np.unpackbits(pdsch_pl)[:tbs],),
                              pdcch_payloads=(np.unpackbits(dci_pl)[:60],))
                for r in reqs]
    bench_stage("validate_dl+tx+ul", lambda i: (
        validate_dl_tti(reqs[i], cell), validate_tx_data(bits_txs[i], reqs[i]),
        validate_ul_tti(ulreqs[i], cell)))
    bench_stage("normalize_dl_plan", lambda i: cmod.normalize_dl_plan(reqs[i]))
    bench_stage("normalize_ul_plan", lambda i: cmod.normalize_ul_plan(ulreqs[i]))

    plans = [cmod.normalize_dl_plan(r) for r in reqs]
    ulplans = [cmod.normalize_ul_plan(r) for r in ulreqs]
    from srsran_tpu.phy.slot_programs import dl_slot_fn_samples
    bench_stage("dl_slot_fn lookup", lambda i: dl_slot_fn_samples(
        cell, plans[i][0], reqs[i].slot.subframe_slot_index))
    bench_stage("_packed_ul_fn lookup", lambda i: cmod._packed_ul_fn(
        cell, ulplans[i][0], ulreqs[i].slot.subframe_slot_index))
    bench_stage("payload h2d (jnp.asarray x2)", lambda i: (
        jnp.asarray(np.asarray(pdsch_pl, dtype=np.int8)),
        jnp.asarray(np.asarray(dci_pl, dtype=np.int8))))

    fn = dl_slot_fn_samples(cell, plans[0][0], 0)
    dci_d = jnp.asarray(np.unpackbits(dci_pl)[:60].astype(np.int8))
    sch_d = jnp.asarray(np.unpackbits(pdsch_pl)[:tbs].astype(np.int8))
    bench_stage("dl jit dispatch (device args)", lambda i: fn(
        (), (dci_d,), (sch_d,), plans[0][1]))
    ulfn = cmod._packed_ul_fn(cell, ulplans[0][0], 0)
    softs = tuple(
        cond.harq_pool.get(c.rnti, 0, cond._pusch_soft_shape(c), True)
        for c in ulreqs[0].pusch)
    bench_stage("ul jit dispatch (device args)", lambda i: ulfn(
        rx, (), softs, ulplans[0][1]))
    bench_stage("harq_pool.get", lambda i: tuple(
        cond.harq_pool.get(c.rnti, 0, cond._pusch_soft_shape(c), True)
        for c in ulreqs[i].pusch))

    if args.cprofile:
        pr = cProfile.Profile()
        pr.enable()
        keep = [conductor_slot(i) for i in range(N)]
        pr.disable()
        jax.block_until_ready([k[0] for k in keep])
        stats = pstats.Stats(pr)
        stats.sort_stats("cumulative").print_stats(40)


if __name__ == "__main__":
    main()
