#!/usr/bin/env python3
"""Micro-benchmark: the batched LDPC decoder on the bench UL shape.

Times the XLA gather-plan decoder (ops/ldpc_decode.py) on the flagship UL
workload shape (37 codeblocks, BG1, Z=384, 6 layered min-sum iterations).
The two hand-scheduled Pallas kernels it used to compare against measured
slower (44.9/54.5 vs 31.7 us — VPU-issue-bound roofline, see BASELINE.md)
and were retired in r4.  Copy-free timing (block_until_ready only),
best-of-N batches — see CLAUDE.md tunnel gotchas.

Usage: python tools/bench_ldpc_decoder.py [--iters 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batches", type=int, default=3)
    ap.add_argument("--nof-cb", type=int, default=37)
    ap.add_argument("--z", type=int, default=384)
    ap.add_argument("--bg", type=int, default=1)
    ap.add_argument("--layers", type=int, default=13)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from srsran_tpu.ops import ldpc_encode, ldpc_decode

    rng = np.random.default_rng(0)
    k_cols = 22 if args.bg == 1 else 10
    bits = rng.integers(0, 2, size=(args.nof_cb, k_cols * args.z)).astype(np.int8)
    # Copy-free: never np.asarray a device array (flips the tunnel into
    # ~100x per-op sync mode for the rest of the process — CLAUDE.md).
    code = ldpc_encode.encode(jnp.asarray(bits), args.bg, args.z)
    noise = rng.normal(0, 1.0, code.shape).astype(np.float32)
    llr = 6.0 * (1 - 2.0 * code.astype(jnp.float32)) + jnp.asarray(noise)
    mask = np.ones(code.shape[1], np.float32)
    mask[: 2 * args.z] = 0.0
    x = jax.device_put(llr * jnp.asarray(mask))
    nof_code_bits = int(code.shape[1])

    variants = {
        "xla": lambda v: ldpc_decode.decode(v, args.bg, args.z, args.layers),
    }

    results = []
    for name, fn in variants.items():
        out = fn(x)
        jax.block_until_ready(out)  # compile
        # correctness signal kept on device until after ALL timing (a d2h
        # copy would poison the remaining variants' numbers)
        ok = jnp.all(out[0][:, : k_cols * args.z] == jnp.asarray(bits))
        best = float("inf")
        for _ in range(args.batches):
            t0 = time.time()
            keep = [fn(x) for _ in range(args.iters)]
            jax.block_until_ready(keep)
            best = min(best, (time.time() - t0) / args.iters * 1e6)
        results.append((name, best, ok))
    for name, best, ok in results:
        gbps = args.nof_cb * nof_code_bits / best / 1e3
        print(f"{name}: {best:.1f} us/decode  ({gbps:.1f} Gbit/s coded)  "
              f"bits_ok={bool(ok)}")


if __name__ == "__main__":
    main()
