#!/usr/bin/env python3
"""BLER-vs-SNR sweep over TDL fading channels (pxsch_bler_test campaign).

Mirror of the reference's tests/integrationtests/.../pxsch_bler_test.cpp
run as a sweep: PUSCH TX -> TDL channel -> full PUSCH receiver, one JSON
line per (profile, SNR) point.  All slots of a point run as one batched
vmapped program — a BLER campaign that takes the reference minutes per
point finishes in seconds on one chip.

Usage:
  python tools/bler_sweep.py [--profiles TDLA,TDLB] [--snrs 4,6,8,10] \
      [--slots 64] [--mcs qam16:0.5]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profiles", default="TDLA,TDLB,TDLC")
    ap.add_argument("--snrs", default="2,4,6,8,10,14,20")
    ap.add_argument("--slots", type=int, default=64)
    ap.add_argument("--rb", type=int, default=24)
    ap.add_argument("--mcs", default="qam16:0.5")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from srsran_tpu.emulation import channel as chan
    from srsran_tpu.ops import ofdm  # noqa: F401 (imported for parity)
    from srsran_tpu.phy.upper import pdsch as pdsch_mod, pusch
    from srsran_tpu.ran.mcs_tbs import tbs as tbs_calc

    mod, rate = args.mcs.split(":")
    rate = float(rate)
    nof_rb = args.rb
    t = tbs_calc(nof_rb, 14, 12 * 3, mod, rate, 1)
    cfg = pusch.PuschConfig(rnti=0x17, rb_start=0, rb_count=nof_rb,
                            first_symbol=0, nof_symbols=14, modulation=mod,
                            target_code_rate=rate, tbs=t, nof_layers=1,
                            n_id=5, dmrs_symbols=(2, 7, 11))
    tx_cfg = pdsch_mod.PdschConfig(
        rnti=cfg.rnti, rb_start=0, rb_count=nof_rb, first_symbol=0,
        nof_symbols=14, modulation=mod, target_code_rate=rate, tbs=t,
        nof_layers=1, n_id=cfg.n_id, dmrs_symbols=cfg.dmrs_symbols)
    nsc = nof_rb * 12

    def one_slot(key, payload, sinr_db, profile):
        grid = jnp.zeros((1, 14, nsc), dtype=jnp.complex64)
        tx = pdsch_mod.process(grid, payload, tx_cfg,
                               precoding=np.eye(1, dtype=np.complex64))
        ccfg = chan.ChannelConfig(profile=profile, sinr_db=sinr_db,
                                  nof_tx_ports=1, nof_rx_ports=2,
                                  nof_subc=nsc, scs_hz=30000)
        rx, _ = chan.run(key, tx, ccfg)
        res = pusch.process(rx, cfg)
        return res.tb_crc_ok

    rng = np.random.default_rng(0)
    payloads = jnp.asarray(rng.integers(0, 2, (args.slots, t)).astype(np.int8))
    for profile in args.profiles.split(","):
        fn = jax.jit(jax.vmap(lambda k, p, s: one_slot(k, p, s, profile),
                              in_axes=(0, 0, None)), static_argnums=())
        for snr in [float(s) for s in args.snrs.split(",")]:
            keys = jax.random.split(jax.random.PRNGKey(int(snr * 10)),
                                    args.slots)
            ok = np.asarray(fn(keys, payloads, snr))
            bler = 1.0 - ok.mean()
            print(json.dumps({"profile": profile, "snr_db": snr,
                              "bler": round(float(bler), 4),
                              "slots": args.slots, "tbs": t,
                              "mcs": args.mcs, "rb": nof_rb}), flush=True)


if __name__ == "__main__":
    main()
