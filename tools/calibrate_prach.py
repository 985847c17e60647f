#!/usr/bin/env python3
"""Calibrate PRACH detection thresholds (reference LUT analogue).

The reference ships measured thresholds keyed by (ports, format, zcz,
combine) in prach_detector_generic_thresholds.h.  This tool runs noise-only
Monte-Carlo trials through our detector and stores the metric quantile for
a 0.1% false-alarm target per configuration in
srsran_tpu/data/prach_thresholds.json.

Run: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/calibrate_prach.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from srsran_tpu.phy.upper import prach

    trials = int(os.environ.get("CAL_TRIALS", "300"))
    out = {}
    cases = []
    for fmt in ("0", "B4"):
        for zcz in (0, 1, 5, 10):
            for ports in (1, 2, 4):
                cases.append((fmt, zcz, ports))
    rng = np.random.default_rng(0)
    for fmt, zcz, ports in cases:
        cfg = prach.PrachConfig(format=fmt, root_sequence_index=1,
                                zero_correlation_zone=zcz,
                                ra_scs_hz=15000 if fmt == "B4" else 0)
        nsym = 1 if fmt == "0" else 12
        detect = jax.jit(lambda rx: prach.detect(rx, cfg).metrics)
        maxima = []
        for t in range(trials):
            rx = (rng.normal(size=(ports, nsym, cfg.l_ra))
                  + 1j * rng.normal(size=(ports, nsym, cfg.l_ra))) / np.sqrt(2)
            m = np.asarray(detect(jnp.asarray(rx.astype(np.complex64))))
            maxima.append(m.max())
        maxima = np.sort(np.array(maxima))
        # threshold at the 99.9% quantile of the noise-only max metric,
        # with 20% margin (the reference applies a margin too).
        thr = float(maxima[int(len(maxima) * 0.999) - 1] * 1.2)
        out[f"{fmt}:{zcz}:{ports}"] = round(thr, 3)
        print(fmt, zcz, ports, "->", round(thr, 3))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "srsran_tpu", "data",
        "prach_thresholds.json")
    json.dump(out, open(path, "w"), indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
