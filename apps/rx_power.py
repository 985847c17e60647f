#!/usr/bin/env python3
"""rx_power — baseband power analyzer (rx_power_analyzer.cpp analogue).

Mirror of the reference's apps/examples/radio/rx_power_analyzer.cpp:
reads a cf32 sample stream (a .sio file written by the RU file backend /
apps/ssb_tx.py), and reports per-channel average power, peak power, PAPR
and a coarse power spectral density, in dBFS.

Usage: python apps/rx_power.py capture.sio [--fft 1024]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("--fft", type=int, default=1024,
                    help="PSD FFT size (Welch, 50% overlap)")
    ap.add_argument("--block", type=int, default=1 << 16)
    args = ap.parse_args()

    import numpy as np
    from srsran_tpu.io.sampio import SampleFileReader

    rd = SampleFileReader(args.input)
    nch = rd.nof_channels
    total = np.zeros(nch)
    peak = np.zeros(nch)
    count = 0
    psd = np.zeros((nch, args.fft))
    nseg = 0
    win = np.hanning(args.fft)
    while True:
        block = rd.read(args.block)
        if block is None or block.shape[-1] == 0:
            break
        p = np.abs(block) ** 2
        total += p.sum(axis=-1)
        peak = np.maximum(peak, p.max(axis=-1))
        count += block.shape[-1]
        n_fit = (block.shape[-1] // (args.fft // 2) - 1)
        for s in range(max(n_fit, 0)):
            seg = block[:, s * args.fft // 2: s * args.fft // 2 + args.fft]
            if seg.shape[-1] < args.fft:
                break
            spec = np.fft.fftshift(np.fft.fft(seg * win, axis=-1), axes=-1)
            psd += np.abs(spec) ** 2
            nseg += 1
    rd.close()
    if count == 0:
        sys.exit("no samples")

    print(f"{args.input}: {nch} channel(s), {count} samples @ "
          f"{rd.sample_rate:.0f} Sps")
    for ch in range(nch):
        avg = total[ch] / count
        avg_db = 10 * np.log10(max(avg, 1e-30))
        peak_db = 10 * np.log10(max(peak[ch], 1e-30))
        print(f"  ch{ch}: avg {avg_db:6.2f} dBFS   peak {peak_db:6.2f} dBFS"
              f"   PAPR {peak_db - avg_db:5.2f} dB")
    if nseg:
        p = psd / nseg
        occ = (p > p.max(axis=-1, keepdims=True) * 1e-3).mean(axis=-1)
        for ch in range(nch):
            print(f"  ch{ch}: occupied bandwidth ~{occ[ch] * 100:.0f}% of fs")


if __name__ == "__main__":
    main()
