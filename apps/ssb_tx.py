#!/usr/bin/env python3
"""ssb_tx — minimal SSB transmitter example (radio_ssb.cpp analogue).

Mirror of the reference's apps/examples/phy/radio_ssb.cpp: generates a
continuous stream of slots carrying SS/PBCH blocks and writes the baseband
waveform to a cf32 file through the RU file backend.

Usage: python apps/ssb_tx.py out.sio [--pci 500] [--frames 1]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("output")
    ap.add_argument("--pci", type=int, default=500)
    ap.add_argument("--frames", type=int, default=1)
    ap.add_argument("--nof-rb", type=int, default=52)
    ap.add_argument("--dft", type=int, default=1024)
    args = ap.parse_args()

    import numpy as np
    from srsran_tpu.phy.slot_programs import CellConfig
    from srsran_tpu.phy.upper.ssb import SsbConfig
    from srsran_tpu.fapi.messages import DlTtiRequest, TxDataRequest
    from srsran_tpu.fapi.conductor import SlotConductor
    from srsran_tpu.ran.slot_point import SlotPoint
    from srsran_tpu.ru import RuFile

    cell = CellConfig(nof_ports=1, nof_rb=args.nof_rb, dft_size=args.dft,
                      numerology=1)
    fs = args.dft * 30_000
    cond = SlotConductor(cell)
    ru = RuFile(1, fs, dl_path=args.output)
    rng = np.random.default_rng(0)
    nof_slots = args.frames * 20  # 10 ms frames at mu=1

    ts = 0
    for count in range(nof_slots):
        slot = SlotPoint(1, count)
        pdus = ()
        mibs = ()
        if slot.slot_index in (0, 1):   # SSB burst in the first two slots
            idx = slot.slot_index
            pdus = (SsbConfig(phys_cell_id=args.pci, ssb_idx=idx, l_max=8,
                              sfn=slot.sfn, first_symbol=2 if idx == 0 else 8,
                              first_subcarrier=(cell.nof_sc - 240) // 2),)
            mibs = (rng.integers(0, 2, 24).astype(np.int8),)
        dl = DlTtiRequest(slot=slot, ssb=pdus)
        tx = TxDataRequest(slot=slot, ssb_mib=mibs)
        samples, _ = cond.process_dl(dl, tx)
        ru.send_dl(np.asarray(samples), ts)
        ts += samples.shape[-1]
    ru.stop()
    print(f"wrote {ts} samples/port at {fs / 1e6:.2f} Msps (PCI {args.pci}) "
          f"to {args.output}")


if __name__ == "__main__":
    main()
