"""Lower-PHY baseband processor: timestamp slaving, TTI advance, PRACH FSM."""

import numpy as np

from srsran_tpu.phy.lower.baseband import (BasebandProcessor,
                                           PrachOccasionRequest)
from srsran_tpu.ru import RuDummy


class RecordingRu(RuDummy):
    """RuDummy that records (timestamp, nof_samples) of every DL send and
    serves a deterministic UL ramp so window placement is checkable."""

    def __init__(self, nof_ports, total):
        super().__init__(nof_ports)
        self.sent = []
        self.ul = (np.arange(total, dtype=np.float32)[None, :]
                   .repeat(nof_ports, 0).astype(np.complex64))
        self.pos = 0

    def send_dl(self, samples, timestamp=0):
        self.sent.append((timestamp, samples.shape[-1]))

    def receive_ul(self, count):
        if self.pos + count > self.ul.shape[-1]:
            return None
        s = self.ul[:, self.pos:self.pos + count]
        ts, self.pos = self.pos, self.pos + count
        return s, ts


def test_tti_advance_and_timestamp_slaving():
    ru = RecordingRu(2, 200_000)
    ttis, rxs = [], []
    bb = BasebandProcessor(ru, nof_ports=2, dft_size=128, numerology=1,
                           tx_time_offset=256, nof_slot_tti_in_advance=2,
                           tti_notifier=ttis.append,
                           rx_notifier=lambda s, x, ts: rxs.append((s, ts)))
    bb.start()
    assert ttis == [0, 1]          # primed n slots in advance at start
    nsamp = bb.slot_samples(0)
    for s in range(4):
        bb.push_dl(s, np.zeros((2, bb.slot_samples(s)), np.complex64))
    bb.run(4)
    # each tick notifies slot+advance
    assert ttis == [0, 1, 2, 3, 4, 5]
    # tx timestamps are rx timestamps + tx_time_offset
    assert [t for t, _ in ru.sent] == [r[1] + 256 for r in rxs]
    assert bb.metrics["tx_slots"] == 4 and bb.metrics["late_dl"] == 0


def test_late_dl_transmits_silence_and_counts():
    ru = RecordingRu(1, 50_000)
    bb = BasebandProcessor(ru, nof_ports=1, dft_size=128, numerology=0)
    bb.start()
    bb.run(2)                      # nothing pushed
    assert bb.metrics["late_dl"] == 2
    assert bb.metrics["tx_slots"] == 2


def test_prach_window_straddles_slot_boundary():
    """A short-format window beginning near the end of slot 1 must collect
    samples across the slot-2 boundary (prach_processor_worker.h:56-66)."""
    captured = []
    ru = RecordingRu(1, 400_000)
    bb = BasebandProcessor(ru, nof_ports=1, dft_size=128, numerology=1,
                           prach_notifier=lambda req, fd: captured.append(req))
    bb.start()
    nsamp = bb.slot_samples(1)
    req = PrachOccasionRequest(slot=1, start_sample=nsamp - 200, fmt="A1")
    assert req.window_samples(bb.sample_rate_hz) > 200    # must straddle
    bb.request_prach(req)
    for s in range(4):
        bb.push_dl(s, np.zeros((1, bb.slot_samples(s)), np.complex64))
    bb.run(4)
    assert captured == [req]
    assert bb.metrics["prach_windows"] == 1


def test_prach_collector_grabs_exact_window():
    """The collected samples are exactly [abs_start, abs_start+needed) of
    the rx timeline (checked via the UL ramp through the demodulated DC
    bin relation is overkill — instead inspect the collector buffer)."""
    from srsran_tpu.phy.lower.baseband import _PrachCollector
    got = {}

    def note(req, fd):
        got["fd"] = fd

    req = PrachOccasionRequest(slot=0, start_sample=300, fmt="C0")
    col = _PrachCollector(req, abs_start=300, nof_ports=1,
                          sample_rate_hz=128 * 30_000, notifier=note)
    ramp = (np.arange(10_000, dtype=np.float32)[None]).astype(np.complex64)
    assert col.needed == 256                    # C0 @ 3.84 Msps: one 256 rep
    done = col.feed(ramp[:, :400], 0)           # covers [300, 556) partially
    assert not done and col.filled == 100
    done = col.feed(ramp[:, 400:2000], 400)
    assert done
    np.testing.assert_array_equal(col.buf[0].real,
                                  np.arange(300, 300 + col.needed))
    assert "fd" in got
