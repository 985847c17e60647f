"""OFH timing plane: OTA symbol clock + TX/RX window checkers.

Mirrors the reference's Open-Fronthaul timing subsystem:

- lib/ofh/timing/realtime_timing_worker.h:53 — a worker that converts wall
  time into OTA symbol-boundary notifications (GPS alpha/beta offsets,
  uniform symbol duration 1e6/(nsym*slots_per_subframe) ns);
- lib/ofh/transmitter/ofh_tx_window_checker.h — `is_late(slot)` against
  the OTA symbol count minus a processing advance, counting lates;
- lib/ofh/receiver/ofh_rx_window_checker.h/.cpp — classify each received
  U-plane message as early / on-time / late against the [Ta4_min, Ta4_max]
  reception window, with SFN wrapped to one byte (OFH_MAX_NOF_SFN=256);
- apps/.../ru_ofh_config_translator.cpp:65-76 and
  lib/ofh/transmitter/helpers.h:39-50 — the microsecond->symbol window
  parameter derivation (floor for window starts, ceil for window ends).

TPU-native difference: no dedicated timing thread. The deployment loop is
already timestamp-slaved (phy/lower/baseband.py); the clock here is
poll-driven — `OtaClock.poll()` advances to "now" and fans out one
notification per elapsed symbol boundary.  Tests drive it with a manual
time source.
"""

from __future__ import annotations

import dataclasses
import math
import time
from typing import Callable, List

from ..ran.cyclic_prefix import CyclicPrefix, symbols_per_slot

#: The OFH U-plane/C-plane headers carry the SFN in one byte.
OFH_MAX_NOF_SFN = 256


# ------------------------------------------------------------ window params

@dataclasses.dataclass(frozen=True)
class OfhTimingConfig:
    """T1a/Ta4 window parameters in microseconds.

    Defaults follow the reference's ru_ofh_config.h:43-57.
    """

    t1a_max_cp_dl_us: float = 500.0
    t1a_min_cp_dl_us: float = 258.0
    t1a_max_cp_ul_us: float = 500.0
    t1a_min_cp_ul_us: float = 285.0
    t1a_max_up_us: float = 300.0
    t1a_min_up_us: float = 85.0
    ta4_max_us: float = 500.0
    ta4_min_us: float = 85.0
    #: DU DL processing budget before the transmission window opens
    #: (du_low dl_processing_time analogue).
    dl_processing_time_us: float = 400.0


@dataclasses.dataclass(frozen=True)
class TxWindowSymbols:
    """tx_window_timing_parameters analogue (symbol units)."""

    sym_cp_dl_start: int
    sym_cp_dl_end: int
    sym_cp_ul_start: int
    sym_cp_ul_end: int
    sym_up_dl_start: int
    sym_up_dl_end: int


@dataclasses.dataclass(frozen=True)
class RxWindowSymbols:
    """rx_window_timing_parameters analogue (symbol units)."""

    sym_start: int
    sym_end: int


def symbol_duration_us(numerology: int,
                       cp: CyclicPrefix = CyclicPrefix.NORMAL) -> float:
    """Uniform OTA symbol duration, as the reference's timing worker uses
    (1e6 / (nsym * slots_per_subframe) ns; realtime_timing_worker.cpp)."""
    nsym = symbols_per_slot(cp)
    return 1e3 / (nsym * (1 << numerology))


def tx_window_symbols(cfg: OfhTimingConfig, numerology: int,
                      cp: CyclicPrefix = CyclicPrefix.NORMAL
                      ) -> TxWindowSymbols:
    """Window starts floor, window ends ceil (ru_ofh_config_translator.cpp:68-73)."""
    sym = symbol_duration_us(numerology, cp)
    return TxWindowSymbols(
        sym_cp_dl_start=math.floor(cfg.t1a_max_cp_dl_us / sym),
        sym_cp_dl_end=math.ceil(cfg.t1a_min_cp_dl_us / sym),
        sym_cp_ul_start=math.floor(cfg.t1a_max_cp_ul_us / sym),
        sym_cp_ul_end=math.ceil(cfg.t1a_min_cp_ul_us / sym),
        sym_up_dl_start=math.floor(cfg.t1a_max_up_us / sym),
        sym_up_dl_end=math.ceil(cfg.t1a_min_up_us / sym))


def rx_window_symbols(cfg: OfhTimingConfig, numerology: int,
                      cp: CyclicPrefix = CyclicPrefix.NORMAL
                      ) -> RxWindowSymbols:
    sym = symbol_duration_us(numerology, cp)
    return RxWindowSymbols(sym_start=math.floor(cfg.ta4_min_us / sym),
                           sym_end=math.ceil(cfg.ta4_max_us / sym))


def nof_symbols_before_ota(cfg: OfhTimingConfig, numerology: int,
                           cp: CyclicPrefix = CyclicPrefix.NORMAL) -> int:
    """DL handoff advance: processing time + the largest min-TX window end
    (transmitter/helpers.h:39-50)."""
    sym = symbol_duration_us(numerology, cp)
    proc = max(1, math.floor(cfg.dl_processing_time_us / sym))
    win = tx_window_symbols(cfg, numerology, cp)
    return proc + max(win.sym_cp_dl_end, win.sym_up_dl_end)


# --------------------------------------------------------- symbol points

@dataclasses.dataclass(frozen=True)
class SlotSymbolPoint:
    """(numerology, symbol count) with the OFH one-byte SFN wrap."""

    numerology: int
    count: int                    # symbol units, wraps at 256 frames
    nof_symbols: int = 14

    def wrap(self) -> int:
        return (OFH_MAX_NOF_SFN * 10 * (1 << self.numerology)
                * self.nof_symbols)

    def __post_init__(self):
        object.__setattr__(self, "count", self.count % self.wrap())

    @classmethod
    def make(cls, numerology: int, sfn: int, slot_in_frame: int,
             symbol: int, nof_symbols: int = 14) -> "SlotSymbolPoint":
        slots_per_frame = 10 * (1 << numerology)
        count = ((sfn % OFH_MAX_NOF_SFN) * slots_per_frame
                 + slot_in_frame) * nof_symbols + symbol
        return cls(numerology, count, nof_symbols)

    @property
    def symbol(self) -> int:
        return self.count % self.nof_symbols

    @property
    def slot_in_frame(self) -> int:
        return (self.count // self.nof_symbols) % (10 * (1 << self.numerology))

    @property
    def sfn(self) -> int:
        return self.count // (self.nof_symbols * 10 * (1 << self.numerology))

    def distance_to(self, other: "SlotSymbolPoint") -> int:
        """Wrap-aware signed distance self - other in symbols
        (ofh_rx_window_checker.cpp calculate_slot_symbol_point_distance)."""
        w = self.wrap()
        d = (self.count - other.count) % w
        return d - w if d >= w // 2 else d


# ---------------------------------------------------------------- OTA clock

class OtaClock:
    """Poll-driven OTA symbol clock (realtime_timing_worker analogue).

    ``time_fn`` returns seconds; GPS alpha (in 1/1.2288e9 s units, as the
    O-RAN spec defines) and beta (in 10 ms units) shift the epoch.  Each
    ``poll()`` advances to the current symbol and calls every registered
    notifier once per elapsed symbol boundary (bounded to one frame of
    catch-up, like a late-woken worker skipping stale symbols).
    """

    def __init__(self, numerology: int, cp: CyclicPrefix = CyclicPrefix.NORMAL,
                 gps_alpha: int = 0, gps_beta: int = 0,
                 time_fn: Callable[[], float] = time.time):
        self.numerology = numerology
        self.nof_symbols = symbols_per_slot(cp)
        self._sym_s = symbol_duration_us(numerology, cp) * 1e-6
        self._offset_s = gps_alpha / 1.2288e9 + gps_beta * 10e-3
        self._time_fn = time_fn
        self._notifiers: List[Callable[[SlotSymbolPoint], None]] = []
        self._last: int | None = None

    def subscribe(self, on_new_symbol: Callable[[SlotSymbolPoint], None]):
        self._notifiers.append(on_new_symbol)

    def now(self) -> SlotSymbolPoint:
        t = self._time_fn() + self._offset_s
        # 1e-6-symbol epsilon guards the floor against float round-down when
        # a caller lands exactly on a boundary (35 ps at 30 kHz SCS)
        count = int(t / self._sym_s + 1e-6)
        wrap = (OFH_MAX_NOF_SFN * 10 * (1 << self.numerology)
                * self.nof_symbols)
        return SlotSymbolPoint(self.numerology, count % wrap,
                               self.nof_symbols)

    def poll(self) -> List[SlotSymbolPoint]:
        """Advance to now; notify each elapsed symbol boundary."""
        cur = self.now()
        if self._last is None:
            new = [cur]
        else:
            prev = SlotSymbolPoint(self.numerology, self._last,
                                   self.nof_symbols)
            gap = cur.distance_to(prev)
            if gap <= 0:
                return []
            gap = min(gap, self.nof_symbols * 10 * (1 << self.numerology))
            # Notify the most recent `gap` symbols ENDING at now: after a
            # stall longer than the one-frame catch-up cap, notifying the
            # oldest symbols would leave subscribers' OTA view stale until
            # the next poll (wrongly accepting late DL grids).
            new = [SlotSymbolPoint(self.numerology, cur.count - gap + i,
                                   self.nof_symbols)
                   for i in range(1, gap + 1)]
        self._last = cur.count
        for p in new:
            for n in self._notifiers:
                n(p)
        return new


# ------------------------------------------------------------ TX window

class TxWindowChecker:
    """Late-DL-grid detector (ofh_tx_window_checker.h:53).

    ``on_new_symbol`` tracks the OTA symbol count; ``is_late(sfn, slot)``
    compares the grid's slot (symbol 0, worst case) minus the processing
    advance against OTA "now" and counts lates.
    """

    def __init__(self, advance_time_in_symbols: int, numerology: int,
                 nof_symbols: int = 14):
        self.advance = advance_time_in_symbols
        self.numerology = numerology
        self.nof_symbols = nof_symbols
        self._ota: SlotSymbolPoint | None = None
        self.nof_lates = 0

    def on_new_symbol(self, point: SlotSymbolPoint):
        self._ota = point

    def is_late(self, sfn: int, slot_in_frame: int) -> bool:
        if self._ota is None:
            return False
        rg = SlotSymbolPoint.make(self.numerology, sfn, slot_in_frame, 0,
                                  self.nof_symbols)
        rg = SlotSymbolPoint(self.numerology, rg.count - self.advance,
                             self.nof_symbols)
        if self._ota.distance_to(rg) < 0:
            return False
        self.nof_lates += 1
        return True

    def get_nof_lates_and_reset(self) -> int:
        n, self.nof_lates = self.nof_lates, 0
        return n


# ------------------------------------------------------------ RX window

class RxWindowChecker:
    """UL U-plane reception window statistics (ofh_rx_window_checker.h).

    A message for OTA symbol point p received while the clock reads t is
    on-time when sym_start <= (t - p) <= sym_end, early below, late above.
    """

    def __init__(self, window: RxWindowSymbols, numerology: int,
                 nof_symbols: int = 14):
        self.window = window
        self.numerology = numerology
        self.nof_symbols = nof_symbols
        self._ota: SlotSymbolPoint | None = None
        self.nof_on_time = 0
        self.nof_early = 0
        self.nof_late = 0

    def on_new_symbol(self, point: SlotSymbolPoint):
        self._ota = point

    def update(self, sfn: int, slot_in_frame: int, symbol: int) -> str:
        """Classify a received message; returns 'on_time'|'early'|'late'."""
        if self._ota is None:
            self.nof_on_time += 1
            return "on_time"
        p = SlotSymbolPoint.make(self.numerology, sfn, slot_in_frame, symbol,
                                 self.nof_symbols)
        d = self._ota.distance_to(p)
        if d < self.window.sym_start:
            self.nof_early += 1
            return "early"
        if d > self.window.sym_end:
            self.nof_late += 1
            return "late"
        self.nof_on_time += 1
        return "on_time"


# ------------------------------------------------------------- bundle

class OfhTiming:
    """Clock + TX/RX checkers wired together for one sector (the
    composition ofh_receiver_impl/ofh_transmitter_impl own per sector)."""

    def __init__(self, numerology: int, cp: CyclicPrefix = CyclicPrefix.NORMAL,
                 cfg: OfhTimingConfig = OfhTimingConfig(),
                 time_fn: Callable[[], float] = time.time):
        self.cfg = cfg
        self.clock = OtaClock(numerology, cp, time_fn=time_fn)
        nsym = symbols_per_slot(cp)
        self.tx = TxWindowChecker(nof_symbols_before_ota(cfg, numerology, cp),
                                  numerology, nsym)
        self.rx = RxWindowChecker(rx_window_symbols(cfg, numerology, cp),
                                  numerology, nsym)
        self.clock.subscribe(self.tx.on_new_symbol)
        self.clock.subscribe(self.rx.on_new_symbol)

    def poll(self):
        return self.clock.poll()
