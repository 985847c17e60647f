"""OFH timing plane: OTA clock, TX/RX window checkers, RuOfh integration.

Mirrors the reference's checker semantics (ofh_tx_window_checker.h,
ofh_rx_window_checker.cpp, ru_ofh_config_translator.cpp:65-76)."""

import numpy as np
import jax.numpy as jnp

from srsran_tpu.ofh.timing import (OfhTiming, OfhTimingConfig, OtaClock,
                                   RxWindowChecker, SlotSymbolPoint,
                                   TxWindowChecker, nof_symbols_before_ota,
                                   rx_window_symbols, symbol_duration_us,
                                   tx_window_symbols)
from srsran_tpu.ru.ofh import InMemoryCable, RuOfh


MU = 1
SYM_US = symbol_duration_us(MU)         # 1000 / 28 us at 30 kHz SCS


def test_window_symbol_derivation():
    cfg = OfhTimingConfig()
    tx = tx_window_symbols(cfg, MU)
    # floor for window starts, ceil for window ends
    assert tx.sym_cp_dl_start == int(500.0 / SYM_US)
    assert tx.sym_up_dl_start == int(300.0 / SYM_US)
    assert tx.sym_up_dl_end == int(np.ceil(85.0 / SYM_US))
    rx = rx_window_symbols(cfg, MU)
    assert rx.sym_start == int(85.0 / SYM_US)
    assert rx.sym_end == int(np.ceil(500.0 / SYM_US))
    adv = nof_symbols_before_ota(cfg, MU)
    assert adv == max(1, int(400.0 / SYM_US)) + max(tx.sym_cp_dl_end,
                                                    tx.sym_up_dl_end)


def test_ota_clock_polls_symbol_boundaries():
    t = [100 * SYM_US * 1e-6]
    clk = OtaClock(MU, time_fn=lambda: t[0])
    seen = []
    clk.subscribe(seen.append)
    first = clk.poll()
    assert len(first) == 1 and first[0].count == 100
    assert clk.poll() == []                       # no time elapsed
    t[0] += 3 * SYM_US * 1e-6
    pts = clk.poll()
    assert [p.count for p in pts] == [101, 102, 103]
    assert [p.count for p in seen] == [100, 101, 102, 103]
    assert pts[-1].symbol == 103 % 14
    assert pts[-1].slot_in_frame == (103 // 14) % 20


def test_slot_symbol_point_wraps():
    a = SlotSymbolPoint.make(MU, sfn=255, slot_in_frame=19, symbol=13)
    b = SlotSymbolPoint.make(MU, sfn=0, slot_in_frame=0, symbol=0)
    assert b.distance_to(a) == 1                  # wrap-around is adjacent
    assert a.distance_to(b) == -1
    # SFN beyond one byte folds (OFH carries sfn % 256)
    c = SlotSymbolPoint.make(MU, sfn=257, slot_in_frame=0, symbol=0)
    assert c.count == SlotSymbolPoint.make(MU, 1, 0, 0).count


def test_tx_window_checker_late_detection():
    chk = TxWindowChecker(advance_time_in_symbols=19, numerology=MU)
    # OTA at sfn 0, slot 10, symbol 0
    chk.on_new_symbol(SlotSymbolPoint.make(MU, 0, 10, 0))
    assert not chk.is_late(0, 12)                 # 2 slots ahead: in time
    assert chk.is_late(0, 10)                     # needs 19 symbols of lead
    assert chk.is_late(0, 5)                      # already past: late
    assert chk.get_nof_lates_and_reset() == 2
    assert chk.nof_lates == 0


def test_rx_window_checker_classification():
    win = rx_window_symbols(OfhTimingConfig(), MU)      # [2, 14] symbols
    chk = RxWindowChecker(win, MU)
    ota = SlotSymbolPoint.make(MU, 0, 1, 0)             # symbol count 14
    chk.on_new_symbol(ota)
    assert chk.update(0, 0, 14 - win.sym_start) == "on_time"
    assert chk.update(0, 0, 13) == "early"              # only 1 symbol old
    assert chk.update(0, 0, 0) == "on_time"             # 14 symbols old
    # a message older than sym_end symbols is late
    chk.on_new_symbol(SlotSymbolPoint.make(MU, 0, 2, 0))
    assert chk.update(0, 0, 0) == "late"
    assert (chk.nof_on_time, chk.nof_early, chk.nof_late) == (2, 1, 1)


def test_ru_ofh_drops_late_dl_grid_and_classifies_ul():
    t = [0.0]
    cable = InMemoryCable()
    timing = OfhTiming(MU, cfg=OfhTimingConfig(), time_fn=lambda: t[0])
    du = RuOfh(cable.endpoint_a(), nof_ports=1, nof_prb=4, timing=timing)
    ru = RuOfh(cable.endpoint_b(), nof_ports=1, nof_prb=4)
    rng = np.random.default_rng(0)
    g = (rng.normal(size=(1, 14, 48))
         + 1j * rng.normal(size=(1, 14, 48))).astype(np.complex64)

    # OTA time inside slot 2 of frame 0: a grid for slot 2 is late, a grid
    # for slot 4 (>= advance symbols ahead) is on time.
    t[0] = (2 * 14 + 1) * SYM_US * 1e-6
    assert du.send_dl_grid(jnp.asarray(g), slot=0, subframe=1) is False
    assert du.metrics["late_dl_grids"] == 1
    assert du.metrics["tx_frames"] == 0
    assert du.send_dl_grid(jnp.asarray(g), slot=0, subframe=2) is True
    assert du.metrics["tx_frames"] > 0

    # UL: RU answers for slot 2; DU's OTA clock is 2 symbols past it ->
    # within [Ta4_min, Ta4_max] -> on_time.
    ru.send_dl_grid(jnp.asarray(g), slot=0, subframe=1, direction=0)
    t[0] = (2 * 14 + 2 + 2) * SYM_US * 1e-6
    out = du.receive_ul_grid(nsym=14)
    assert out is not None
    assert du.metrics["rx_on_time"] > 0
    assert du.metrics["rx_late"] == 0
