"""Sanitizer discipline: checkify float checks on slot programs + host
deadline guards (utils/sanitize — the reference's ASAN/UBSAN/RTSAN +
ASSERT_LEVEL analogue, CMakeLists.txt:72-77/97-99)."""

import numpy as np
import jax.numpy as jnp
import pytest

from srsran_tpu.utils import sanitize


def test_checkified_jit_catches_nan(monkeypatch):
    monkeypatch.setenv("SRSRAN_TPU_SANITIZE", "1")

    def bad(x):
        return x / (x - x)          # 0/0 -> NaN

    fn = sanitize.checkified_jit(bad)
    assert getattr(fn, "_checkified", False)
    fn(jnp.ones(4))
    assert sanitize.pending() > 0
    with pytest.raises(Exception):
        sanitize.drain()
    assert sanitize.pending() == 0

    def good(x):
        return x + 1

    g = sanitize.checkified_jit(good)
    out = g(jnp.ones(4))
    np.testing.assert_array_equal(np.asarray(out), 2.0)
    sanitize.drain()                 # no error queued -> no raise


def test_checkified_jit_off_by_default(monkeypatch):
    monkeypatch.delenv("SRSRAN_TPU_SANITIZE", raising=False)
    monkeypatch.delenv("SRSRAN_TPU_ASSERT_LEVEL", raising=False)
    fn = sanitize.checkified_jit(lambda x: x * 2)
    assert not getattr(fn, "_checkified", False)


def test_deadline_guard_counts_and_raises(monkeypatch):
    import time

    metrics = {}
    monkeypatch.setenv("SRSRAN_TPU_ASSERT_LEVEL", "normal")
    with sanitize.DeadlineGuard(1e-6, "t", metrics):
        time.sleep(0.002)
    assert metrics["deadline_miss"] == 1

    monkeypatch.setenv("SRSRAN_TPU_ASSERT_LEVEL", "paranoid")
    with pytest.raises(sanitize.DeadlineError):
        with sanitize.DeadlineGuard(1e-6, "t", metrics):
            time.sleep(0.002)

    monkeypatch.setenv("SRSRAN_TPU_ASSERT_LEVEL", "minimal")
    with sanitize.DeadlineGuard(1e-6, "t", metrics):
        time.sleep(0.002)
    assert metrics["deadline_miss"] == 2     # unchanged in minimal


def test_slot_program_checkified_end_to_end(monkeypatch):
    monkeypatch.setenv("SRSRAN_TPU_SANITIZE", "1")
    from srsran_tpu.phy.slot_programs import CellConfig, dl_slot_fn
    from srsran_tpu.phy.upper.pdsch import PdschConfig

    # unique cell geometry -> fresh lru_cache entry built under sanitize
    cell = CellConfig(nof_ports=1, nof_rb=12, dft_size=256, numerology=1)
    pdsch = PdschConfig(rnti=1, rb_start=0, rb_count=12, first_symbol=1,
                        nof_symbols=12, modulation="qpsk",
                        target_code_rate=0.5, tbs=1736, nof_layers=1,
                        n_id=1, dmrs_symbols=(2, 11))
    fn = dl_slot_fn(cell, ((), (), (pdsch,), ()))
    assert getattr(fn, "_checkified", False)
    rng = np.random.default_rng(0)
    payload = jnp.asarray(rng.integers(0, 2, 1736).astype(np.int8))
    samples, _ = fn((), (), (payload,))
    assert samples.shape[0] == 1
    sanitize.drain()                 # a clean slot raises nothing
