"""Baseband CFO processor and resource-usage metrics."""

import numpy as np
import jax.numpy as jnp

from srsran_tpu.phy.lower.cfo import CfoCommand, CfoProcessor, apply_cfo
from srsran_tpu.utils import resource_usage


def test_apply_cfo_rotates_and_is_invertible():
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(2, 1024)) + 1j * rng.normal(size=(2, 1024))
         ).astype(np.complex64)
    cfo_norm = 370.0 / 30.72e6
    y = np.asarray(apply_cfo(jnp.asarray(x), cfo_norm))
    back = np.asarray(apply_cfo(jnp.asarray(y), -cfo_norm))
    np.testing.assert_allclose(back, x, atol=1e-4)
    # instantaneous frequency equals the requested CFO
    ph = np.unwrap(np.angle(y[0] / x[0]))
    slope = np.polyfit(np.arange(1024), ph, 1)[0]
    assert abs(slope - 2 * np.pi * cfo_norm) < 1e-7


def test_cfo_processor_commands_and_continuity():
    p = CfoProcessor(sample_rate_hz=30.72e6)
    p.schedule(CfoCommand(time_s=10.0, cfo_hz=500.0))
    p.next_command(now_s=5.0)       # too early: stays at 0
    x = jnp.ones((256,), jnp.complex64)
    assert np.allclose(np.asarray(p.process(x)), 1.0)
    p.next_command(now_s=11.0)      # command takes effect
    assert p.cfo_norm == 500.0 / 30.72e6
    y1 = np.asarray(p.process(x))
    y2 = np.asarray(p.process(x))
    # phase continues across blocks: y2 starts where y1 ended
    expected = np.exp(2j * np.pi * p.cfo_norm * 256)
    np.testing.assert_allclose(y2[0] / y1[0], expected, atol=1e-5)


def test_cfo_drift():
    p = CfoProcessor(sample_rate_hz=1e6)
    p.schedule(CfoCommand(time_s=0.0, cfo_hz=100.0, cfo_drift_hz_s=10.0))
    p.next_command(now_s=0.0)
    assert abs(p._cfo_hz - 100.0) < 1e-9
    p.next_command(now_s=2.0)
    assert abs(p._cfo_hz - 120.0) < 1e-9


def test_resource_usage_snapshot_diff():
    a = resource_usage.snapshot()
    _ = sum(i * i for i in range(200000))   # burn some CPU
    b = resource_usage.snapshot()
    d = resource_usage.diff(a, b)
    assert d["wall_s"] >= 0
    assert d["cpu_user_s"] >= 0
    assert d["max_rss_mb"] > 0
    assert "vol_ctx_switches" in d
