"""Numeric/RT sanitizers: the TPU-native analogue of the reference's
sanitizer toolchain (CMakeLists.txt:72-77 ASAN/TSAN/UBSAN/RTSAN toggles,
include/srsran/support/rtsan.h:30-58 nonblocking annotations, and the
ASSERT_LEVEL paranoia ladder, CMakeLists.txt:97-99).

Memory/thread errors don't exist inside jit programs, so the hazards that
remain are numeric (NaN/Inf escaping a slot program and silently corrupting
every downstream indication) and temporal (a host loop blowing its slot
deadline).  Correspondingly:

- ``checkified_jit(fn)``: when sanitizing, compiles the function under
  ``jax.experimental.checkify`` float checks (NaN/Inf/div-by-zero with op
  provenance).  Errors are collected asynchronously — the device pipeline
  is NOT stalled per slot — and surfaced by ``drain()`` at a resolve
  point, mirroring how RTSAN defers reporting off the RT thread.
- ``DeadlineGuard``: host-loop deadline assertion.  NORMAL counts misses;
  PARANOID raises (the reference's assertion-paranoia escalation).

Levels via ``SRSRAN_TPU_ASSERT_LEVEL`` = minimal | normal | paranoid;
checkify instrumentation via ``SRSRAN_TPU_SANITIZE=1`` (implied by
paranoid).
"""

from __future__ import annotations

import os
import time
from collections import deque
from typing import Callable

import jax

MINIMAL, NORMAL, PARANOID = "minimal", "normal", "paranoid"

_pending_errors: deque = deque(maxlen=256)


def level() -> str:
    lv = os.environ.get("SRSRAN_TPU_ASSERT_LEVEL", NORMAL).lower()
    return lv if lv in (MINIMAL, NORMAL, PARANOID) else NORMAL


def sanitize_enabled() -> bool:
    return (os.environ.get("SRSRAN_TPU_SANITIZE", "0") == "1"
            or level() == PARANOID)


def checkified_jit(fn: Callable, **jit_kwargs) -> Callable:
    """jit(fn), instrumented with checkify float checks when sanitizing.

    The returned callable has the same signature/outputs as ``jit(fn)``;
    checkify error payloads are queued (device arrays, no sync) and
    raised later by ``drain()``.
    """
    if not sanitize_enabled():
        return jax.jit(fn, **jit_kwargs)
    from jax.experimental import checkify

    cfn = jax.jit(checkify.checkify(fn, errors=checkify.float_checks),
                  **jit_kwargs)

    def run(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        _pending_errors.append(err)
        return out

    run._checkified = True  # noqa: SLF001 — introspection for tests
    return run


def drain():
    """Raise the first queued checkify error, if any (host sync point)."""
    while _pending_errors:
        _pending_errors.popleft().throw()


def pending() -> int:
    return len(_pending_errors)


class DeadlineError(RuntimeError):
    pass


class DeadlineGuard:
    """Assert a host RT section stays within its slot budget.

    ``with DeadlineGuard(budget_s, name, metrics): ...`` — a miss
    increments ``metrics['deadline_miss']`` (NORMAL) or raises
    ``DeadlineError`` (PARANOID).  MINIMAL disables the check entirely,
    like the reference's ASSERT_LEVEL=MINIMAL builds.
    """

    def __init__(self, budget_s: float, name: str = "rt_section",
                 metrics: dict | None = None):
        self.budget_s = budget_s
        self.name = name
        self.metrics = metrics
        self.elapsed_s = 0.0

    def __enter__(self):
        self._t0 = time.monotonic()
        return self

    def __exit__(self, exc_type, exc, tb):
        self.elapsed_s = time.monotonic() - self._t0
        if exc_type is not None or level() == MINIMAL:
            return False
        if self.elapsed_s > self.budget_s:
            if self.metrics is not None:
                self.metrics["deadline_miss"] = (
                    self.metrics.get("deadline_miss", 0) + 1)
            if level() == PARANOID:
                raise DeadlineError(
                    f"{self.name}: {self.elapsed_s * 1e6:.0f} us exceeded "
                    f"the {self.budget_s * 1e6:.0f} us budget")
        return False
