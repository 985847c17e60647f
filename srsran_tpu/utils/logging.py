"""Channel-based logging (srslog analogue).

The reference's srslog decouples real-time paths from sinks via an async
backend thread (lib/srslog/backend_worker).  Here: named per-layer channels
(PHY/FAPI/MAC/RU/APP) with YAML-configurable levels, a QueueHandler-based
async backend so the slot loop never blocks on IO, and the same
channel-tagged single-line format.
"""

from __future__ import annotations

import atexit
import logging
import logging.handlers
import queue
import sys

CHANNELS = ("PHY", "FAPI", "MAC", "RU", "APP", "METRICS")
_listener = None


def init(levels: dict | None = None, filename: str | None = None):
    """Configure channels; levels e.g. {'PHY': 'info', 'MAC': 'warning'}."""
    global _listener
    q = queue.Queue(-1)
    qh = logging.handlers.QueueHandler(q)
    sink = (logging.FileHandler(filename) if filename
            else logging.StreamHandler(sys.stdout))
    sink.setFormatter(logging.Formatter(
        "%(asctime)s.%(msecs)03d [%(name)-7s] [%(levelname).1s] %(message)s",
        datefmt="%H:%M:%S"))
    if _listener is not None:
        _listener.stop()
    _listener = logging.handlers.QueueListener(q, sink)
    _listener.start()
    atexit.register(_listener.stop)
    levels = levels or {}
    for ch in CHANNELS:
        lg = logging.getLogger(ch)
        lg.handlers = [qh]
        lg.propagate = False
        lg.setLevel(getattr(logging, levels.get(ch, "warning").upper()))


def channel(name: str) -> logging.Logger:
    return logging.getLogger(name)
