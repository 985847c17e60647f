"""Radio Unit abstraction (analogue of include/srsran/ru/ru.h + lib/ru/).

The reference's radio_unit interface (controller + DL plane + UL plane)
maps to: start/stop lifecycle, ``send_dl`` consuming the DL slot samples,
and ``receive_ul`` producing UL slot samples.  Three implementations:

- RuDummy    — loopback with an optional channel function (lib/ru/dummy);
- RuRing     — native timestamped sample rings (sampio) to another process
               (the split-8 sample boundary without SDR hardware);
- RuFile     — record DL / replay UL through cf32 files.
"""

from .units import RadioUnit, RuDummy, RuRing, RuFile  # noqa: F401
