"""PRACH preamble parameters (TS38.211 §6.3.3.1) — host-side.

Analogue of the reference's lib/ran/prach/ (prach_cyclic_shifts.cpp,
prach_preamble_information.cpp): sequence lengths, N_cs from
zeroCorrelationZone, logical->physical root ordering, cyclic shift counts.
"""

from __future__ import annotations

import functools
from pathlib import Path

import numpy as np

_DATA = Path(__file__).resolve().parent.parent / "data" / "prach_tables.npz"

LONG_SEQ = 839
SHORT_SEQ = 139

# TS38.211 Tables 6.3.3.1-5/-6/-7, unrestricted-set columns (N_cs values).
NCS_1_25_UNRESTRICTED = (0, 13, 15, 18, 22, 26, 32, 38, 46, 59, 76, 93, 119,
                         167, 279, 419)
NCS_5_UNRESTRICTED = (0, 13, 26, 33, 38, 41, 49, 55, 64, 76, 93, 119, 139,
                      209, 279, 419)
NCS_SHORT_UNRESTRICTED = (0, 2, 4, 6, 8, 10, 12, 13, 15, 17, 19, 23, 27, 34,
                          46, 69)

# Long preamble formats (TS38.211 Table 6.3.3.1-1): name -> (L, scs_hz,
# nof_repetitions within the preamble OFDM portion).
LONG_FORMATS = {
    "0": (839, 1250, 1),
    "1": (839, 1250, 2),
    "2": (839, 1250, 4),
    "3": (839, 5000, 4),
}
# Short preamble formats (Table 6.3.3.1-2): name -> nof symbol repetitions
# (at the PUSCH-numerology-scaled RA SCS).
SHORT_FORMATS = {"A1": 2, "A2": 4, "A3": 6, "B1": 2, "B2": 4, "B3": 6,
                 "B4": 12, "C0": 1, "C2": 4}


@functools.lru_cache(maxsize=None)
def _long_root_order() -> np.ndarray:
    return np.load(_DATA)["long_root_order"]


def root_sequence_number(logical_index: int, long_format: bool) -> int:
    """Logical root index -> physical sequence number u."""
    if long_format:
        lut = _long_root_order()
        return int(lut[logical_index % len(lut)])
    i = logical_index % (SHORT_SEQ - 1)
    # Table 6.3.3.1-4 is the alternating pattern 1,138,2,137,...
    return (i // 2 + 1) if i % 2 == 0 else (SHORT_SEQ - 1 - i // 2)


def n_cs(zero_correlation_zone: int, ra_scs_hz: int,
         restricted: str = "unrestricted") -> int:
    assert restricted == "unrestricted", "restricted sets not supported yet"
    if ra_scs_hz == 1250:
        return NCS_1_25_UNRESTRICTED[zero_correlation_zone]
    if ra_scs_hz == 5000:
        return NCS_5_UNRESTRICTED[zero_correlation_zone]
    return NCS_SHORT_UNRESTRICTED[zero_correlation_zone]


def preambles_per_root(ncs: int, l_ra: int) -> int:
    """Number of cyclic-shift preambles one root supports."""
    return l_ra // ncs if ncs else 1


@functools.lru_cache(maxsize=None)
def _config_tables():
    import json
    return json.loads((_DATA.parent / "prach_config_tables.json").read_text())


def prach_configuration(index: int, duplex: str = "fr1_unpaired"):
    """TS38.211 Table 6.3.3.2-2/-3: PRACH occasion schedule for a config
    index.  Returns dict (format, x, y, subframes, starting_symbol, ...) or
    None for reserved entries — the analogue of
    lib/ran/prach/prach_configuration.cpp."""
    return _config_tables()[duplex][index]


def zc_sequence(u: int, l_ra: int, cyclic_shift: int = 0) -> np.ndarray:
    """Zadoff-Chu x_{u,v}(n) = exp(-j pi u n(n+1) / L), cyclically shifted."""
    n = (np.arange(l_ra) + cyclic_shift) % l_ra
    phase = -np.pi * u * n * (n + 1.0) / l_ra
    return np.exp(1j * phase).astype(np.complex64)
