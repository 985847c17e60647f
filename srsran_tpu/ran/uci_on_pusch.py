"""UCI-on-PUSCH bit budgeting (TS38.212 §6.3.2.4) — host-side.

Analogue of the reference's ulsch_info (lib/ran/pusch/ulsch_info.cpp):
computes the number of coded modulation symbols Q' for HARQ-ACK, CSI part 1
and CSI part 2 multiplexed on PUSCH, given beta offsets and the data code
rate, per TS38.212 §6.3.2.4.1.1-3.
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class UciOnPuschConfig:
    o_ack: int = 0
    o_csi1: int = 0
    o_csi2: int = 0
    beta_ack: float = 12.625
    beta_csi1: float = 6.25
    beta_csi2: float = 6.25
    alpha: float = 1.0


def _crc_len(o: int) -> int:
    if o <= 11:
        return 0
    if o < 20:
        return 6
    return 11


def uci_symbol_budget(o_bits: int, beta: float, alpha: float,
                      m_uci_total: int, m_uci_from_l1: int,
                      sum_kr: int, qm: int, nof_layers: int,
                      already_used: int = 0) -> int:
    """Q' per TS38.212 §6.3.2.4.1.1 (shape shared by ACK/CSI1/CSI2).

    m_uci_total: sum over all symbols of UCI-capable REs (per layer);
    m_uci_from_l1: same but only symbols from the anchor symbol onward;
    sum_kr: total data payload+CRC bits of the UL-SCH (denominator);
    already_used: RE budget consumed by higher-priority UCI.
    """
    if o_bits == 0:
        return 0
    l = _crc_len(o_bits)
    if sum_kr > 0:
        q1 = math.ceil((o_bits + l) * beta * m_uci_total / sum_kr)
    else:
        # No UL-SCH data: rate follows the CSI/ACK-only formulas; fall back
        # to spreading over everything available.
        q1 = m_uci_from_l1
    q2 = math.ceil(alpha * m_uci_from_l1) - already_used
    return max(0, min(q1, max(q2, 0)))


def e_uci(q_prime: int, qm: int, nof_layers: int) -> int:
    """Coded bits for a UCI field."""
    return q_prime * qm * nof_layers
