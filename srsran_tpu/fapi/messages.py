"""FAPI slot message dataclasses (SCF-222-shaped, like the reference's).

Mirrors include/srsran/fapi/messages/: dl_tti_request.h, ul_tti_request.h,
tx_data_request.h, crc_indication.h, rx_data_indication.h, uci_indication.h,
rach_indication.h, slot_indication.h.  PDU payloads reference the static
config dataclasses of the channel processors — the conductor uses the tuple
of PDU configs as the jit specialization key (the "slot plan").
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..ran.slot_point import SlotPoint
from ..phy.upper.ssb import SsbConfig
from ..phy.upper.pdsch import PdschConfig
from ..phy.upper.pdcch import PdcchConfig
from ..phy.upper.pusch import PuschConfig
from ..phy.upper.pucch import (PucchF0Config, PucchF1Config, PucchF2Config,
                               PucchF3Config)
from ..phy.upper.prach import PrachConfig


# ------------------------------------------------------------- DL direction

@dataclasses.dataclass
class DlTtiRequest:
    """Per-slot DL schedule (fapi::dl_tti_request_message).

    prs PDUs mirror the reference's dl_prs_pdu (the translator processes
    them per dl_tti at fapi_to_phy_translator.cpp:395-404); PT-RS rides
    inside PdschConfig.ptrs like the reference's pdsch_ptrs params.
    """

    slot: SlotPoint
    ssb: tuple = ()        # tuple[SsbConfig]
    pdcch: tuple = ()      # tuple[PdcchConfig]
    pdsch: tuple = ()      # tuple[PdschConfig]
    csi_rs: tuple = ()     # tuple[CsiRsConfig]
    prs: tuple = ()        # tuple[PrsConfig]

    def plan_key(self):
        return (self.ssb, self.pdcch, self.pdsch, self.csi_rs, self.prs)


@dataclasses.dataclass
class UlDciRequest:
    """UL grants' PDCCH PDUs (fapi::ul_dci_request_message,
    include/srsran/fapi/messages/ul_dci_request.h): same pdcch_pdu type as
    dl_tti, transmitted in the DL slot program alongside dl_tti PDUs
    (fapi_to_phy_translator.cpp:629 routes both to the PDCCH processor)."""

    slot: SlotPoint
    pdcch: tuple = ()         # tuple[PdcchConfig]
    payloads: tuple = ()      # DCI payload bits per PDU


@dataclasses.dataclass
class TxDataRequest:
    """Payload bits for the slot's PDSCH PDUs (fapi::tx_data_request_message).

    pdsch_payloads[i] corresponds to DlTtiRequest.pdsch[i]: uint8 bit array.
    pdcch_payloads[i] likewise for DCI payload bits; ssb_mib[i] for SSBs.
    """

    slot: SlotPoint
    pdsch_payloads: tuple = ()
    pdcch_payloads: tuple = ()
    ssb_mib: tuple = ()


# ------------------------------------------------------------- UL direction

@dataclasses.dataclass
class UlTtiRequest:
    """Per-slot UL schedule (fapi::ul_tti_request_message).

    pusch_harq[i] = (harq_id, new_data) for pusch[i]; kept outside the PDU
    config so HARQ state changes don't re-specialize the jitted slot program.
    """

    slot: SlotPoint
    pusch: tuple = ()      # tuple[PuschConfig]
    pusch_harq: tuple = ()  # tuple[(harq_id, new_data)]
    pucch_f0: tuple = ()
    pucch_f1: tuple = ()
    pucch_f2: tuple = ()
    pucch_f3: tuple = ()   # tuple[PucchF3Config] (occ_length == 1)
    pucch_f4: tuple = ()   # tuple[PucchF3Config] (occ_length 2 | 4)
    prach: tuple = ()      # tuple[PrachConfig]
    srs: tuple = ()        # tuple[SrsConfig] (fapi ul_srs_pdu)

    def plan_key(self):
        return (self.pusch, self.pucch_f0, self.pucch_f1, self.pucch_f2,
                self.pucch_f3, self.pucch_f4, self.prach, self.srs)


# -------------------------------------------------------------- indications

@dataclasses.dataclass
class CrcIndicationPdu:
    """CRC.indication essentials + channel state information (the
    reference's channel_state_information.h fields: per-port EPRE/RSRP/SINR,
    TA, CFO, EVM)."""

    rnti: int
    tb_crc_ok: bool
    timing_advance_s: float
    snr_db: float
    rsrp: float = 0.0            # linear, averaged over ports
    cfo_hz: float = 0.0
    evm: float = 0.0             # RMS EVM from hard decisions
    nof_ldpc_iterations: float = 0.0
    snr_port_db: Optional[np.ndarray] = None   # f32 [rx_ports]
    rsrp_port: Optional[np.ndarray] = None     # f32 [rx_ports], linear
    epre_port: Optional[np.ndarray] = None     # f32 [rx_ports], linear


@dataclasses.dataclass
class RxDataIndicationPdu:
    rnti: int
    payload: np.ndarray      # uint8 bits (only valid if crc ok)


@dataclasses.dataclass
class UciIndicationPdu:
    rnti: int
    detected: bool
    harq_bits: Optional[np.ndarray]
    csi_bits: Optional[np.ndarray]          # CSI part 1 (or PUCCH payload)
    metric: float
    sr_bit: Optional[int] = None   # PUCCH F0 SR opportunity result
    csi2_bits: Optional[np.ndarray] = None  # CSI part 2 (UCI on PUSCH)
    source: str = "pucch"                   # 'pucch' | 'pusch' (uci.ind
                                            # pduType in the reference)


@dataclasses.dataclass
class RachIndicationPreamble:
    preamble_index: int
    timing_advance_s: float
    metric: float


@dataclasses.dataclass
class SrsIndicationPdu:
    """Sounding report (fapi srs_indication.h essentials)."""

    rnti: int
    timing_advance_s: float
    snr_db: float
    wideband_h: np.ndarray   # complex [rx_ports, srs_ports] wideband channel


@dataclasses.dataclass
class SlotResults:
    """Everything the UL slot program produced (crc/rx_data/uci/rach ind)."""

    slot: SlotPoint
    crc: list = dataclasses.field(default_factory=list)
    rx_data: list = dataclasses.field(default_factory=list)
    uci: list = dataclasses.field(default_factory=list)
    rach: list = dataclasses.field(default_factory=list)
    srs: list = dataclasses.field(default_factory=list)
