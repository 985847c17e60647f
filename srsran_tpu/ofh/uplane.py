"""U-plane IQ data message serdes (O-RAN CUS §6.3; lib/ofh/serdes/
ofh_uplane_message_builder_impl.cpp / ..._decoder_impl.cpp analogue).

One message carries one (eAxC, symbol) worth of PRBs:

  byte 0      : dataDirection(1) | payloadVersion(3)=1 | filterIndex(4)=0
  byte 1-3    : frameId, subframeId(4)|slotId-hi(4), slotId-lo(2)|symbolId(6)
  section hdr : sectionId(12) | rb(1) | symInc(1) | startPrb(10), numPrb(8)
  byte        : udCompHdr = iqWidth(4) | compMeth(4)  (0001 = BFP)
  byte        : reserved
  payload     : per-PRB exponent + packed mantissas (compression.pack_section)
"""

from __future__ import annotations

import dataclasses
import struct

import numpy as np

from .compression import pack_section, unpack_section

COMP_METH_BFP = 1


@dataclasses.dataclass(frozen=True)
class UplaneHeader:
    direction: int          # 0 = UL (RU->DU), 1 = DL (DU->RU)
    frame: int
    subframe: int
    slot: int
    symbol: int
    start_prb: int
    nof_prb: int
    iq_width: int = 9
    section_id: int = 0


def build_uplane(hdr: UplaneHeader, exp: np.ndarray, mant: np.ndarray) -> bytes:
    b0 = ((hdr.direction & 1) << 7) | (1 << 4) | 0
    b_ts = struct.pack(
        ">BBB", hdr.frame & 0xFF,
        ((hdr.subframe & 0xF) << 4) | ((hdr.slot >> 2) & 0xF),
        ((hdr.slot & 0x3) << 6) | (hdr.symbol & 0x3F))
    sec = struct.pack(
        ">HB", ((hdr.section_id & 0xFFF) << 4) | ((hdr.start_prb >> 8) & 0x3)
        | (0 << 3) | (0 << 2),
        hdr.start_prb & 0xFF)
    sec += struct.pack(">B", hdr.nof_prb & 0xFF)
    ud_comp = struct.pack(">BB", ((hdr.iq_width & 0xF) << 4) | COMP_METH_BFP, 0)
    return bytes([b0]) + b_ts + sec + ud_comp + pack_section(
        exp, mant, hdr.iq_width)


def parse_uplane(msg: bytes):
    """-> (UplaneHeader, exp [P], mant [P, 24])."""
    direction = msg[0] >> 7
    frame = msg[1]
    subframe = msg[2] >> 4
    slot = ((msg[2] & 0xF) << 2) | (msg[3] >> 6)
    symbol = msg[3] & 0x3F
    sec_hi, prb_lo = struct.unpack(">HB", msg[4:7])
    section_id = sec_hi >> 4
    start_prb = ((sec_hi & 0x3) << 8) | prb_lo
    nof_prb = msg[7]
    iq_width = msg[8] >> 4
    comp = msg[8] & 0xF
    assert comp == COMP_METH_BFP, comp
    hdr = UplaneHeader(direction=direction, frame=frame, subframe=subframe,
                       slot=slot, symbol=symbol, start_prb=start_prb,
                       nof_prb=nof_prb, iq_width=iq_width,
                       section_id=section_id)
    exp, mant = unpack_section(msg[10:], nof_prb, iq_width)
    return hdr, exp, mant
