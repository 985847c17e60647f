"""O-RAN C-plane message serdes (section types 1 and 3).

Analogue of lib/ofh/serdes/ofh_cplane_message_builder_impl.cpp /
ofh_cplane_message_decoder_impl: encodes/decodes the O-RAN.WG4.CUS control
plane messages that tell the O-RU which PRB/symbol ranges to expect
(type 1 = DL/UL radio channel) and how to capture PRACH occasions
(type 3 = PRACH / mixed numerology, with time/frequency offsets and RA
numerology).  Single section per message like the reference.

Field packing follows the reference byte-for-byte:
  radio app header: [dir|payloadVer|filterIdx][frameId][subframe|slot_hi]
                    [slot_lo|startSymbol][numberOfSections][sectionType]
  type 1: [udCompHdr][reserved] + common section + [ef|beamId x2]
  type 3: [timeOffset:2][frameStructure][cpLength:2][udCompHdr]
          + common section + [ef/beamId:2][freqOffset:3][reserved]
  common section (types 0/1/3/5): [sectionId_hi][sectionId_lo|rb|symInc|
          startPrb_hi][startPrb_lo][numPrb][reMask_hi][reMask_lo|numSymbol]
"""

from __future__ import annotations

import dataclasses
import struct

OFH_PAYLOAD_VERSION = 1

DIRECTION_UL = 0
DIRECTION_DL = 1

FILTER_STANDARD = 0      # filter index: standard channel filter
FILTER_PRACH_239 = 1     # UL filter for PRACH preambles (O-RAN table 7.5.2.11)

COMP_BFP = 1             # udCompMeth: block floating point

# O-RAN.WG4.CUS Table 7.5.2.13-3 frameStructure SCS codes
_SCS_CODE = {15_000: 0, 30_000: 1, 60_000: 2, 120_000: 3,
             1_250: 12, 5_000: 14}
_SCS_FROM_CODE = {v: k for k, v in _SCS_CODE.items()}


@dataclasses.dataclass(frozen=True)
class CplaneSection:
    """Common section fields (types 0/1/3/5)."""

    section_id: int
    prb_start: int
    nof_prb: int              # 0 encodes "all PRBs" beyond 255
    nof_symbols: int
    re_mask: int = 0xFFF


@dataclasses.dataclass(frozen=True)
class CplaneType1:
    """DL/UL radio channel scheduling (section type 1)."""

    direction: int            # DIRECTION_UL | DIRECTION_DL
    sfn: int
    subframe: int
    slot: int                 # slot within the subframe
    start_symbol: int
    section: CplaneSection
    iq_width: int = 9
    comp_method: int = COMP_BFP
    filter_index: int = FILTER_STANDARD


@dataclasses.dataclass(frozen=True)
class CplaneType3:
    """PRACH / mixed-numerology scheduling (section type 3)."""

    direction: int
    sfn: int
    subframe: int
    slot: int
    start_symbol: int
    section: CplaneSection
    time_offset: int          # samples from slot start to the window
    scs_hz: int               # RA numerology (1.25/5 kHz long formats too)
    fft_size: int             # log2 code per O-RAN (e.g. 12 for 4096); 0 noop
    cp_length: int = 0
    frequency_offset: int = 0  # signed, units of scs/2 per O-RAN 7.5.3.11
    iq_width: int = 9
    comp_method: int = COMP_BFP
    filter_index: int = FILTER_PRACH_239


def _radio_hdr(direction, filter_index, sfn, subframe, slot, start_symbol,
               section_type) -> bytes:
    b0 = ((direction & 1) << 7) | ((OFH_PAYLOAD_VERSION & 0x7) << 4) \
        | (filter_index & 0xF)
    b2 = ((subframe & 0xF) << 4) | ((slot >> 2) & 0xF)
    b3 = ((slot & 0x3) << 6) | (start_symbol & 0x3F)
    return bytes([b0, sfn & 0xFF, b2, b3, 1, section_type])


def _common_section(s: CplaneSection) -> bytes:
    nof_prb = 0 if s.nof_prb > 255 else s.nof_prb
    return bytes([
        (s.section_id >> 4) & 0xFF,
        ((s.section_id & 0xF) << 4) | (1 << 3) | (0 << 2)
        | ((s.prb_start >> 8) & 0x3),
        s.prb_start & 0xFF,
        nof_prb,
        (s.re_mask >> 4) & 0xFF,
        ((s.re_mask & 0xF) << 4) | (s.nof_symbols & 0xF),
    ])


def _ud_comp_hdr(iq_width: int, comp_method: int) -> int:
    return ((iq_width & 0xF) << 4) | (comp_method & 0xF)


def build_type1(msg: CplaneType1) -> bytes:
    out = _radio_hdr(msg.direction, msg.filter_index, msg.sfn, msg.subframe,
                     msg.slot, msg.start_symbol, 1)
    out += bytes([_ud_comp_hdr(msg.iq_width, msg.comp_method), 0])
    out += _common_section(msg.section)
    out += bytes([0, 0])                     # ef/beamId (no beams)
    return out


def build_type3(msg: CplaneType3) -> bytes:
    out = _radio_hdr(msg.direction, msg.filter_index, msg.sfn, msg.subframe,
                     msg.slot, msg.start_symbol, 3)
    out += struct.pack(">H", msg.time_offset & 0xFFFF)
    fft_code = msg.fft_size & 0xF
    out += bytes([(_SCS_CODE[msg.scs_hz] & 0xF) | (fft_code << 4)])
    out += struct.pack(">H", msg.cp_length & 0xFFFF)
    out += bytes([_ud_comp_hdr(msg.iq_width, msg.comp_method)])
    out += _common_section(msg.section)
    out += bytes([0, 0])                     # ef/beamId
    fo = msg.frequency_offset & 0xFFFFFF
    out += bytes([(fo >> 16) & 0xFF]) + struct.pack(">H", fo & 0xFFFF)
    out += bytes([0])                        # reserved
    return out


def _parse_radio_hdr(data: bytes):
    direction = data[0] >> 7
    version = (data[0] >> 4) & 0x7
    assert version == OFH_PAYLOAD_VERSION, version
    filter_index = data[0] & 0xF
    sfn = data[1]
    subframe = data[2] >> 4
    slot = ((data[2] & 0xF) << 2) | (data[3] >> 6)
    start_symbol = data[3] & 0x3F
    nof_sections = data[4]
    assert nof_sections == 1, nof_sections
    section_type = data[5]
    return (direction, filter_index, sfn, subframe, slot, start_symbol,
            section_type)


def _parse_common_section(data: bytes) -> CplaneSection:
    section_id = (data[0] << 4) | (data[1] >> 4)
    prb_start = ((data[1] & 0x3) << 8) | data[2]
    nof_prb = data[3]
    re_mask = (data[4] << 4) | (data[5] >> 4)
    nof_symbols = data[5] & 0xF
    return CplaneSection(section_id=section_id, prb_start=prb_start,
                         nof_prb=nof_prb, nof_symbols=nof_symbols,
                         re_mask=re_mask)


def parse(data: bytes):
    """Decode a C-plane message -> CplaneType1 | CplaneType3."""
    (direction, filt, sfn, subframe, slot, start_symbol,
     section_type) = _parse_radio_hdr(data)
    if section_type == 1:
        iq_width, comp = data[6] >> 4, data[6] & 0xF
        sec = _parse_common_section(data[8:14])
        return CplaneType1(direction=direction, sfn=sfn, subframe=subframe,
                           slot=slot, start_symbol=start_symbol, section=sec,
                           iq_width=iq_width, comp_method=comp,
                           filter_index=filt)
    if section_type == 3:
        time_offset = struct.unpack(">H", data[6:8])[0]
        scs_code, fft_code = data[8] & 0xF, data[8] >> 4
        cp_length = struct.unpack(">H", data[9:11])[0]
        iq_width, comp = data[11] >> 4, data[11] & 0xF
        sec = _parse_common_section(data[12:18])
        # data[18:20] = ef/beamId, data[20:23] = 24-bit frequency offset
        fo = (data[20] << 16) | struct.unpack(">H", data[21:23])[0]
        # 24-bit two's complement
        if fo & 0x800000:
            fo -= 1 << 24
        return CplaneType3(direction=direction, sfn=sfn, subframe=subframe,
                           slot=slot, start_symbol=start_symbol, section=sec,
                           time_offset=time_offset,
                           scs_hz=_SCS_FROM_CODE[scs_code],
                           fft_size=fft_code, cp_length=cp_length,
                           frequency_offset=fo, iq_width=iq_width,
                           comp_method=comp, filter_index=filt)
    raise ValueError(f"unsupported C-plane section type {section_type}")
