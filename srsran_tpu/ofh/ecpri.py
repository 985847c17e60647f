"""eCPRI packetization + VLAN Ethernet framing (host-side byte plane).

Analogue of lib/ofh/ecpri/ecpri_packet_builder_impl.cpp and
lib/ofh/ethernet/vlan_ethernet_frame_builder_impl.cpp: an eCPRI common
header (version 1, message type 0 = IQ data / 2 = real-time control),
PC_ID/SEQ_ID, wrapped in an 802.1Q VLAN Ethernet frame with the O-RAN
eCPRI ethertype 0xAEFE.  No NIC in this deployment — frames travel over an
in-memory cable (ru/ofh.py) or any byte transport.
"""

from __future__ import annotations

import dataclasses
import struct

ECPRI_ETHERTYPE = 0xAEFE
VLAN_TPID = 0x8100

MSG_TYPE_IQ_DATA = 0
MSG_TYPE_RT_CONTROL = 2


@dataclasses.dataclass(frozen=True)
class EcpriParams:
    pc_id: int            # eAxC id (port/carrier)
    seq_id: int           # per-eAxC sequence number


def build_ecpri(msg_type: int, pc_id: int, seq_id: int, payload: bytes) -> bytes:
    """eCPRI common header (4B) + PC_ID/SEQ_ID (4B) + payload."""
    # byte 0: version 1 (<<4), reserved 0, concatenation 0
    hdr = struct.pack(">BBH", 0x10, msg_type, len(payload) + 4)
    ids = struct.pack(">HH", pc_id & 0xFFFF, seq_id & 0xFFFF)
    return hdr + ids + payload


def parse_ecpri(frame: bytes):
    """-> (msg_type, pc_id, seq_id, payload)."""
    ver = frame[0] >> 4
    assert ver == 1, f"unsupported eCPRI version {ver}"
    msg_type = frame[1]
    size = struct.unpack(">H", frame[2:4])[0]
    pc_id, seq_id = struct.unpack(">HH", frame[4:8])
    # size counts the 4 PC_ID/SEQ_ID bytes, so the payload ends at 4 + size;
    # slicing there (not beyond) keeps Ethernet min-size pad bytes out.
    return msg_type, pc_id, seq_id, frame[8: 4 + size]


def build_eth(dst_mac: bytes, src_mac: bytes, vlan_tci: int,
              ecpri_pdu: bytes) -> bytes:
    """802.1Q frame: dst(6) src(6) TPID(2) TCI(2) ethertype(2) payload."""
    return (dst_mac + src_mac + struct.pack(">HH", VLAN_TPID, vlan_tci)
            + struct.pack(">H", ECPRI_ETHERTYPE) + ecpri_pdu)


def parse_eth(frame: bytes):
    """-> (dst_mac, src_mac, vlan_tci, ecpri_pdu); validates ethertypes."""
    dst, src = frame[0:6], frame[6:12]
    tpid, tci = struct.unpack(">HH", frame[12:16])
    assert tpid == VLAN_TPID, hex(tpid)
    etype = struct.unpack(">H", frame[16:18])[0]
    assert etype == ECPRI_ETHERTYPE, hex(etype)
    return dst, src, tci, frame[18:]
