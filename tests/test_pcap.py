"""DLT pcap writer: format correctness and FAPI capture roundtrip."""

import json
import struct

import numpy as np

from srsran_tpu.utils import pcap


def test_pcap_format_and_roundtrip(tmp_path):
    path = str(tmp_path / "t.pcap")
    w = pcap.PcapWriter(path, dlt=pcap.DLT_FAPI)
    w.write(b"hello", ts=123.000456)
    w.write(b"\x00" * 300)
    w.close()
    dlt, records = pcap.read_pcap(path)
    assert dlt == pcap.DLT_FAPI
    assert len(records) == 2
    ts, payload = records[0]
    assert payload == b"hello" and abs(ts - 123.000456) < 1e-5
    assert len(records[1][1]) == 300
    # global header is the classic libpcap layout Wireshark accepts
    raw = open(path, "rb").read(24)
    magic, vmaj, vmin = struct.unpack("<IHH", raw[:8])
    assert (magic, vmaj, vmin) == (0xA1B2C3D4, 2, 4)


def test_fapi_capture_decodes_back(tmp_path):
    from srsran_tpu.fapi.messages import DlTtiRequest
    from srsran_tpu.fapi.transport import decode
    from srsran_tpu.phy.upper.pdsch import PdschConfig
    from srsran_tpu.ran.slot_point import SlotPoint

    path = str(tmp_path / "fapi.pcap")
    cap = pcap.FapiPcap(path)
    pd = PdschConfig(rnti=1, rb_start=0, rb_count=6, first_symbol=1,
                     nof_symbols=12, modulation="qpsk",
                     target_code_rate=0.3, tbs=288, nof_layers=1,
                     n_id=0, dmrs_symbols=(2,))
    dl = DlTtiRequest(slot=SlotPoint(1, 5), pdsch=(pd,))
    cap.capture("dl_tti", dl)
    cap.close()
    _, records = pcap.read_pcap(path)
    assert len(records) == 1
    payload = records[0][1]
    (n,) = struct.unpack(">Q", payload[:8])
    msg = json.loads(payload[8:8 + n].decode())
    assert msg["t"] == "dl_tti"
    back = decode(msg["b"])
    assert back == dl


def test_conductor_captures_slot_messages(tmp_path):
    import jax.numpy as jnp
    from srsran_tpu.fapi.conductor import SlotConductor
    from srsran_tpu.fapi.messages import (DlTtiRequest, TxDataRequest,
                                          UlTtiRequest)
    from srsran_tpu.phy.slot_programs import CellConfig
    from srsran_tpu.phy.upper.pdsch import PdschConfig
    from srsran_tpu.phy.upper.pusch import PuschConfig
    from srsran_tpu.ran.slot_point import SlotPoint

    path = str(tmp_path / "cond.pcap")
    cap = pcap.FapiPcap(path)
    cell = CellConfig(nof_ports=1, nof_rb=6, dft_size=128, numerology=1,
                      center_freq_hz=0.0)
    cond = SlotConductor(cell, pcap=cap)
    slot = SlotPoint(1, 0)
    pd = PdschConfig(rnti=1, rb_start=0, rb_count=6, first_symbol=1,
                     nof_symbols=12, modulation="qpsk",
                     target_code_rate=0.3, tbs=288, nof_layers=1,
                     n_id=0, dmrs_symbols=(2,))
    rng = np.random.default_rng(0)
    payload = jnp.asarray(rng.integers(0, 2, 288).astype(np.int8))
    samples, _ = cond.process_dl(DlTtiRequest(slot=slot, pdsch=(pd,)),
                                 TxDataRequest(slot=slot,
                                               pdsch_payloads=(payload,)))
    pu = PuschConfig(rnti=1, rb_start=0, rb_count=6, first_symbol=1,
                     nof_symbols=12, modulation="qpsk",
                     target_code_rate=0.3, tbs=288, nof_layers=1,
                     n_id=0, dmrs_symbols=(2,))
    cond.process_ul(UlTtiRequest(slot=slot, pusch=(pu,)), samples).resolve()
    cap.close()
    _, records = pcap.read_pcap(path)
    kinds = []
    for _, rec in records:
        (n,) = struct.unpack(">Q", rec[:8])
        kinds.append(json.loads(rec[8:8 + n].decode())["t"])
    assert kinds == ["dl_tti", "tx_data", "ul_tti", "slot_results"]
