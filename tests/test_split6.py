"""Split-6 FAPI transport: codec roundtrip + separate-process DU-low."""

import re
import subprocess
import sys
import threading

import numpy as np
import pytest

from srsran_tpu.fapi import transport
from srsran_tpu.fapi.messages import (DlTtiRequest, TxDataRequest,
                                      UlTtiRequest)
from srsran_tpu.phy.slot_programs import CellConfig
from srsran_tpu.phy.upper.pdsch import PdschConfig
from srsran_tpu.phy.upper.pusch import PuschConfig
from srsran_tpu.ran.slot_point import SlotPoint


def _cell():
    return CellConfig(nof_ports=1, nof_rb=12, dft_size=256, numerology=1,
                      center_freq_hz=0.0)


def _pusch():
    return PuschConfig(rnti=0x11, rb_start=0, rb_count=12, first_symbol=0,
                       nof_symbols=14, modulation="qam16",
                       target_code_rate=0.5, tbs=1320, nof_layers=1,
                       n_id=0, dmrs_symbols=(2, 7, 11))


def test_codec_roundtrip_messages():
    cell = _cell()
    pu = _pusch()
    ul = UlTtiRequest(slot=SlotPoint(1, 37), pusch=(pu,),
                      pusch_harq=((3, True),))
    for obj in (cell, pu, ul, np.arange(6, dtype=np.complex64),
                {"a": (1, 2.5, None), "b": [True, "x"]}):
        back = transport.decode(transport.encode(obj))
        if isinstance(obj, np.ndarray):
            np.testing.assert_array_equal(back, obj)
        else:
            assert back == obj, (obj, back)


def test_codec_rejects_foreign_classes():
    evil = {"__dc__": "subprocess:Popen", "f": {"args": ["true"]}}
    with pytest.raises(ValueError):
        transport.decode(evil)


def _drive_client(port):
    """MAC-side driver: DL slot, loopback samples as UL, expect CRC ok."""
    cell = _cell()
    pu = _pusch()
    tx_cfg = PdschConfig(rnti=pu.rnti, rb_start=0, rb_count=12,
                         first_symbol=0, nof_symbols=14, modulation="qam16",
                         target_code_rate=0.5, tbs=pu.tbs, nof_layers=1,
                         n_id=0, dmrs_symbols=(2, 7, 11))
    rng = np.random.default_rng(2)
    payload = rng.integers(0, 2, pu.tbs).astype(np.int8)
    cli = transport.FapiClient("127.0.0.1", port)
    cli.configure(cell)
    slot = SlotPoint(1, 0)
    samples = cli.dl_tti(DlTtiRequest(slot=slot, pdsch=(tx_cfg,)),
                         TxDataRequest(slot=slot, pdsch_payloads=(payload,)),
                         want_samples=True)
    assert samples.shape[0] == 1
    cli.rx_samples(samples)
    res = cli.ul_tti(UlTtiRequest(slot=slot, pusch=(pu,)))
    cli.stop()
    assert len(res.crc) == 1 and res.crc[0].tb_crc_ok
    assert len(res.rx_data) == 1
    np.testing.assert_array_equal(res.rx_data[0].payload.astype(np.int8),
                                  payload)


def test_split6_in_process_server():
    port_box = {}
    ready = threading.Event()

    def cb(port):
        port_box["port"] = port
        ready.set()

    srv = threading.Thread(target=transport.serve_phy,
                           kwargs=dict(ready_cb=cb), daemon=True)
    srv.start()
    assert ready.wait(10.0)
    _drive_client(port_box["port"])
    srv.join(30.0)


def test_split6_separate_process_du_low():
    """The real split: du_low app in its own process, MAC here."""
    import os
    env = dict(os.environ)
    proc = subprocess.Popen(
        [sys.executable, "apps/du_low.py", "--port", "0",
         "--set", "cell.nof_rb=12", "--set", "cell.dft_size=256",
         "--set", "cell.nof_ports=1", "--set", "cell.center_freq_hz=0"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
    try:
        port = None
        for line in proc.stdout:
            m = re.search(r"FAPI listening on 127.0.0.1:(\d+)", line)
            if m:
                port = int(m.group(1))
                break
        assert port, "du_low did not report a port"
        _drive_client(port)
        assert proc.wait(timeout=120) == 0
    finally:
        if proc.poll() is None:
            proc.kill()


def test_split6_pipelined_indications():
    """Non-blocking UL slots: the PHY resolves resolve_lag behind the
    launch front and PUSHES slot_results_nb; flush() drains the tail."""
    port_box = {}
    ready = threading.Event()

    def cb(port):
        port_box["port"] = port
        ready.set()

    srv = threading.Thread(target=transport.serve_phy,
                           kwargs=dict(ready_cb=cb), daemon=True)
    srv.start()
    assert ready.wait(10.0)

    from srsran_tpu.fapi.messages import DlTtiRequest, TxDataRequest
    from srsran_tpu.phy.upper.pdsch import PdschConfig
    cell = _cell()
    pu = _pusch()
    tx_cfg = PdschConfig(rnti=pu.rnti, rb_start=0, rb_count=12,
                         first_symbol=0, nof_symbols=14, modulation="qam16",
                         target_code_rate=0.5, tbs=pu.tbs, nof_layers=1,
                         n_id=0, dmrs_symbols=(2, 7, 11))
    rng = np.random.default_rng(5)
    payload = rng.integers(0, 2, pu.tbs).astype(np.int8)
    cli = transport.FapiClient("127.0.0.1", port_box["port"])
    cli.configure(cell)
    n = 5
    for k in range(n):
        slot = SlotPoint(1, 2 * k)
        samples = cli.dl_tti(
            DlTtiRequest(slot=slot, pdsch=(tx_cfg,)),
            TxDataRequest(slot=slot, pdsch_payloads=(payload,)),
            want_samples=True)
        cli.rx_samples(samples)
        cli.ul_tti_nb(UlTtiRequest(slot=slot, pusch=(pu,)))
    results = cli.flush()
    cli.stop()
    assert len(results) == n
    slots_seen = sorted(r.slot.count for r in results)
    assert slots_seen == [2 * k for k in range(n)]
    for r in results:
        assert r.crc[0].tb_crc_ok
        np.testing.assert_array_equal(
            r.rx_data[0].payload.astype(np.int8), payload)
    srv.join(30.0)
