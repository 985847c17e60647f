"""FAPI config plane: param/config/start/stop, error.indication, and cell
reconfiguration without process restart.

Mirrors include/srsran/fapi/messages/config_messages.h,
param_request_tlvs.h, and error_indication.h, plus the translator's slot
gating (fapi_to_phy_translator.cpp is_message_in_time).
"""

import threading

import numpy as np
import pytest

from srsran_tpu.fapi import transport
from srsran_tpu.fapi.config_messages import (CellManager, ConfigRequest,
                                             ConfigResponse, ErrorCode,
                                             ErrorIndication, ParamRequest,
                                             ParamResponse, PhyState,
                                             StartRequest, StopIndication,
                                             StopRequest)
from srsran_tpu.fapi.messages import (DlTtiRequest, TxDataRequest,
                                      UlTtiRequest)
from srsran_tpu.phy.slot_programs import CellConfig
from srsran_tpu.phy.upper.pdsch import PdschConfig
from srsran_tpu.phy.upper.pusch import PuschConfig
from srsran_tpu.ran.slot_point import SlotPoint


def _cell(nof_rb=12):
    dft = 256 if nof_rb * 12 <= 256 else 512
    return CellConfig(nof_ports=1, nof_rb=nof_rb, dft_size=dft, numerology=1,
                      center_freq_hz=0.0)


def _pusch(nof_rb=12):
    tbs = 1320 if nof_rb == 12 else 2400
    return PuschConfig(rnti=0x11, rb_start=0, rb_count=nof_rb, first_symbol=0,
                       nof_symbols=14, modulation="qam16",
                       target_code_rate=0.5, tbs=tbs, nof_layers=1,
                       n_id=0, dmrs_symbols=(2, 7, 11))


# ---------------------------------------------------------------- manager

def test_state_machine_and_param():
    mgr = CellManager()
    assert mgr.state is PhyState.IDLE
    p = mgr.handle_config_msg(ParamRequest())
    assert isinstance(p, ParamResponse) and p.max_dl_layers == 4
    # slot before config -> invalid state
    err = mgr.gate_slot("dl_tti", SlotPoint(1, 0))
    assert isinstance(err, ErrorIndication)
    assert err.error_code is ErrorCode.MSG_INVALID_STATE
    # configure + start
    r = mgr.handle_config_msg(ConfigRequest(cell=_cell()))
    assert r.error_code is ErrorCode.MSG_OK
    assert mgr.state is PhyState.CONFIGURED
    assert mgr.gate_slot("dl_tti", SlotPoint(1, 0)) is not None
    assert mgr.handle_config_msg(StartRequest()) is None
    assert mgr.state is PhyState.RUNNING
    assert mgr.gate_slot("dl_tti", SlotPoint(1, 0)) is None
    # config while running -> rejected
    r = mgr.handle_config_msg(ConfigRequest(cell=_cell(24)))
    assert r.error_code is ErrorCode.MSG_INVALID_STATE
    # stop -> stop.indication, then reconfig accepted
    si = mgr.handle_config_msg(StopRequest())
    assert isinstance(si, StopIndication)
    r = mgr.handle_config_msg(ConfigRequest(cell=_cell(24)))
    assert r.error_code is ErrorCode.MSG_OK
    assert mgr.cell.nof_rb == 24


def test_invalid_config_rejected():
    mgr = CellManager()
    bad = CellConfig(nof_ports=1, nof_rb=100, dft_size=256, numerology=1)
    r = mgr.handle_config_msg(ConfigRequest(cell=bad))
    assert r.error_code is ErrorCode.MSG_INVALID_CONFIG
    assert "cell.dft_size" in r.invalid_params
    assert mgr.state is PhyState.IDLE


def test_out_of_window_slot():
    mgr = CellManager()
    mgr.handle_config_msg(ConfigRequest(cell=_cell()))
    mgr.handle_config_msg(StartRequest())
    assert mgr.gate_slot("ul_tti", SlotPoint(1, 100)) is None
    # within the 5-slot window: ok
    assert mgr.gate_slot("ul_tti", SlotPoint(1, 96)) is None
    # beyond it: OUT_OF_SYNC
    err = mgr.gate_slot("ul_tti", SlotPoint(1, 90))
    assert err is not None and err.error_code is ErrorCode.OUT_OF_SYNC


# -------------------------------------------------------------- transport

def _start_server():
    port_box = {}
    ready = threading.Event()

    def cb(port):
        port_box["port"] = port
        ready.set()

    srv = threading.Thread(target=transport.serve_phy,
                           kwargs=dict(ready_cb=cb), daemon=True)
    srv.start()
    assert ready.wait(10.0)
    return srv, port_box["port"]


def _run_slot(cli, nof_rb, slot_count=0):
    pu = _pusch(nof_rb)
    tx_cfg = PdschConfig(rnti=pu.rnti, rb_start=0, rb_count=nof_rb,
                         first_symbol=0, nof_symbols=14, modulation="qam16",
                         target_code_rate=0.5, tbs=pu.tbs, nof_layers=1,
                         n_id=0, dmrs_symbols=(2, 7, 11))
    rng = np.random.default_rng(2)
    payload = rng.integers(0, 2, pu.tbs).astype(np.int8)
    slot = SlotPoint(1, slot_count)
    samples = cli.dl_tti(DlTtiRequest(slot=slot, pdsch=(tx_cfg,)),
                         TxDataRequest(slot=slot, pdsch_payloads=(payload,)),
                         want_samples=True)
    if isinstance(samples, ErrorIndication):
        return samples
    cli.rx_samples(samples)
    return cli.ul_tti(UlTtiRequest(slot=slot, pusch=(pu,)))


def test_split6_config_plane_reconfig_and_window():
    srv, port = _start_server()
    cli = transport.FapiClient("127.0.0.1", port)
    # full config-plane bring-up
    p = cli.config_msg(ParamRequest())
    assert isinstance(p, ParamResponse)
    r = cli.config_msg(ConfigRequest(cell=_cell(12)))
    assert isinstance(r, ConfigResponse) and r.error_code is ErrorCode.MSG_OK
    assert cli.config_msg(StartRequest()) is None
    res = _run_slot(cli, 12, slot_count=50)
    assert res.crc[0].tb_crc_ok
    # a slot far behind the front -> error.indication (OUT_OF_SYNC)
    res = _run_slot(cli, 12, slot_count=40)
    assert isinstance(res, ErrorIndication)
    assert res.error_code is ErrorCode.OUT_OF_SYNC
    # reconfigure bandwidth mid-run WITHOUT restarting the process
    cli.reconfigure(_cell(24))
    res = _run_slot(cli, 24, slot_count=60)
    assert res.crc[0].tb_crc_ok
    cli.stop()
    srv.join(30.0)


def test_split6_slot_before_config_yields_error_indication():
    srv, port = _start_server()
    cli = transport.FapiClient("127.0.0.1", port)
    res = _run_slot(cli, 12)
    assert isinstance(res, ErrorIndication)
    assert res.error_code is ErrorCode.MSG_INVALID_STATE
    cli.stop()
    srv.join(30.0)
