"""E2/KPM agent: setup, subscription, periodic indications, delete.

Mirrors the reference's e2 unit tests (tests/unittests/e2/*,
e2sm_kpm_meas_provider_test.cpp) at the JSON-transport level.
"""

import time

from srsran_tpu.utils.e2_kpm import E2Agent, RicServer, SUPPORTED_MEAS


def _mk():
    state = {"crc": 0.0, "snr": 21.5}

    def provider():
        state["crc"] += 10.0          # 10 new CRC-OK TBs per snapshot
        return {"L1M.PUSCH-CRC-OK": state["crc"],
                "L1M.UL-SNR": state["snr"],
                "DRB.UEThpDl": 8000.0}

    ric = RicServer()
    agent = E2Agent("127.0.0.1", ric.port, provider)
    agent.start()
    return ric, agent


def test_setup_and_periodic_indications():
    ric, agent = _mk()
    try:
        assert ric.setup is not None
        fn = ric.setup["ran_functions"][0]
        assert fn["ran_function_id"] == 2
        assert "L1M.PUSCH-CRC-OK" in fn["meas_types"]

        ric.subscribe(1, ["L1M.PUSCH-CRC-OK", "L1M.UL-SNR", "Bogus.Metric"],
                      report_period_ms=50)
        resp = ric.wait_response()
        assert resp["msg"] == "ric_subscription_response"
        assert resp["not_admitted"] == ["Bogus.Metric"]

        inds = ric.wait_indications(3)
        assert len(inds) >= 3
        m = inds[1]["message"]["meas_data"]
        # cumulative metric reported as per-period delta
        assert m["L1M.PUSCH-CRC-OK"] == 10.0
        assert m["L1M.UL-SNR"] == 21.5
        assert inds[0]["ric_request_id"] == 1
        assert inds[1]["sequence"] > inds[0]["sequence"]

        ric.delete_subscription(1)
        time.sleep(0.15)
        n = len(ric.wait_indications(0))
        time.sleep(0.15)
        assert len(ric.wait_indications(0)) <= n + 1  # stream stopped
    finally:
        agent.stop()
        ric.close()


def test_unsupported_subscription_rejected():
    ric, agent = _mk()
    try:
        ric.subscribe(7, ["Nope.1", "Nope.2"])
        resp = ric.wait_response()
        assert resp["msg"] == "ric_subscription_failure"
        assert resp["ric_request_id"] == 7
    finally:
        agent.stop()
        ric.close()


def test_supported_meas_cover_reference_families():
    # the reference provider families: DRB throughput/volume, RRU PRB
    # counters, radio measurements (e2sm_kpm_du_meas_provider_impl.cpp)
    fams = {m.split(".")[0] for m in SUPPORTED_MEAS}
    assert {"DRB", "RRU", "L1M"} <= fams


# ------------------------------------------------------------ E2SM-RC

def test_rc_control_changes_scheduler_next_slot():
    """RIC control request -> scheduler behavior change on the NEXT slot
    (e2sm_rc control procedure through the du executor analogue)."""
    from srsran_tpu.mac.scheduler import CellScheduler, SchedUeConfig
    from srsran_tpu.phy.slot_programs import CellConfig
    from srsran_tpu.ran.slot_point import SlotPoint
    from srsran_tpu.ran.tdd import TddPattern

    cell = CellConfig(nof_rb=52, numerology=1, nof_ports=2, dft_size=1024)
    sched = CellScheduler(
        cell, 1, ues=[SchedUeConfig(rnti=0x4601)],
        tdd=TddPattern(periodicity_slots=2, nof_dl_slots=1, nof_ul_slots=1))
    ric = RicServer()
    agent = E2Agent("127.0.0.1", ric.port, lambda: {},
                    control_handler=sched.apply_ric_control)
    agent.start()
    try:
        # RC function advertised alongside KPM
        fns = {f["ran_function_id"] for f in ric.setup["ran_functions"]}
        assert fns == {2, 3}
        rc = [f for f in ric.setup["ran_functions"]
              if f["ran_function_id"] == 3][0]
        assert "set_ue_mcs_cap" in rc["control_actions"]

        # baseline grant uses the configured MCS (27 -> qam64 high rate)
        dl0, _, _ = sched.slot_indication(SlotPoint(1, 0))
        assert dl0.pdsch[0].modulation == "qam64"

        ric.control(10, "set_ue_mcs_cap", {"rnti": 0x4601, "max_mcs": 3})
        ack = ric.wait_response_for(10)
        assert ack["msg"] == "ric_control_ack"
        dl1, _, _ = sched.slot_indication(SlotPoint(1, 2))
        assert dl1.pdsch[0].modulation == "qpsk"      # capped at MCS 3

        # cell stop empties the schedule; start restores it
        ric.control(11, "cell_stop", {})
        assert ric.wait_response_for(11)["msg"] == "ric_control_ack"
        dl2, _, ul2 = sched.slot_indication(SlotPoint(1, 4))
        assert not dl2.pdsch and not ul2.pusch
        ric.control(12, "cell_start", {})
        assert ric.wait_response_for(12)["msg"] == "ric_control_ack"
        dl3, _, _ = sched.slot_indication(SlotPoint(1, 6))
        assert dl3.pdsch

        # unknown action and bad params -> ric_control_failure
        ric.control(13, "detonate", {})
        assert ric.wait_response_for(13)["msg"] == "ric_control_failure"
        ric.control(14, "set_ue_mcs_cap", {"rnti": 0x9999, "max_mcs": 1})
        assert ric.wait_response_for(14)["msg"] == "ric_control_failure"
    finally:
        agent.stop()
        ric.close()
