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
