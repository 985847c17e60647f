"""Closed-loop PxSCH BLER integration test over TDL fading channels.

Mirror of the reference's pxsch_bler_test.cpp: PUSCH TX -> TDL channel
emulator -> PUSCH receiver, measuring BLER over many slots at a given SINR.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from srsran_tpu.emulation import channel as chan
from srsran_tpu.phy.upper import pdsch as pdsch_mod, pusch


def _ue_tx_grid(cfg: pusch.PuschConfig, payload, nsc):
    tx_cfg = pdsch_mod.PdschConfig(
        rnti=cfg.rnti, rb_start=cfg.rb_start, rb_count=cfg.rb_count,
        first_symbol=cfg.first_symbol, nof_symbols=cfg.nof_symbols,
        modulation=cfg.modulation, target_code_rate=cfg.target_code_rate,
        tbs=cfg.tbs, nof_layers=cfg.nof_layers, rv=cfg.rv, n_id=cfg.n_id,
        dmrs_symbols=cfg.dmrs_symbols, slot_in_frame=cfg.slot_in_frame)
    grid = jnp.zeros((cfg.nof_layers, 14, nsc), dtype=jnp.complex64)
    return pdsch_mod.process(grid, jnp.asarray(payload), tx_cfg,
                             precoding=np.eye(cfg.nof_layers,
                                              dtype=np.complex64))


@pytest.mark.parametrize("profile,sinr_db,max_bler", [
    ("TDLA", 20.0, 0.1),
    ("TDLB", 22.0, 0.15),
    ("single-tap", 12.0, 0.05),
])
def test_pusch_bler_over_tdl(profile, sinr_db, max_bler):
    nof_slots = 8
    cfg = pusch.PuschConfig(
        rnti=0x11, rb_start=0, rb_count=24, first_symbol=0, nof_symbols=14,
        modulation="qam16", target_code_rate=0.5, tbs=4224, nof_layers=1,
        n_id=1, dmrs_symbols=(2, 7, 11))
    nsc = cfg.rb_count * 12
    ch_cfg = chan.ChannelConfig(profile=profile, sinr_db=sinr_db,
                                nof_tx_ports=1, nof_rx_ports=2,
                                nof_subc=nsc, scs_hz=30_000)
    rng = np.random.default_rng(42)
    errors = 0
    for s in range(nof_slots):
        payload = rng.integers(0, 2, cfg.tbs).astype(np.int8)
        tx = _ue_tx_grid(cfg, payload, nsc)
        key = jax.random.PRNGKey(1000 + s)
        rx, _ = chan.run(key, tx, ch_cfg)
        res = pusch.process(rx, cfg)
        ok = bool(res.tb_crc_ok)
        if ok:
            np.testing.assert_array_equal(np.asarray(res.tb_bits), payload)
        else:
            errors += 1
    bler = errors / nof_slots
    assert bler <= max_bler, f"{profile}@{sinr_db}dB BLER={bler}"
