"""Time-domain channel interpolation strategies (interpolate vs average)."""

import jax.numpy as jnp
import numpy as np
import pytest

from srsran_tpu.ops import channel_estimate as chest


def test_td_weights_mirror_reference_logic():
    # DM-RS at symbols 2, 7, 11 over a 14-symbol slot.
    i0, w = chest._td_weights([2, 7, 11], 14)
    # symbol 0: before first DM-RS -> extrapolate with (2, 7)
    assert i0[0] == 0 and w[0] == pytest.approx((0 - 2) / 5)
    # symbol 2 is the first DM-RS symbol itself
    assert i0[2] == 0 and w[2] == 0.0
    # symbol 5 between 2 and 7
    assert i0[5] == 0 and w[5] == pytest.approx(3 / 5)
    # symbol 7 lands exactly on the second DM-RS
    assert i0[7] == 0 and w[7] == pytest.approx(1.0)
    # symbol 13 after the last DM-RS -> extrapolate with (7, 11)
    assert i0[13] == 1 and w[13] == pytest.approx((13 - 7) / 4)
    # single DM-RS symbol: replicate
    i0, w = chest._td_weights([2], 14)
    assert (i0 == 0).all() and (w == 0).all()


def _run(td_strategy, phases):
    """Noiseless single-port channel whose phase drifts linearly in time."""
    nof_sc, nof_symbols = 48, 14
    dmrs_syms = np.array([2, 7, 11])
    pilot_scs = np.arange(0, nof_sc, 2)
    rng = np.random.default_rng(0)
    expected = np.exp(2j * np.pi * rng.random((1, 3, len(pilot_scs))))
    h_at = np.exp(1j * phases)                        # [nsym] channel phase
    rx = expected * h_at[None, dmrs_syms, None]
    est = chest.estimate(
        jnp.asarray(rx.astype(np.complex64)),
        jnp.asarray(expected.astype(np.complex64)),
        pilot_scs, nof_sc, nof_symbols, 30e3,
        smoothing="mean", estimate_cfo=False,
        td_strategy=td_strategy, dmrs_symbol_idx=dmrs_syms)
    return np.asarray(est.coeffs)[0, 0], h_at


def test_interpolate_tracks_time_variation():
    phases = np.linspace(0.0, 0.9, 14)          # linear drift across the slot
    coeffs, h_at = _run("interpolate", phases)
    err_interp = np.abs(coeffs.mean(axis=1) - h_at).max()
    coeffs_avg, _ = _run("average", phases)[0], None
    # linear-in-time channel phase is tracked; the residual is the complex
    # lerp chord error (the reference lerps complex values the same way)
    assert err_interp < 0.05
    err_avg = np.abs(_run("average", phases)[0].mean(axis=1) - h_at).max()
    assert err_interp < err_avg / 5


def test_average_unchanged_for_static_channel():
    phases = np.full(14, 0.3)
    ci, h = _run("interpolate", phases)       # [14, nsc]
    ca, _ = _run("average", phases)           # [1, nsc] (time-constant)
    np.testing.assert_allclose(ci, np.broadcast_to(ca, ci.shape), atol=1e-5)


def test_pusch_decodes_with_interpolate_strategy():
    """End-to-end PUSCH decode with the interpolate strategy enabled."""
    import dataclasses
    from srsran_tpu.phy.slot_programs import CellConfig, dl_slot_fn, ul_slot_fn
    from srsran_tpu.phy.upper.pdsch import PdschConfig
    from srsran_tpu.phy.upper.pusch import PuschConfig
    from srsran_tpu.ran.ldpc_params import segment_tb, select_base_graph

    cell = CellConfig(nof_ports=1, nof_rb=12, dft_size=256, numerology=1,
                      center_freq_hz=0.0)
    common = dict(rnti=0x11, rb_start=0, rb_count=12, first_symbol=0,
                  nof_symbols=14, modulation="qam16", target_code_rate=0.5,
                  tbs=1320, nof_layers=1, n_id=0, dmrs_symbols=(2, 7, 11))
    tx_cfg = PdschConfig(**common)
    pu = PuschConfig(**common, td_interpolation="interpolate")
    rng = np.random.default_rng(5)
    payload = jnp.asarray(rng.integers(0, 2, pu.tbs).astype(np.int8))
    samples, _ = dl_slot_fn(cell, ((), (), (tx_cfg,), ()))((), (), (payload,))
    seg = segment_tb(pu.tbs, select_base_graph(pu.tbs, 0.5))
    softs = (jnp.zeros((seg.nof_codeblocks, seg.codeword_bits), jnp.float32),)
    out = ul_slot_fn(cell, ((pu,), (), (), (), ()))(samples, (), softs)
    assert bool(np.asarray(out["pusch"][0]["tb_crc_ok"]).all())
