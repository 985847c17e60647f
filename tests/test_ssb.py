"""SSB/PBCH chain: sequence properties and full TX->OFDM->RX loopback."""

import numpy as np
import jax.numpy as jnp
import pytest

from srsran_tpu.phy.upper import ssb
from srsran_tpu.ops import ofdm


def test_pss_properties():
    for nid2 in range(3):
        p = ssb.pss_sequence(nid2)
        assert p.shape == (127,) and set(np.unique(p)) <= {-1.0, 1.0}
    # different roots should have low cross-correlation
    c = abs(np.dot(ssb.pss_sequence(0), ssb.pss_sequence(1)))
    assert c < 30


def test_sss_distinguishes_cells():
    a = ssb.sss_sequence(10, 0)
    b = ssb.sss_sequence(11, 0)
    assert abs(np.dot(a, b)) < 40
    assert abs(np.dot(a, a)) == 127


def test_pbch_payload_roundtrip():
    cfg = ssb.SsbConfig(phys_cell_id=123, ssb_idx=2, l_max=8, sfn=427, hrf=True)
    rng = np.random.default_rng(0)
    mib = rng.integers(0, 2, 24).astype(np.int8)
    a = ssb.pbch_payload(cfg, mib)
    back = ssb.pbch_extract_mib(a, cfg)
    np.testing.assert_array_equal(back, mib)
    # scrambling is involutive
    ap = ssb.pbch_scramble_payload(a, cfg)
    np.testing.assert_array_equal(ssb.pbch_scramble_payload(ap, cfg), a)


@pytest.mark.parametrize("nid,idx,lmax", [(0, 0, 4), (500, 3, 8), (1007, 7, 8)])
def test_ssb_block_structure(nid, idx, lmax):
    cfg = ssb.SsbConfig(phys_cell_id=nid, ssb_idx=idx, l_max=lmax, sfn=100)
    mib = np.zeros(24, dtype=np.int8)
    patch = np.asarray(ssb.ssb_block(cfg, mib))
    assert patch.shape == (4, 240)
    # PSS occupies 127 REs of symbol 0, zero elsewhere in symbol 0
    assert np.count_nonzero(patch[0]) == 127
    assert np.allclose(np.abs(patch[0, 56:183]), 1.0)
    # symbol 1 fully occupied (180 data + 60 dmrs)
    assert np.count_nonzero(patch[1]) == 240
    # symbol 2: SSS 127 + PBCH 72 + DMRS 24
    assert np.count_nonzero(patch[2]) == 127 + 96
    assert np.count_nonzero(patch[3]) == 240


def test_ssb_ofdm_loopback_pbch_decodes():
    """TX: MIB -> SSB patch -> slot grid -> OFDM samples; RX: demod -> decode."""
    cfg = ssb.SsbConfig(phys_cell_id=42, ssb_idx=1, l_max=8, sfn=77,
                        first_symbol=2, first_subcarrier=48)
    rng = np.random.default_rng(1)
    mib = rng.integers(0, 2, 24).astype(np.int8)

    nof_sc, dft, mu = 360, 512, 1   # 30 RB at 30 kHz
    grid = jnp.zeros((14, nof_sc), dtype=jnp.complex64)
    grid = ssb.map_ssb_to_grid(grid, cfg, mib)
    tx = ofdm.modulate_slot(grid, dft, mu, center_freq_hz=3.5e9)

    # channel: scale + noise
    snr_amp = 0.05
    rx_samples = tx * 1.0 + jnp.asarray(
        (rng.normal(0, snr_amp, tx.shape) + 1j * rng.normal(0, snr_amp, tx.shape))
        .astype(np.complex64))
    rx_grid = ofdm.demodulate_slot(rx_samples, nof_sc, dft, mu, center_freq_hz=3.5e9)
    patch = rx_grid[cfg.first_symbol: cfg.first_symbol + 4,
                    cfg.first_subcarrier: cfg.first_subcarrier + 240]

    a, ok = ssb.pbch_decode(patch, cfg, noise_var=2 * snr_amp ** 2)
    assert bool(ok), "PBCH CRC failed"
    got_mib = ssb.pbch_extract_mib(np.asarray(a), cfg)
    np.testing.assert_array_equal(got_mib, mib)
    # SFN LSBs recovered from timing bits
    a_np = np.asarray(a)
    sfn_lsbs = (a_np[ssb._G[6]] << 3) | (a_np[ssb._G[7]] << 2) | \
               (a_np[ssb._G[8]] << 1) | a_np[ssb._G[9]]
    assert sfn_lsbs == cfg.sfn % 16


def test_ssb_block_fused_matches_stepwise_chain():
    """The one-matmul fused PBCH path must equal pbch_encode+pbch_modulate,
    with and without the traced slot context, across SFN/ssb_idx/l_max."""
    import jax.numpy as jnp
    rng = np.random.default_rng(9)
    for nid, idx, lmax, sfn, hrf in [(1, 0, 8, 0, False), (500, 3, 8, 777, True),
                                     (261, 5, 64, 123, False), (7, 1, 4, 42, True)]:
        cfg = ssb.SsbConfig(phys_cell_id=nid, ssb_idx=idx, l_max=lmax,
                            sfn=sfn, hrf=hrf, first_symbol=0,
                            first_subcarrier=0)
        mib = rng.integers(0, 2, 24).astype(np.int8)
        # step-by-step chain (kept as the reference semantics)
        want = np.asarray(ssb.pbch_modulate(ssb.pbch_encode(cfg, mib), cfg))
        _, data_pos = ssb._ssb_re_maps(nid % 4)
        got = np.asarray(ssb.ssb_block(cfg, jnp.asarray(mib)))
        got_data = got[data_pos[:, 0], data_pos[:, 1]]
        np.testing.assert_allclose(got_data, want, atol=1e-6)
        # traced slot-ctx path
        ctx = ssb.slot_ctx_for(cfg)
        got2 = np.asarray(ssb.ssb_block(
            cfg, jnp.asarray(mib),
            (jnp.asarray(ctx[0]), jnp.asarray(ctx[1]))))
        np.testing.assert_allclose(got2[data_pos[:, 0], data_pos[:, 1]],
                                   want, atol=1e-6)
