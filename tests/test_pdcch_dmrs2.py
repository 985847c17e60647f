"""PDCCH interleaved mapping, DM-RS type 2, group hopping."""

import numpy as np
import jax.numpy as jnp
import pytest

from srsran_tpu.phy.upper import pdcch
from srsran_tpu.phy.upper.dmrs import DmrsConfig, map_to_grid, type2_sc_indices
from srsran_tpu.ops.low_papr import group_hopping


def test_interleaved_bundle_map_is_permutation():
    cs = pdcch.CoresetConfig(rb_start=0, nof_rb=48, start_symbol=0,
                             duration=1, interleaved=True, reg_bundle_size=6,
                             interleaver_size=2, shift_index=5)
    f = pdcch._bundle_map(cs)
    assert sorted(f.tolist()) == list(range(len(f)))
    # different from identity
    assert not np.array_equal(f, np.arange(len(f)))


def test_interleaved_pdcch_loopback():
    cs = pdcch.CoresetConfig(rb_start=0, nof_rb=36, start_symbol=0,
                             duration=2, interleaved=True, reg_bundle_size=6,
                             interleaver_size=3, shift_index=7)
    cfg = pdcch.PdcchConfig(coreset=cs, rnti=0x99, aggregation_level=4,
                            cce_index=2, payload_bits=36, n_id=7, n_id_data=7)
    rng = np.random.default_rng(0)
    payload = jnp.asarray(rng.integers(0, 2, 36).astype(np.int8))
    grid = jnp.zeros((1, 14, 40 * 12), dtype=jnp.complex64)
    grid = pdcch.process(grid, payload, cfg)
    # add noise and recover
    g = np.asarray(grid) + 0.02 * (
        rng.normal(size=grid.shape) + 1j * rng.normal(size=grid.shape))
    dec, ok = pdcch.recover(jnp.asarray(g.astype(np.complex64)), cfg,
                            noise_var=0.0008)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(payload))


def test_dmrs_type2_layout():
    cfg = DmrsConfig(rb_start=0, rb_count=2, symbols=(2,), ports=(0, 2, 4),
                     scrambling_id=1, config_type=2)
    g = np.asarray(map_to_grid(jnp.zeros((3, 14, 24), dtype=jnp.complex64), cfg))
    # port 0 -> group 0 subcarriers {0,1,6,7}+12k; port 2 -> group 1 {2,3,8,9}
    nz0 = set(np.nonzero(g[0, 2])[0].tolist())
    assert nz0 == {0, 1, 6, 7, 12, 13, 18, 19}
    nz1 = set(np.nonzero(g[1, 2])[0].tolist())
    assert nz1 == {2, 3, 8, 9, 14, 15, 20, 21}
    nz2 = set(np.nonzero(g[2, 2])[0].tolist())
    assert nz2 == {4, 5, 10, 11, 16, 17, 22, 23}


def test_group_hopping_values():
    u0, v0 = group_hopping(301)                      # no hopping
    assert u0 == 301 % 30 and v0 == 0
    u1, v1 = group_hopping(301, group_hopping_enabled=True, slot=3, symbol=5)
    assert 0 <= u1 < 30 and v1 == 0
    u2, _ = group_hopping(301, group_hopping_enabled=True, slot=3, symbol=6)
    # hopping should change the group between symbols (overwhelmingly likely)
    assert (u1, u2) != (u0, u0)


def test_fused_dci_chain_matches_stepwise():
    """_fused_dci_maps (one matmul) == encode_dci + scramble_bits."""
    import numpy as np
    import jax.numpy as jnp
    from srsran_tpu.phy.upper import pdcch
    from srsran_tpu.ops.scrambling import scramble_bits
    rng = np.random.default_rng(3)
    for a, al, rnti, n_rnti, n_id in [(39, 4, 0x4601, 0, 1),
                                      (60, 8, 0xFFFE, 0x4601, 777),
                                      (12, 1, 1, 0, 0), (128, 16, 17, 17, 2)]:
        payload = rng.integers(0, 2, a).astype(np.int8)
        cfg = pdcch.PdcchConfig(
            coreset=pdcch.CoresetConfig(rb_start=0, nof_rb=96,
                                        start_symbol=0, duration=1),
            rnti=rnti, aggregation_level=al, cce_index=0, payload_bits=a,
            n_id=n_id, n_id_data=n_id, n_rnti=n_rnti)
        want = np.asarray(scramble_bits(
            pdcch.encode_dci(jnp.asarray(payload), cfg)[None],
            ((n_rnti << 16) + n_id) % (1 << 31))[0])
        m, const = pdcch._fused_dci_maps(a, 108 * al, rnti, n_rnti, n_id)
        got = ((payload.astype(np.int32) @ m.astype(np.int32) + const) & 1)
        np.testing.assert_array_equal(got.astype(np.int8), want)


def test_patch_mapping_matches_explicit_scatter():
    """The dense-patch gather (process) must place every data/DM-RS RE
    exactly where a direct (symbol, subcarrier) scatter would."""
    cs = pdcch.CoresetConfig(rb_start=2, nof_rb=24, start_symbol=1,
                             duration=3, interleaved=True, reg_bundle_size=6,
                             interleaver_size=2, shift_index=3)
    cfg = pdcch.PdcchConfig(coreset=cs, rnti=0x4601, aggregation_level=2,
                            cce_index=1, payload_bits=28, n_id=11, n_id_data=11)
    rng = np.random.default_rng(1)
    payload = jnp.asarray(rng.integers(0, 2, 28).astype(np.int8))
    grid = pdcch.process(jnp.zeros((1, 14, 30 * 12), dtype=jnp.complex64),
                         payload, cfg)

    enc = pdcch.encode_dci(payload, cfg)
    from srsran_tpu.ops.scrambling import scramble_bits
    c_init = ((cfg.n_rnti << 16) + cfg.n_id_data) % (1 << 31)
    bits = scramble_bits(enc[None], c_init)
    from srsran_tpu.ops.modulation import modulate
    syms = np.asarray(modulate(bits, "qpsk")[0])
    data_pos, dmrs_pos, dmrs_prb = pdcch._candidate_re_plan(
        cs, cfg.cce_index, cfg.aggregation_level)
    pilots = np.asarray(pdcch._dmrs_values(cfg, dmrs_pos, dmrs_prb))
    ref = np.zeros((1, 14, 30 * 12), dtype=np.complex64)
    ref[0, data_pos[:, 0], data_pos[:, 1]] = syms
    # pilots ordered by symbol then row order (matching _dmrs_values)
    j = 0
    for l in sorted(set(dmrs_pos[:, 0].tolist())):
        for ll, sc in dmrs_pos[dmrs_pos[:, 0] == l]:
            ref[0, ll, sc] = pilots[j]
            j += 1
    np.testing.assert_allclose(np.asarray(grid), ref, atol=1e-6)
