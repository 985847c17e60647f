"""Host-computed slot-context VALUES must equal the in-trace sequence path.

Round-3 perf design: the conductor uploads per-slot sequence VALUES
(pilots / reference weights) instead of c_init seeds, removing all Gold +
trig ops from the compiled slot programs.  These tests pin the equivalence
of both paths for every processor that accepts a slot context."""

import numpy as np
import jax.numpy as jnp

from srsran_tpu.phy.upper import dmrs as dmrs_mod
from srsran_tpu.phy.upper import pdcch as pdcch_mod
from srsran_tpu.phy.upper import csi_rs as csi_rs_mod
from srsran_tpu.phy.upper import ptrs_prs as pp_mod
from srsran_tpu.phy.upper import pucch as pucch_mod

NSC = 24 * 12


def test_dmrs_pilot_values_match_device_path():
    cfg = dmrs_mod.DmrsConfig(rb_start=2, rb_count=10, symbols=(2, 7, 11),
                              ports=(0, 1, 2), scrambling_id=77, n_scid=1,
                              slot_in_frame=9)
    vals = jnp.asarray(dmrs_mod.pilot_values_for(cfg))
    for port in (0, 1, 2):
        a = np.asarray(dmrs_mod.pilots_for_port(cfg, port))        # static
        b = np.asarray(dmrs_mod.pilots_for_port(cfg, port, vals))  # values
        np.testing.assert_allclose(b, a, atol=1e-6)


def test_pdcch_dmrs_values_match():
    coreset = pdcch_mod.CoresetConfig(rb_start=2, nof_rb=12, start_symbol=1,
                                      duration=2)
    cfg = pdcch_mod.PdcchConfig(coreset=coreset, rnti=0x41,
                                aggregation_level=2, cce_index=1,
                                payload_bits=32, n_id=55, n_id_data=55,
                                slot_in_frame=7)
    rng = np.random.default_rng(0)
    payload = jnp.asarray(rng.integers(0, 2, 32).astype(np.int8))
    grid0 = jnp.zeros((1, 14, NSC), jnp.complex64)
    a = np.asarray(pdcch_mod.process(grid0, payload, cfg))
    vals = jnp.asarray(pdcch_mod.dmrs_values_for(cfg))
    b = np.asarray(pdcch_mod.process(grid0, payload, cfg, dmrs_cinits=vals))
    np.testing.assert_allclose(b, a, atol=1e-6)


def test_csi_rs_values_match():
    cfg = csi_rs_mod.CsiRsConfig(row=4, rb_start=0, rb_count=24, symbol=5,
                                 k0=0, scrambling_id=31, slot_in_frame=3)
    grid0 = jnp.zeros((4, 14, NSC), jnp.complex64)
    a = np.asarray(csi_rs_mod.process(grid0, cfg))
    vals = jnp.asarray(csi_rs_mod.seq_values_for(cfg))
    b = np.asarray(csi_rs_mod.process(grid0, cfg, c_init=vals))
    np.testing.assert_allclose(b, a, atol=1e-6)


def test_ptrs_prs_values_match():
    pt = pp_mod.PtrsConfig(rb_start=0, rb_count=24, first_symbol=0,
                           nof_symbols=14, dmrs_symbols=(2, 11),
                           scrambling_id=7, n_scid=0, slot_in_frame=4)
    grid0 = jnp.zeros((2, 14, NSC), jnp.complex64)
    a = np.asarray(pp_mod.map_ptrs(grid0, pt))
    b = np.asarray(pp_mod.map_ptrs(
        grid0, pt, cinits=jnp.asarray(pp_mod.ptrs_values_for(pt))))
    np.testing.assert_allclose(b, a, atol=1e-6)

    pr = pp_mod.PrsConfig(rb_start=2, rb_count=12, first_symbol=1,
                          nof_symbols=6, comb_size=6, comb_offset=2,
                          n_id_prs=777, slot_in_frame=8)
    a = np.asarray(pp_mod.map_prs(grid0, pr))
    b = np.asarray(pp_mod.map_prs(
        grid0, pr, cinits=jnp.asarray(pp_mod.prs_values_for(pr))))
    np.testing.assert_allclose(b, a, atol=1e-6)


def _noisy_grid(seed, ports=2):
    rng = np.random.default_rng(seed)
    g = (rng.normal(size=(ports, 14, NSC))
         + 1j * rng.normal(size=(ports, 14, NSC))).astype(np.complex64)
    return jnp.asarray(0.3 * g)


def test_pucch_f0_refs_match():
    cfg = pucch_mod.PucchF0Config(prb=3, start_symbol=12, nof_symbols=2,
                                  initial_cyclic_shift=5, n_id=77, slot=4,
                                  nof_harq_bits=2)
    grid = _noisy_grid(1)
    a = pucch_mod.detect_format0(grid, cfg)
    refs = jnp.asarray(pucch_mod.f0_refs_for(cfg))
    b = pucch_mod.detect_format0(grid, cfg, ncs=refs)
    np.testing.assert_allclose(float(b["metric"]), float(a["metric"]),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(b["harq_bits"]),
                                  np.asarray(a["harq_bits"]))


def test_pucch_f1_batch_weights_match():
    common = pucch_mod.PucchF1Config(prb=5, start_symbol=0, nof_symbols=14,
                                     initial_cyclic_shift=0,
                                     time_domain_occ=0, n_id=17, slot=6)
    users = ((0, 0, 1), (3, 1, 2), (6, 2, 1))
    grid = _noisy_grid(2)
    a = pucch_mod.detect_format1_batch(grid, common, users)
    w = tuple(tuple(jnp.asarray(x) for x in hop)
              for hop in pucch_mod.f1_batch_weights(common, users))
    b = pucch_mod.detect_format1_batch(grid, common, users, ncs=w)
    for ra, rb in zip(a, b):
        np.testing.assert_allclose(float(rb["metric"]), float(ra["metric"]),
                                   rtol=1e-4)
        np.testing.assert_allclose(complex(rb["symbol"]),
                                   complex(ra["symbol"]), rtol=1e-4)


def test_pucch_f1_batch_weights_match_with_hopping():
    common = pucch_mod.PucchF1Config(prb=5, start_symbol=0, nof_symbols=12,
                                     initial_cyclic_shift=0,
                                     time_domain_occ=0, n_id=17, slot=6,
                                     second_hop_prb=17)
    users = ((0, 0, 1), (4, 1, 1))
    grid = _noisy_grid(3)
    a = pucch_mod.detect_format1_batch(grid, common, users)
    w = tuple(tuple(jnp.asarray(x) for x in hop)
              for hop in pucch_mod.f1_batch_weights(common, users))
    b = pucch_mod.detect_format1_batch(grid, common, users, ncs=w)
    for ra, rb in zip(a, b):
        np.testing.assert_allclose(float(rb["metric"]), float(ra["metric"]),
                                   rtol=1e-4)


def test_pucch_f2_pilot_values_match():
    cfg = pucch_mod.PucchF2Config(rb_start=4, nof_rb=2, start_symbol=12,
                                  nof_symbols=2, rnti=0x50, n_id=3, n_id0=9,
                                  nof_uci_bits=6, slot=11)
    grid = _noisy_grid(4)
    a = pucch_mod.process_format2(grid, cfg)
    vals = jnp.asarray(pucch_mod.f2_pilot_values_for(cfg))
    b = pucch_mod.process_format2(grid, cfg, dmrs_cinits=vals)
    np.testing.assert_allclose(float(b["metric"]), float(a["metric"]),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(b["uci_bits"]),
                                  np.asarray(a["uci_bits"]))


def test_pucch_f3_dmrs_values_match():
    cfg = pucch_mod.PucchF3Config(rb_start=2, nof_rb=2, start_symbol=0,
                                  nof_symbols=10, rnti=0x31, n_id=17,
                                  n_id_hopping=17, nof_uci_bits=12, slot=7)
    grid = _noisy_grid(5)
    a = pucch_mod.process_format3(grid, cfg)
    vals = jnp.asarray(pucch_mod.f3_dmrs_values_for(cfg))
    b = pucch_mod.process_format3(grid, cfg, ncs=vals)
    np.testing.assert_allclose(float(b["metric"]), float(a["metric"]),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(b["uci_bits"]),
                                  np.asarray(a["uci_bits"]))
