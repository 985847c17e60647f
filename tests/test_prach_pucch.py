"""PRACH detection and PUCCH F0/F1/F2 loopbacks."""

import numpy as np
import jax.numpy as jnp
import pytest

from srsran_tpu.phy.upper import prach, pucch
from srsran_tpu.ran.prach_params import root_sequence_number


def test_root_order_short():
    assert root_sequence_number(0, False) == 1
    assert root_sequence_number(1, False) == 138
    assert root_sequence_number(2, False) == 2


@pytest.mark.parametrize("fmt,preamble", [("0", 0), ("0", 17), ("B4", 5)])
def test_prach_detects_correct_preamble(fmt, preamble):
    # short formats need a ZCZ window larger than the 2us test delay
    cfg = prach.PrachConfig(format=fmt, root_sequence_index=39,
                            zero_correlation_zone=1 if fmt == "0" else 10,
                            ra_scs_hz=15000 if fmt == "B4" else 0)
    rng = np.random.default_rng(preamble)
    tx = np.asarray(prach.generate(cfg, preamble))           # [L]
    # channel: gain + small delay + noise on 2 ports
    l_ra = cfg.l_ra
    k = np.arange(l_ra)
    delay_s = 2e-6
    ramp = np.exp(-2j * np.pi * k * cfg.scs_hz * delay_s)
    rx = np.stack([0.9 * tx * ramp, 0.6 * tx * ramp])[:, None, :]  # [P,1,L]
    rx = rx + 0.05 * (rng.normal(size=rx.shape) + 1j * rng.normal(size=rx.shape))
    det = prach.detect(jnp.asarray(rx.astype(np.complex64)), cfg)
    d = np.asarray(det.detected)
    m = np.asarray(det.metrics)
    assert d[preamble], f"preamble {preamble} not detected, metric={m[preamble]}"
    others = np.delete(m, preamble)
    assert m[preamble] > 3 * others.max()
    ta = float(np.asarray(det.time_advance_s)[preamble])
    assert abs(ta - delay_s) < 1e-6, ta


def test_prach_no_false_alarm_on_noise():
    cfg = prach.PrachConfig(format="0", root_sequence_index=0,
                            zero_correlation_zone=1)
    rng = np.random.default_rng(9)
    rx = 0.1 * (rng.normal(size=(2, 1, 839)) + 1j * rng.normal(size=(2, 1, 839)))
    det = prach.detect(jnp.asarray(rx.astype(np.complex64)), cfg)
    assert not np.asarray(det.detected).any()


def _grid_with(patch_fn, ports=2, nsc=120):
    g = np.zeros((ports, 14, nsc), dtype=np.complex64)
    patch_fn(g)
    return g


@pytest.mark.parametrize("ack", [0, 1])
def test_pucch_f0_one_bit(ack):
    cfg = pucch.PucchF0Config(prb=3, start_symbol=12, nof_symbols=2,
                              initial_cyclic_shift=5, n_id=77, slot=4,
                              nof_harq_bits=1)
    rng = np.random.default_rng(ack)
    m_cs = 6 if ack else 0
    g = np.zeros((2, 14, 120), dtype=np.complex64)
    ch = np.array([0.9 * np.exp(1j), 0.5 * np.exp(-0.5j)])
    for s in range(2):
        l = cfg.start_symbol + s
        seq = pucch._f01_sequence(cfg.n_id, cfg.slot, l,
                                  cfg.initial_cyclic_shift, m_cs)
        g[:, l, 36:48] = ch[:, None] * seq[None, :]
    g += 0.03 * (rng.normal(size=g.shape) + 1j * rng.normal(size=g.shape))
    res = pucch.detect_format0(jnp.asarray(g), cfg)
    assert bool(res["detected"])
    assert int(np.asarray(res["harq_bits"])[0]) == ack


def test_pucch_f0_absent():
    cfg = pucch.PucchF0Config(prb=3, start_symbol=12, nof_symbols=2,
                              initial_cyclic_shift=5, n_id=77, slot=4)
    rng = np.random.default_rng(5)
    g = 0.05 * (rng.normal(size=(2, 14, 120)) + 1j * rng.normal(size=(2, 14, 120)))
    res = pucch.detect_format0(jnp.asarray(g.astype(np.complex64)), cfg)
    assert not bool(res["detected"])


@pytest.mark.parametrize("bits", [[0], [1], [1, 0], [0, 1]])
def test_pucch_f1(bits):
    cfg = pucch.PucchF1Config(prb=2, start_symbol=0, nof_symbols=8,
                              initial_cyclic_shift=3, time_domain_occ=1,
                              n_id=30, slot=2, nof_harq_bits=len(bits))
    rng = np.random.default_rng(sum(bits))
    if len(bits) == 1:
        d = (1.0 - 2.0 * bits[0]) / np.sqrt(2) * (1 + 1j)
    else:
        d = ((1.0 - 2.0 * bits[0]) + 1j * (1.0 - 2.0 * bits[1])) / np.sqrt(2)
    n_data = cfg.nof_symbols // 2
    n_dmrs = cfg.nof_symbols - n_data
    g = np.zeros((2, 14, 120), dtype=np.complex64)
    ch = np.array([0.8 * np.exp(0.3j), 0.6 * np.exp(-1.1j)])
    occ_d = pucch._occ(cfg.time_domain_occ, n_data)
    occ_m = pucch._occ(cfg.time_domain_occ, n_dmrs)
    di = mi = 0
    for s in range(cfg.nof_symbols):
        l = cfg.start_symbol + s
        seq = pucch._f01_sequence(cfg.n_id, cfg.slot, l, cfg.initial_cyclic_shift)
        if s % 2 == 0:
            val = seq * occ_m[mi]; mi += 1
        else:
            val = d * seq * occ_d[di]; di += 1
        g[:, l, 24:36] = ch[:, None] * val[None, :]
    g += 0.04 * (rng.normal(size=g.shape) + 1j * rng.normal(size=g.shape))
    res = pucch.detect_format1(jnp.asarray(g.astype(np.complex64)), cfg)
    assert bool(res["detected"]), float(res["metric"])
    np.testing.assert_array_equal(np.asarray(res["harq_bits"]), bits)


@pytest.mark.parametrize("k", [4, 11, 16])
def test_pucch_f2(k):
    cfg = pucch.PucchF2Config(rb_start=5, nof_rb=4, start_symbol=12,
                              nof_symbols=2, rnti=0x22, n_id=9, n_id0=17,
                              nof_uci_bits=k, slot=3)
    rng = np.random.default_rng(k)
    uci = rng.integers(0, 2, k).astype(np.int8)

    # Build the TX side inline per TS38.211 6.3.2.5 (encode -> scramble -> QPSK)
    from srsran_tpu.ops import short_block, polar as polar_ops
    from srsran_tpu.ops.modulation import modulate
    from srsran_tpu.ops.scrambling import scramble_bits
    from srsran_tpu.ops.crc import crc
    from srsran_tpu.ran import polar_params
    e_tot = 16 * cfg.nof_rb * cfg.nof_symbols  # 8 data sc/RB * 2 bits * nsym
    if k <= 11:
        enc = np.asarray(short_block.encode(jnp.asarray(uci[None]), e_tot, 2))[0]
    else:
        crc_len = 6 if k < 20 else 11
        code = polar_params.polar_code(k + crc_len, e_tot, nmax=10, ibil=True,
                                       n_pc=3 if k + crc_len <= 19 else 0)
        with_crc = np.concatenate([
            uci, np.asarray(crc(jnp.asarray(uci[None]), f"crc{crc_len}"))[0]])
        u = polar_ops.allocate(jnp.asarray(with_crc[None]), code)
        enc = np.asarray(polar_ops.rate_match(polar_ops.encode(u, code.n), code))[0]
    c_init = (cfg.rnti << 15) + cfg.n_id
    scr = np.asarray(scramble_bits(jnp.asarray(enc[None]), c_init))[0]
    syms = np.asarray(modulate(jnp.asarray(scr[None]), "qpsk"))[0]

    g = np.zeros((2, 14, 160), dtype=np.complex64)
    ch = np.array([0.9, 0.7 * np.exp(0.8j)])
    from srsran_tpu.ops.gold import gold_sequence_np
    si = 0
    for s in range(cfg.nof_symbols):
        l = cfg.start_symbol + s
        data_sc = [rb * 12 + kk for rb in range(cfg.rb_start, cfg.rb_start + cfg.nof_rb)
                   for kk in range(12) if kk % 3 != 1]
        dmrs_sc = [rb * 12 + kk for rb in range(cfg.rb_start, cfg.rb_start + cfg.nof_rb)
                   for kk in range(12) if kk % 3 == 1]
        nsym_data = len(data_sc)
        g[:, l, data_sc] = ch[:, None] * syms[None, si:si + nsym_data]
        si += nsym_data
        ci = ((1 << 17) * (14 * cfg.slot + l + 1) * (2 * cfg.n_id0 + 1)
              + 2 * cfg.n_id0) % (1 << 31)
        bits = gold_sequence_np(ci, 2 * len(dmrs_sc), advance=2 * 4 * cfg.rb_start)
        pil = np.asarray(modulate(jnp.asarray(bits[None].astype(np.int8)), "qpsk"))[0]
        g[:, l, dmrs_sc] = ch[:, None] * pil[None, :]
    g += 0.03 * (rng.normal(size=g.shape) + 1j * rng.normal(size=g.shape))

    res = pucch.process_format2(jnp.asarray(g.astype(np.complex64)), cfg)
    assert bool(res["valid"])
    np.testing.assert_array_equal(np.asarray(res["uci_bits"]), uci)


@pytest.mark.parametrize("ack,sr", [(0, 0), (1, 0), (0, 1), (1, 1)])
def test_pucch_f0_harq_plus_sr(ack, sr):
    """Combined 1-bit HARQ + SR dictionary (TS38.213 Table 9.2.5-1:
    m_cs 0/6 negative SR, 3/9 positive SR)."""
    cfg = pucch.PucchF0Config(prb=3, start_symbol=12, nof_symbols=2,
                              initial_cyclic_shift=2, n_id=31, slot=1,
                              nof_harq_bits=1, sr_opportunity=True)
    m_cs = {(0, 0): 0, (1, 0): 6, (0, 1): 3, (1, 1): 9}[(ack, sr)]
    rng = np.random.default_rng(ack * 2 + sr)
    g = np.zeros((2, 14, 120), dtype=np.complex64)
    ch = np.array([0.9 * np.exp(1j), 0.5 * np.exp(-0.5j)])
    for s in range(2):
        l = cfg.start_symbol + s
        seq = pucch._f01_sequence(cfg.n_id, cfg.slot, l,
                                  cfg.initial_cyclic_shift, m_cs)
        g[:, l, 36:48] = ch[:, None] * seq[None, :]
    g += 0.03 * (rng.normal(size=g.shape) + 1j * rng.normal(size=g.shape))
    res = pucch.detect_format0(jnp.asarray(g), cfg)
    assert bool(res["detected"])
    assert int(np.asarray(res["harq_bits"])[0]) == ack
    assert int(np.asarray(res["sr_bit"])) == sr


def test_pucch_f0_frequency_hopping():
    cfg = pucch.PucchF0Config(prb=1, start_symbol=10, nof_symbols=2,
                              initial_cyclic_shift=0, n_id=9, slot=0,
                              nof_harq_bits=1, second_hop_prb=7)
    rng = np.random.default_rng(3)
    g = np.zeros((2, 14, 120), dtype=np.complex64)
    ch = np.array([1.0, 0.7 * np.exp(0.9j)])
    for s, prb in ((0, 1), (1, 7)):
        l = cfg.start_symbol + s
        seq = pucch._f01_sequence(cfg.n_id, cfg.slot, l, 0, 6)  # ACK
        g[:, l, prb * 12:(prb + 1) * 12] = ch[:, None] * seq[None, :]
    g += 0.03 * (rng.normal(size=g.shape) + 1j * rng.normal(size=g.shape))
    res = pucch.detect_format0(jnp.asarray(g), cfg)
    assert bool(res["detected"])
    assert int(np.asarray(res["harq_bits"])[0]) == 1


@pytest.mark.parametrize("bits", [[0], [1], [1, 0]])
def test_pucch_f1_frequency_hopping(bits):
    """F1 with intra-slot hopping: independent per-hop channels and
    per-hop OCC lengths."""
    cfg = pucch.PucchF1Config(prb=2, start_symbol=0, nof_symbols=10,
                              initial_cyclic_shift=4, time_domain_occ=1,
                              n_id=12, slot=3, nof_harq_bits=len(bits),
                              second_hop_prb=6)
    rng = np.random.default_rng(sum(bits) + 7)
    if len(bits) == 1:
        d = (1.0 - 2.0 * bits[0]) / np.sqrt(2) * (1 + 1j)
    else:
        d = ((1.0 - 2.0 * bits[0]) + 1j * (1.0 - 2.0 * bits[1])) / np.sqrt(2)
    g = np.zeros((2, 14, 120), dtype=np.complex64)
    # different channel per hop (frequency diversity is the point)
    ch_hop = {0: np.array([0.8 * np.exp(0.3j), 0.6 * np.exp(-1.1j)]),
              1: np.array([0.5 * np.exp(-2.0j), 0.9 * np.exp(0.7j)])}
    for hop, (prb, s0, nsym) in enumerate(pucch._f1_hops(cfg)):
        rel = list(range(s0, s0 + nsym))
        dmrs_rel = [s for s in rel if s % 2 == 0]
        data_rel = [s for s in rel if s % 2 == 1]
        occ_m = pucch._occ(cfg.time_domain_occ, len(dmrs_rel))
        occ_d = pucch._occ(cfg.time_domain_occ, len(data_rel))
        for i, s in enumerate(dmrs_rel):
            l = cfg.start_symbol + s
            seq = pucch._f01_sequence(cfg.n_id, cfg.slot, l,
                                      cfg.initial_cyclic_shift)
            g[:, l, prb * 12:(prb + 1) * 12] = (
                ch_hop[hop][:, None] * (seq * occ_m[i])[None, :])
        for i, s in enumerate(data_rel):
            l = cfg.start_symbol + s
            seq = pucch._f01_sequence(cfg.n_id, cfg.slot, l,
                                      cfg.initial_cyclic_shift)
            g[:, l, prb * 12:(prb + 1) * 12] = (
                ch_hop[hop][:, None] * (d * seq * occ_d[i])[None, :])
    g += 0.04 * (rng.normal(size=g.shape) + 1j * rng.normal(size=g.shape))
    res = pucch.detect_format1(jnp.asarray(g.astype(np.complex64)), cfg)
    assert bool(res["detected"]), float(res["metric"])
    np.testing.assert_array_equal(np.asarray(res["harq_bits"]), bits)


def test_f1_batch_matches_per_user_detection():
    """detect_format1_batch == per-user detect_format1 (values, not just
    decisions), including frequency hopping and traced ncs."""
    import dataclasses as dc
    import jax.numpy as jnp
    from srsran_tpu.phy.upper import pucch as P
    rng = np.random.default_rng(11)
    grid = jnp.asarray((rng.normal(size=(2, 14, 600))
                        + 1j * rng.normal(size=(2, 14, 600))
                        ).astype(np.complex64) * 0.1)
    for hop in (None, 7):
        common = P.PucchF1Config(prb=3, start_symbol=0, nof_symbols=12,
                                 initial_cyclic_shift=0, time_domain_occ=0,
                                 n_id=17, slot=2, second_hop_prb=hop)
        users = ((0, 0, 1), (3, 1, 2), (6, 2, 1))
        batch = P.detect_format1_batch(grid, common, users)
        for (ics, occ, nb), br in zip(users, batch):
            cfg = dc.replace(common, initial_cyclic_shift=ics,
                             time_domain_occ=occ, nof_harq_bits=nb)
            single = P.detect_format1(grid, cfg)
            np.testing.assert_allclose(float(br["metric"]),
                                       float(single["metric"]), rtol=1e-4)
            np.testing.assert_allclose(complex(br["symbol"]),
                                       complex(single["symbol"]), rtol=1e-4)
            np.testing.assert_array_equal(np.asarray(br["harq_bits"]),
                                          np.asarray(single["harq_bits"]))
        # traced ncs path
        ncs = jnp.asarray(P.ncs_for(common.n_id, common.slot))
        batch2 = P.detect_format1_batch(grid, common, users, ncs=ncs)
        for br, b2 in zip(batch, batch2):
            np.testing.assert_allclose(float(b2["metric"]),
                                       float(br["metric"]), rtol=1e-4)


# ------------------------------------------------- restricted sets (§6.3.3.1)

def test_restricted_cyclic_shift_properties():
    """Type A C_v values: within [0, L), N_cs-spaced inside a group, and
    avoiding the Doppler image positions ±d_u of every other shift."""
    from srsran_tpu.ran.prach_params import (restricted_cyclic_shifts, n_cs,
                                             _d_u)
    l_ra = 839
    for u in (129, 140, 201, 300):
        ncs = n_cs(5, 1250, "type_a")       # zcz 5 -> N_cs 38
        shifts = restricted_cyclic_shifts(u, ncs, l_ra, "type_a")
        if not shifts:
            continue
        assert all(0 <= c < l_ra for c in shifts)
        du = _d_u(u, l_ra)
        # every pair of distinct windows [C_v, C_v+Ncs) and the Doppler
        # images C_v ± d_u must not collide with another window
        for i, ci in enumerate(shifts):
            for j, cj in enumerate(shifts):
                if i == j:
                    continue
                for img in (ci, (ci + du) % l_ra, (ci - du) % l_ra):
                    # start of image peak must not land inside window j,
                    # which covers delay bins [cj, cj + ncs)
                    assert (img - cj) % l_ra >= ncs, (u, i, j, img, cj)


def test_restricted_type_a_detection():
    """End-to-end: a type-A restricted preamble with a Doppler shift of
    exactly +1 subcarrier (the worst high-speed case the restricted set is
    designed for) is still detected at the right index."""
    cfg = prach.PrachConfig(format="0", root_sequence_index=3,
                            zero_correlation_zone=5, restricted="type_a")
    rng = np.random.default_rng(3)
    for preamble in (0, 9):
        tx = np.asarray(prach.generate(cfg, preamble))       # [L]
        k = np.arange(cfg.l_ra)
        ramp = np.exp(-2j * np.pi * k * cfg.scs_hz * 1e-6)   # 1 us delay
        rx = np.stack([0.8 * tx * ramp, 0.5 * tx * ramp])[:, None, :]
        rx = rx + 0.05 * (rng.normal(size=rx.shape)
                          + 1j * rng.normal(size=rx.shape))
        det = prach.detect(jnp.asarray(rx.astype(np.complex64)), cfg,
                           threshold=2.0)
        d = np.asarray(det.detected)
        m = np.asarray(det.metrics)
        assert d[preamble], f"preamble {preamble}: metric {m[preamble]}"
        assert m[preamble] >= np.max(np.delete(m, preamble))


def test_restricted_type_b_main_ranges():
    from srsran_tpu.ran.prach_params import restricted_cyclic_shifts, n_cs
    ncs = n_cs(2, 1250, "type_b")           # zcz 2 -> N_cs 22
    got = 0
    for u in range(1, 120):
        try:
            shifts = restricted_cyclic_shifts(u, ncs, 839, "type_b")
        except NotImplementedError:
            continue                        # ranges 3-5 documented as out
        got += len(shifts)
        assert all(0 <= c < 839 for c in shifts)
    assert got > 0


def test_fr2_prach_configuration_table():
    from srsran_tpu.ran.prach_params import prach_configuration
    cfg = prach_configuration(112, "fr2_unpaired")
    assert cfg["format"] == "B4" and cfg["x"] == 16
    assert prach_configuration(0, "fr2_unpaired") is None   # reserved
    cfg2 = prach_configuration(143, "fr2_unpaired")   # last non-reserved
    assert cfg2 is not None and cfg2["duration"] == 12
    assert prach_configuration(255, "fr2_unpaired") is None


def test_prach_strong_preamble_no_false_alarms():
    """One strong preamble must fire exactly one detection: cross-root ZC
    leakage clusters at arbitrary delays, and the CP-bounded window +
    local-reference metric (prach_detector_generic_impl.cpp:135-299) must
    reject it (regression: the gnb_sim RACH storm, 54/64 false preambles)."""
    import jax.numpy as jnp
    from srsran_tpu.phy.upper import prach as prach_mod

    for fmt, zcz, nsym in (("B4", 0, 12), ("0", 1, 1)):
        cfg = prach_mod.PrachConfig(
            format=fmt, root_sequence_index=1, zero_correlation_zone=zcz,
            ra_scs_hz=30_000 if fmt == "B4" else 0)
        rng = np.random.default_rng(5)
        for q in (0, 7, 63):
            noise = (rng.normal(size=(4, nsym, cfg.l_ra))
                     + 1j * rng.normal(size=(4, nsym, cfg.l_ra))) / np.sqrt(2)
            fd = np.asarray(prach_mod.generate(cfg, q))
            rx = (31.6 * fd[None, None, :] + noise).astype(np.complex64)
            det = prach_mod.detect(jnp.asarray(rx), cfg)
            d = np.asarray(det.detected)
            assert d[q], (fmt, zcz, q, float(det.metrics[q]))
            assert d.sum() == 1, (fmt, zcz, q, np.nonzero(d)[0])
