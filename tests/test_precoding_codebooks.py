"""Codebook construction + per-PRG precoding through the FAPI conductor.

Mirrors lib/ran/precoding/precoding_codebooks.cpp (matrix values/norms),
lib/phy/support/resource_grid_mapper_impl.cpp:30-120 (per-PRG precode-
while-mapping) and the fapi_adaptor precoding_matrix_mapper path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from srsran_tpu.ran import precoding_codebooks as pc
from srsran_tpu.ops.precoding import precode, precode_prg, layer_map
from srsran_tpu.phy.upper.pdsch import (PdschConfig, process,
                                        encode_transport_block,
                                        _data_re_plan, prg_index_of_sc)
from srsran_tpu.ops.scrambling import scramble_bits
from srsran_tpu.ops.modulation import modulate


# ------------------------------------------------------------- codebooks

def test_two_port_one_layer_values():
    # TS38.214 Table 5.2.2.2.1-1 / make_one_layer_two_ports
    s = 1 / np.sqrt(2)
    expect = {0: [s, s], 1: [s, 1j * s], 2: [s, -s], 3: [s, -1j * s]}
    for i, col in expect.items():
        np.testing.assert_allclose(
            pc.make_one_layer_two_ports(i)[:, 0], col, atol=1e-6)


def test_two_port_two_layer_values():
    m0 = pc.make_two_layer_two_ports(0)
    np.testing.assert_allclose(
        m0, np.array([[0.5, 0.5], [0.5, -0.5]]), atol=1e-6)
    m1 = pc.make_two_layer_two_ports(1)
    np.testing.assert_allclose(
        m1, np.array([[0.5, 0.5], [0.5j, -0.5j]]), atol=1e-6)


@pytest.mark.parametrize("ri", [1, 2, 3, 4])
def test_four_port_codebook_power_and_orthogonality(ri):
    """Every Type-I SP matrix has unit total power and orthogonal layers
    (the reference normalizes by sqrt(nof_ports * nof_layers))."""
    seen = set()
    for i11 in range(8):
        for extra in range(4 if ri == 1 else (4 if ri == 2 else 2)):
            if ri == 1:
                m = pc.make_one_layer_four_ports_type1_sp_mode1(i11, extra)
            elif ri == 2:
                m = pc.make_two_layer_four_ports_type1_sp_mode1(
                    i11, extra // 2, extra % 2)
            elif ri == 3:
                if extra >= 2:
                    continue
                m = pc.make_three_layer_four_ports_type1_sp(i11, extra)
            else:
                if extra >= 2:
                    continue
                m = pc.make_four_layer_four_ports_type1_sp(i11, extra)
            assert m.shape == (4, ri)
            # total transmit power normalized to 1
            np.testing.assert_allclose(np.linalg.norm(m) ** 2, 1.0,
                                       rtol=1e-5)
            # layers orthogonal
            g = m.conj().T @ m
            np.testing.assert_allclose(g, np.diag(np.diag(g)), atol=1e-6)
            seen.add(m.tobytes())
    # distinct parameter combos give distinct matrices
    assert len(seen) >= 8


def test_repository_and_pmi_index():
    repo4 = pc.repository(4)
    assert len(repo4) == 2 + 32 + 32 + 16 + 16
    # pmi_to_index round-trips onto the repository layout
    m = pc.get_matrix(4, pc.pmi_to_index(4, ri=2, i_1_1=3, i_1_3=1, i_2=1))
    np.testing.assert_allclose(
        m, pc.make_two_layer_four_ports_type1_sp_mode1(3, 1, 1), atol=1e-7)
    m2 = pc.get_matrix(2, pc.pmi_to_index(2, ri=1, i_2=2))
    np.testing.assert_allclose(m2, pc.make_one_layer_two_ports(2), atol=1e-7)


def test_resolve_matrices_rejects_mixed_layers():
    cfg = pc.PrecodingConfig(prg_size=2, pm_indices=(2, 34))  # 1L + 2L
    with pytest.raises(ValueError):
        pc.resolve_matrices(4, cfg)


# ------------------------------------------------------- per-PRG precode op

def test_precode_prg_matches_per_prg_loop():
    rng = np.random.default_rng(0)
    L, P, G, S = 2, 4, 3, 48
    layers = (rng.standard_normal((L, S)) + 1j * rng.standard_normal((L, S))
              ).astype(np.complex64)
    mats = (rng.standard_normal((G, P, L)) + 1j * rng.standard_normal((G, P, L))
            ).astype(np.complex64)
    prg = rng.integers(0, G, S).astype(np.int32)
    got = np.asarray(precode_prg(jnp.asarray(layers), jnp.asarray(mats),
                                 jnp.asarray(prg)))
    want = np.zeros((P, S), np.complex64)
    for s in range(S):
        want[:, s] = mats[prg[s]] @ layers[:, s]
    np.testing.assert_allclose(got, want, atol=1e-5)


# ------------------------------------------------- PDSCH per-PRG splice test

def _cfg(precoding=None, nof_layers=2):
    return PdschConfig(
        rnti=0x4601, rb_start=2, rb_count=10, first_symbol=1, nof_symbols=12,
        modulation="qam16", target_code_rate=0.5, tbs=1032,
        nof_layers=nof_layers, dmrs_symbols=(2, 7), n_id=7,
        dmrs_scrambling_id=7, precoding=precoding)


def test_pdsch_per_prg_equals_wideband_splice():
    """grid(per-PRG [W_a, W_b]) must equal, RE by RE, grid(wideband W_a)
    on PRG-a REs and grid(wideband W_b) on PRG-b REs — data AND DM-RS."""
    nof_sc, nof_ports = 24 * 12, 4
    rng = np.random.default_rng(1)
    # rb_start=2, rb_count=10, prg_size=6 -> PRGs cover PRBs [0,6) and
    # [6,12): 2 PRGs (CRB0-aligned)
    ia = pc.pmi_to_index(4, ri=2, i_1_1=1, i_1_3=0, i_2=0)
    ib = pc.pmi_to_index(4, ri=2, i_1_1=5, i_1_3=1, i_2=1)
    pre = pc.PrecodingConfig(prg_size=6, pm_indices=(ia, ib))
    bits = jnp.asarray(rng.integers(0, 2, 1032).astype(np.int8))
    zero = jnp.zeros((nof_ports, 14, nof_sc), jnp.complex64)
    got = np.asarray(process(zero, bits, _cfg(pre)))
    wa = np.asarray(process(zero, bits, _cfg(None),
                            precoding=pc.get_matrix(4, ia)))
    wb = np.asarray(process(zero, bits, _cfg(None),
                            precoding=pc.get_matrix(4, ib)))
    prg_of_prb = np.arange(nof_sc) // 12 // 6 - 0    # CRB0-aligned, prg0=0
    want = np.where((prg_of_prb == 0)[None, None, :], wa, wb)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pdsch_per_prg_ue_recovery():
    """UE-side receive over a known channel recovers the layer symbols of
    BOTH PRGs (the VERDICT done criterion): y = H @ grid, per-PRG
    x_hat = pinv(H @ W_g) @ y  ==  modulated layer symbols."""
    nof_sc, nof_ports = 24 * 12, 4
    rng = np.random.default_rng(2)
    ia = pc.pmi_to_index(4, ri=2, i_1_1=0, i_1_3=1, i_2=0)
    ib = pc.pmi_to_index(4, ri=2, i_1_1=6, i_1_3=0, i_2=1)
    pre = pc.PrecodingConfig(prg_size=6, pm_indices=(ia, ib))
    cfg = _cfg(pre)
    bits = jnp.asarray(rng.integers(0, 2, cfg.tbs).astype(np.int8))
    zero = jnp.zeros((nof_ports, 14, nof_sc), jnp.complex64)
    grid = np.asarray(process(zero, bits, cfg))
    # known 4x4 channel, well conditioned
    h = (np.eye(4) + 0.3 * (rng.standard_normal((4, 4))
                            + 1j * rng.standard_normal((4, 4)))
         ).astype(np.complex64)
    y = np.einsum("rp,psk->rsk", h, grid)
    # expected layer symbols (same chain minus precoding)
    cw, _ = encode_transport_block(bits, cfg)
    scr = scramble_bits(np.asarray(cw)[None], (cfg.rnti << 15) + cfg.n_id)
    syms = np.asarray(modulate(scr, cfg.modulation))[0]
    layers = np.asarray(layer_map(jnp.asarray(syms), cfg.nof_layers))
    plan = _data_re_plan(cfg.rb_start, cfg.rb_count, cfg.first_symbol,
                         cfg.nof_symbols, cfg.dmrs_symbols,
                         cfg.reserved_cdm_groups, None)
    prg = prg_index_of_sc(plan[:, 1], cfg.rb_start, 6)
    mats = pc.resolve_matrices(4, pre)
    rx = y[:, plan[:, 0], plan[:, 1]]            # [R, nof_data_re]
    for g in range(2):
        sel = prg == g
        heff = h @ mats[g]                        # [R, L]
        xhat = np.linalg.pinv(heff) @ rx[:, sel]
        np.testing.assert_allclose(xhat, layers[:, sel], atol=1e-4)


def test_conductor_roundtrip_with_precoding():
    """process_dl with a precoded PDSCH PDU: phase cache reuses ONE
    compiled program across different PMI patterns (same PRG structure)."""
    from srsran_tpu.fapi.conductor import SlotConductor, _packed_dl_fn
    from srsran_tpu.fapi.messages import DlTtiRequest, TxDataRequest
    from srsran_tpu.phy.slot_programs import CellConfig
    from srsran_tpu.ran.slot_point import SlotPoint

    cell = CellConfig(nof_rb=24, numerology=1, nof_ports=4, dft_size=512)
    cond = SlotConductor(cell)
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, 1032).astype(np.int8)

    def run(i11):
        ia = pc.pmi_to_index(4, ri=2, i_1_1=i11, i_1_3=0, i_2=0)
        ib = pc.pmi_to_index(4, ri=2, i_1_1=(i11 + 3) % 8, i_1_3=1, i_2=1)
        pre = pc.PrecodingConfig(prg_size=6, pm_indices=(ia, ib))
        slot = SlotPoint(numerology=1, count=2)
        dl = DlTtiRequest(slot=slot, pdsch=(_cfg(pre),))
        tx = TxDataRequest(slot=slot, pdsch_payloads=(bits,))
        _, grid = cond.process_dl(dl, tx)
        return np.asarray(grid), pre

    misses0 = _packed_dl_fn.cache_info().misses
    ga, pa = run(1)
    misses1 = _packed_dl_fn.cache_info().misses
    gb, pb = run(4)
    misses2 = _packed_dl_fn.cache_info().misses
    # one compile for the structure; the PMI change reuses it
    assert misses2 == misses1, "PMI change must not recompile"
    assert pa != pb and not np.allclose(ga, gb)
    # the conductor grid matches the direct processor output
    zero = jnp.zeros((4, 14, 24 * 12), jnp.complex64)
    direct = np.asarray(process(zero, jnp.asarray(bits), _cfg(pa)))
    np.testing.assert_allclose(ga, direct, atol=1e-5)


def test_validator_rejects_bad_precoding():
    from srsran_tpu.fapi.conductor import SlotConductor
    from srsran_tpu.fapi.messages import DlTtiRequest, TxDataRequest
    from srsran_tpu.fapi.validators import ValidationError
    from srsran_tpu.phy.slot_programs import CellConfig
    from srsran_tpu.ran.slot_point import SlotPoint

    cell = CellConfig(nof_rb=24, numerology=1, nof_ports=4, dft_size=512)
    cond = SlotConductor(cell)
    slot = SlotPoint(numerology=1, count=2)
    bits = np.zeros(1032, np.int8)
    # wrong PRG count (allocation spans 2 PRGs at prg_size=6)
    bad = pc.PrecodingConfig(prg_size=6, pm_indices=(2,))
    with pytest.raises(ValidationError):
        cond.process_dl(DlTtiRequest(slot=slot, pdsch=(_cfg(bad),)),
                        TxDataRequest(slot=slot, pdsch_payloads=(bits,)))
    # layer mismatch: 1-layer matrix on a 2-layer PDU
    bad2 = pc.PrecodingConfig(prg_size=6, pm_indices=(2, 2))
    with pytest.raises(ValidationError):
        cond.process_dl(DlTtiRequest(slot=slot, pdsch=(_cfg(bad2),)),
                        TxDataRequest(slot=slot, pdsch_payloads=(bits,)))
