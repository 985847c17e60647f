"""Reference-parity coverage: exercise this framework over the exact
parameter grids the reference's vectortests declare (SURVEY.md §4.1).

The golden .dat archives are not shipped in the reference mount, so these
tests check (a) every declared configuration parses and is accepted by our
validators / config model, and (b) derived quantities the headers embed —
notably each PUSCH case's LDPC base graph, which depends on our TS38.214
TBS determination AND the TS38.212 base-graph selection being right.
"""

import numpy as np
import pytest

from srsran_tpu.parity import testdata

pytestmark = pytest.mark.skipif(not testdata.reference_available(),
                                reason="reference mount not present")


def test_ldpc_encoder_grid_covers_all_lifting_sizes():
    from srsran_tpu.ran.ldpc_params import LIFTING_SIZES
    cases = testdata.ldpc_encoder_cases()
    assert len(cases) == 102  # 2 BGs x 51 lifting sizes
    got = {(c["bg"], c["ls"]) for c in cases}
    assert got == {(bg, ls) for bg in (1, 2) for ls in LIFTING_SIZES}


def test_ldpc_encoder_parity_on_reference_grid():
    """Encode/parity-check H·c=0 on a spread of the reference's (bg, ls)
    grid (every case is a distinct trace; a stride keeps compile count sane
    while still spanning all 8 lifting-size sets)."""
    import jax.numpy as jnp
    from srsran_tpu.ops import ldpc_encode, ldpc_graph

    cases = testdata.ldpc_encoder_cases()[::13]
    rng = np.random.default_rng(7)
    for c in cases:
        bg, z = c["bg"], c["ls"]
        k = (22 if bg == 1 else 10) * z
        msgs = rng.integers(0, 2, (3, k)).astype(np.int8)
        code = np.asarray(ldpc_encode.encode(jnp.asarray(msgs), bg, z)
                          ).astype(np.uint8)
        graph = ldpc_graph.get_graph(bg, z)
        for cw in code:
            assert not ldpc_graph.parity_check_np(graph, cw).any(), (bg, z)


def test_pusch_processor_base_graph_parity():
    """Our TBS determination (TS38.214 §5.1.3.2) + base-graph selection
    (TS38.212 §6.2.2) must reproduce the base graph the reference's
    generated vectors declare for every pusch_processor case."""
    from srsran_tpu.ran.ldpc_params import select_base_graph
    from srsran_tpu.ran.mcs_tbs import tbs as tbs_calc

    cases = testdata.pusch_processor_cases()
    assert len(cases) >= 20
    mismatches = []
    for i, c in enumerate(cases):
        nof_dmrs_re_per_prb = 12 * len(c["dmrs_symbols"])
        t = tbs_calc(c["rb_count"], c["nof_symbols"], nof_dmrs_re_per_prb,
                     c["modulation"], c["target_code_rate"], c["nof_layers"])
        bg = select_base_graph(t, c["target_code_rate"])
        if bg != c["bg"]:
            mismatches.append((i, t, c["target_code_rate"], bg, c["bg"]))
    assert not mismatches, mismatches


def test_pusch_processor_cases_validate():
    from srsran_tpu.fapi.messages import UlTtiRequest
    from srsran_tpu.fapi.validators import validate_ul_tti
    from srsran_tpu.phy.slot_programs import CellConfig
    from srsran_tpu.phy.upper.pusch import PuschConfig
    from srsran_tpu.ran.mcs_tbs import tbs as tbs_calc
    from srsran_tpu.ran.slot_point import SlotPoint

    for c in testdata.pusch_processor_cases():
        cell = CellConfig(nof_ports=len(c["rx_ports"]),
                          nof_rb=c["rg_nof_rb"], dft_size=4096,
                          numerology=c["numerology"])
        t = tbs_calc(c["rb_count"], c["nof_symbols"],
                     12 * len(c["dmrs_symbols"]), c["modulation"],
                     c["target_code_rate"], c["nof_layers"])
        pu = PuschConfig(
            rnti=c["rnti"], rb_start=c["bwp_start_rb"] + c["rb_start"],
            rb_count=c["rb_count"], first_symbol=c["start_symbol"],
            nof_symbols=c["nof_symbols"], modulation=c["modulation"],
            target_code_rate=c["target_code_rate"], tbs=t,
            nof_layers=c["nof_layers"], rv=c["rv"], n_id=c["n_id"],
            dmrs_symbols=c["dmrs_symbols"],
            dmrs_scrambling_id=c["dmrs"].get("scrambling_id", 0),
            n_scid=c["dmrs"].get("n_scid", 0),
            numerology=c["numerology"], slot_in_frame=c["slot"],
            transform_precoding=c["transform_precoding"])
        ul = UlTtiRequest(slot=SlotPoint(c["numerology"], c["slot"]),
                          pusch=(pu,))
        validate_ul_tti(ul, cell)  # raises on failure


def test_pdsch_processor_cases_validate():
    from srsran_tpu.fapi.messages import DlTtiRequest
    from srsran_tpu.fapi.validators import validate_dl_tti
    from srsran_tpu.phy.slot_programs import CellConfig
    from srsran_tpu.phy.upper.pdsch import PdschConfig
    from srsran_tpu.ran.slot_point import SlotPoint

    cases = testdata.pdsch_processor_cases()
    assert len(cases) >= 20
    for c in cases:
        nof_layers = c["nof_layers"] or 1
        cell = CellConfig(nof_ports=max(nof_layers, 1),
                          nof_rb=c["rg_nof_rb"], dft_size=4096,
                          numerology=c["numerology"])
        pd = PdschConfig(
            rnti=c["rnti"], rb_start=c["bwp_start_rb"] + c["rb_start"],
            rb_count=c["rb_count"], first_symbol=c["start_symbol"],
            nof_symbols=c["nof_symbols"], modulation=c["modulation"],
            target_code_rate=0.5, tbs=0, nof_layers=nof_layers,
            rv=c["rv"], n_id=c["n_id"], dmrs_symbols=c["dmrs_symbols"],
            dmrs_scrambling_id=c["scrambling_id"], n_scid=c["n_scid"],
            numerology=c["numerology"], slot_in_frame=c["slot"])
        dl = DlTtiRequest(slot=SlotPoint(c["numerology"], c["slot"]),
                          pdsch=(pd,))
        validate_dl_tti(dl, cell)
        # reference PDSCH DM-RS is always type 1 in these vectors; ours
        # supports both types
        assert c["dmrs_type"] in (1, 2)


def test_modulation_mapper_grid_roundtrip():
    """Hard-decision roundtrip across the reference's modulation grid."""
    import jax.numpy as jnp
    from srsran_tpu.ops.modulation import (BITS_PER_SYMBOL, demodulate,
                                           modulate)

    seen = set()
    rng = np.random.default_rng(3)
    for c in testdata.modulation_mapper_cases():
        scheme = c["modulation"]
        if scheme in seen:
            continue
        seen.add(scheme)
        qm = BITS_PER_SYMBOL[scheme]
        n = 96 * qm
        bits = rng.integers(0, 2, (1, n)).astype(np.int8)
        syms = modulate(jnp.asarray(bits), scheme)
        llr = demodulate(syms, jnp.full(syms.shape, 0.05), scheme)
        hard = (np.asarray(llr) < 0).astype(np.int8)
        np.testing.assert_array_equal(hard, bits)
    assert {"bpsk", "qpsk", "qam16", "qam64", "qam256"} <= seen


def test_ldpc_rate_matcher_grid_parses():
    cases = testdata.ldpc_rate_matcher_cases()
    assert len(cases) >= 10
    for c in cases:
        assert c["rv"] in (0, 1, 2, 3)
        assert c["modulation"] in ("bpsk", "qpsk", "qam16", "qam64", "qam256")
