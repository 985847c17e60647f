"""cbf16 resource grid: PackedGrid semantics + slot-program equivalence.

The reference stores grids as complex-bf16 (resource_grid_impl.h:40-64) to
halve grid memory bandwidth.  Here the same storage rides through the jit
slot programs via PackedGrid (bf16 real/imag planes, gathers/scatters
convert only the touched patch).  These tests pin:

- PackedGrid gather/scatter semantics match a dense complex64 grid;
- the DL slot program with grid_cbf16=True produces samples within bf16
  quantization of the complex64 program;
- a PUSCH loopback still CRC-decodes through a cbf16 receive grid.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from srsran_tpu.phy.support.resource_grid import (PackedGrid, pack_grid,
                                                  as_complex)
from srsran_tpu.phy.slot_programs import (CellConfig, dl_slot_fn, ul_slot_fn)
from srsran_tpu.phy.upper.ssb import SsbConfig
from srsran_tpu.phy.upper.pdsch import PdschConfig
from srsran_tpu.phy.upper.pdcch import PdcchConfig, CoresetConfig
from srsran_tpu.phy.upper.pusch import PuschConfig
from srsran_tpu.phy.upper.pucch import PucchF1Config


CELL = CellConfig(nof_ports=2, nof_rb=24, dft_size=512, numerology=1)
CELL_BF = dataclasses.replace(CELL, grid_cbf16=True)


def test_packed_grid_semantics():
    rng = np.random.default_rng(0)
    dense = (rng.normal(size=(2, 14, 48))
             + 1j * rng.normal(size=(2, 14, 48))).astype(np.complex64)
    pg = pack_grid(jnp.asarray(dense))
    assert pg.shape == (2, 14, 48)
    assert pg.ndim == 3
    # basic slicing, ellipsis, integer and advanced indexing
    np.testing.assert_allclose(np.asarray(pg[0, 3, 5:9]),
                               dense[0, 3, 5:9], rtol=8e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(pg[..., 10:20]),
                               dense[..., 10:20], rtol=8e-3, atol=1e-3)
    sym = jnp.asarray([2, 7, 11])
    sc = jnp.asarray([1, 5, 40])
    np.testing.assert_allclose(np.asarray(pg[:, sym, sc]),
                               dense[:, np.array([2, 7, 11]),
                                     np.array([1, 5, 40])],
                               rtol=8e-3, atol=1e-3)
    # scatter-add matches dense
    patch = (rng.normal(size=(2, 4, 12))
             + 1j * rng.normal(size=(2, 4, 12))).astype(np.complex64)
    pg2 = pg.at[:, 0:4, 0:12].add(jnp.asarray(patch))
    want = dense.copy()
    want[:, 0:4, 0:12] += patch
    np.testing.assert_allclose(np.asarray(as_complex(pg2)), want,
                               rtol=2e-2, atol=2e-2)
    # zeros + set
    z = PackedGrid.zeros((1, 14, 48))
    z = z.at[0, 1, 3:6].set(jnp.asarray([1 + 1j, 2 - 2j, 3 + 0j],
                                        jnp.complex64))
    out = np.asarray(as_complex(z))
    np.testing.assert_allclose(out[0, 1, 3:6], [1 + 1j, 2 - 2j, 3 + 0j],
                               rtol=8e-3)
    assert np.all(out[0, 0] == 0)


def _dl_plan():
    ssb = SsbConfig(phys_cell_id=1, ssb_idx=0, l_max=8, sfn=0,
                    first_symbol=2, first_subcarrier=12)
    pdcch = PdcchConfig(
        coreset=CoresetConfig(rb_start=0, nof_rb=24, start_symbol=0,
                              duration=1),
        rnti=0x4601, aggregation_level=2, cce_index=0, payload_bits=40,
        n_id=1, n_id_data=1)
    pdsch = PdschConfig(rnti=0x4601, rb_start=0, rb_count=24, first_symbol=1,
                        nof_symbols=12, modulation="qam16",
                        target_code_rate=0.5, tbs=8192, nof_layers=2,
                        n_id=1, dmrs_symbols=(2, 11))
    return ((ssb,), (pdcch,), (pdsch,), ())


def test_dl_slot_cbf16_matches_complex64():
    plan = _dl_plan()
    rng = np.random.default_rng(1)
    mib = jnp.asarray(rng.integers(0, 2, 24).astype(np.int8))
    dci = jnp.asarray(rng.integers(0, 2, 40).astype(np.int8))
    sch = jnp.asarray(rng.integers(0, 2, 8192).astype(np.int8))
    s_ref, g_ref = dl_slot_fn(CELL, plan)((mib,), (dci,), (sch,))
    s_bf, g_bf = dl_slot_fn(CELL_BF, plan)((mib,), (dci,), (sch,))
    assert isinstance(g_bf, PackedGrid)
    ref = np.asarray(s_ref)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(s_bf), ref,
                               atol=2e-2 * scale, rtol=0)
    np.testing.assert_allclose(np.asarray(as_complex(g_bf)),
                               np.asarray(g_ref), atol=2e-2, rtol=0)


def test_ul_loopback_crc_through_cbf16_grid():
    pusch = PuschConfig(rnti=0x17, rb_start=0, rb_count=24, first_symbol=0,
                        nof_symbols=14, modulation="qpsk",
                        target_code_rate=0.5, tbs=4096, nof_layers=1,
                        n_id=1, dmrs_symbols=(2, 7, 11))
    pucch = PucchF1Config(prb=0, start_symbol=0, nof_symbols=14,
                          initial_cyclic_shift=0, time_domain_occ=0, n_id=1)
    ue_cfg = PdschConfig(rnti=pusch.rnti, rb_start=0, rb_count=24,
                         first_symbol=0, nof_symbols=14, modulation="qpsk",
                         target_code_rate=0.5, tbs=4096, nof_layers=1,
                         n_id=1, dmrs_symbols=(2, 7, 11))
    rng = np.random.default_rng(2)
    payload = jnp.asarray(rng.integers(0, 2, 4096).astype(np.int8))
    samples, _ = dl_slot_fn(CELL, ((), (), (ue_cfg,), ()))((), (), (payload,))

    plan = ((pusch,), (), (pucch,), (), ())
    out_ref = ul_slot_fn(CELL, plan)(samples, (), None)
    out_bf = ul_slot_fn(CELL_BF, plan)(samples, (), None)
    assert bool(out_ref["pusch"][0]["tb_crc_ok"])
    assert bool(out_bf["pusch"][0]["tb_crc_ok"])
    np.testing.assert_array_equal(np.asarray(out_bf["pusch"][0]["tb_bits"]),
                                  np.asarray(payload))
    # channel metrics survive quantization (SNR reported in linear units)
    snr_ref = float(np.mean(np.asarray(out_ref["pusch"][0]["snr"])))
    snr_bf = float(np.mean(np.asarray(out_bf["pusch"][0]["snr"])))
    assert snr_bf > 100.0, (snr_ref, snr_bf)  # > 20 dB post-bf16
