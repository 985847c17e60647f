"""Sequence-parallel (time-sharded) OFDM demodulation over a virtual mesh.

The sample timeline of ONE cell is split across mesh devices; CP-straddling
FFT windows read the predecessor shard's tail via the ppermute halo
exchange (BASELINE's CP-straddling requirement) — the production consumer
of parallel.multihost.halo_exchange_time_axis."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from srsran_tpu.ops import ofdm
from srsran_tpu.phy.slot_programs import CellConfig
from srsran_tpu.parallel.seqpar import demodulate_slot_timesharded
from jax.sharding import Mesh


def _mesh_1d(n, name="cell"):
    devs = np.array(jax.devices()[:n]).reshape(n)
    return Mesh(devs, (name,))


@pytest.mark.parametrize("n_shards,window_offset", [(2, 0), (4, 0), (4, 8)])
def test_timesharded_demod_matches_reference(n_shards, window_offset):
    if len(jax.devices()) < n_shards:
        pytest.skip("needs virtual devices")
    cell = CellConfig(nof_ports=2, nof_rb=24, dft_size=512, numerology=1,
                      center_freq_hz=3.5e9)
    rng = np.random.default_rng(0)
    total = cell.slot_samples()
    x = (rng.normal(size=(2, total))
         + 1j * rng.normal(size=(2, total))).astype(np.complex64)
    ref = np.asarray(ofdm.demodulate_slot(
        jnp.asarray(x), cell.nof_sc, cell.dft_size, cell.numerology,
        center_freq_hz=cell.center_freq_hz, window_offset=window_offset))
    mesh = _mesh_1d(n_shards)
    got = np.asarray(demodulate_slot_timesharded(
        jnp.asarray(x), cell, mesh, axis="cell",
        window_offset=window_offset))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_timesharded_demod_roundtrip_tx():
    """A modulated grid survives the sharded demodulator end to end."""
    if len(jax.devices()) < 4:
        pytest.skip("needs virtual devices")
    cell = CellConfig(nof_ports=1, nof_rb=24, dft_size=512, numerology=1,
                      center_freq_hz=0.0)
    rng = np.random.default_rng(1)
    grid = (rng.normal(size=(1, 14, cell.nof_sc))
            + 1j * rng.normal(size=(1, 14, cell.nof_sc))
            ).astype(np.complex64)
    tx = ofdm.modulate_slot(jnp.asarray(grid), cell.dft_size,
                            cell.numerology)
    mesh = _mesh_1d(4)
    got = np.asarray(demodulate_slot_timesharded(tx, cell, mesh))
    np.testing.assert_allclose(got, grid, atol=2e-5)


def test_single_cell_ul_time_sharded_production_path():
    """The fused production program: time-sharded OFDM demod (halo
    ppermute) + full UL receive chain, one compiled fn, CRC-verified."""
    if len(jax.devices()) < 4:
        pytest.skip("needs virtual devices")
    from srsran_tpu.phy.upper.pdsch import PdschConfig
    from srsran_tpu.phy.upper.pusch import PuschConfig
    from srsran_tpu.phy.slot_programs import dl_slot_fn
    from srsran_tpu.parallel.mesh import single_cell_ul_time_sharded_fn
    from srsran_tpu.ran.ldpc_params import segment_tb, select_base_graph
    from jax.sharding import NamedSharding, PartitionSpec as P

    cell = CellConfig(nof_ports=1, nof_rb=24, dft_size=512, numerology=1,
                      center_freq_hz=0.0)
    pusch = PuschConfig(rnti=0x11, rb_start=0, rb_count=24, first_symbol=0,
                        nof_symbols=14, modulation="qam16",
                        target_code_rate=0.5, tbs=8448, nof_layers=1,
                        n_id=0, dmrs_symbols=(2, 7, 11))
    ue_cfg = PdschConfig(rnti=pusch.rnti, rb_start=0, rb_count=24,
                         first_symbol=0, nof_symbols=14, modulation="qam16",
                         target_code_rate=0.5, tbs=pusch.tbs, nof_layers=1,
                         n_id=0, dmrs_symbols=(2, 7, 11))
    rng = np.random.default_rng(3)
    payload = jnp.asarray(rng.integers(0, 2, pusch.tbs).astype(np.int8))
    tx, _ = dl_slot_fn(cell, ((), (), (ue_cfg,), ()))((), (), (payload,))
    mesh = _mesh_1d(4)
    fn = single_cell_ul_time_sharded_fn(cell, ((pusch,), (), (), (), ()),
                                        mesh)
    seg = segment_tb(pusch.tbs, select_base_graph(pusch.tbs, 0.5))
    softs = (jnp.zeros((seg.nof_codeblocks, seg.codeword_bits), jnp.float32),)
    rx = jax.device_put(np.asarray(tx), NamedSharding(mesh, P(None, "cell")))
    out = fn(rx, (), softs)
    assert bool(np.asarray(out["pusch"][0]["tb_crc_ok"]))
    got = (np.asarray(out["pusch"][0]["tb_bits"]) > 0).astype(np.int8)
    np.testing.assert_array_equal(got, np.asarray(payload))
