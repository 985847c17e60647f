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
