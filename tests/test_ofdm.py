"""OFDM modulator/demodulator: exact roundtrips, CP layout, phase compensation."""

import numpy as np
import jax.numpy as jnp
import pytest

from srsran_tpu.ops import ofdm
from srsran_tpu.ran.cyclic_prefix import CyclicPrefix, cp_lengths, slot_num_samples


def test_cp_lengths_mu0():
    lens = cp_lengths(CyclicPrefix.NORMAL, 0, 2048)
    assert lens[0] == 160 and lens[7] == 160
    assert all(l == 144 for i, l in enumerate(lens) if i not in (0, 7))
    assert slot_num_samples(CyclicPrefix.NORMAL, 0, 2048) == 30720


def test_cp_lengths_mu1():
    # mu=1: long CP on subframe symbols 0 and 14 == first symbol of each slot.
    lens0 = cp_lengths(CyclicPrefix.NORMAL, 1, 2048, 0)
    lens1 = cp_lengths(CyclicPrefix.NORMAL, 1, 2048, 1)
    assert lens0[0] == 144 + 32 and lens1[0] == 144 + 32
    assert slot_num_samples(CyclicPrefix.NORMAL, 1, 2048, 0) \
        + slot_num_samples(CyclicPrefix.NORMAL, 1, 2048, 1) == 61440


@pytest.mark.parametrize("window_offset", [0, 8])
@pytest.mark.parametrize("fc", [0.0, 3.5e9])
def test_roundtrip(window_offset, fc):
    rng = np.random.default_rng(3)
    nof_sc, dft, mu = 600, 1024, 1   # 50 RB @ 30 kHz
    grid = (rng.normal(size=(2, 14, nof_sc)) + 1j * rng.normal(size=(2, 14, nof_sc)))
    grid = grid.astype(np.complex64)
    tx = ofdm.modulate_slot(jnp.asarray(grid), dft, mu, center_freq_hz=fc)
    assert tx.shape == (2, slot_num_samples(CyclicPrefix.NORMAL, mu, dft))
    rx = ofdm.demodulate_slot(tx, nof_sc, dft, mu, center_freq_hz=fc,
                              window_offset=window_offset)
    np.testing.assert_allclose(np.asarray(rx), grid, atol=2e-3)


def test_roundtrip_extended_cp():
    rng = np.random.default_rng(4)
    nof_sc, dft, mu = 276, 512, 2
    grid = (rng.normal(size=(1, 12, nof_sc)) + 1j * rng.normal(size=(1, 12, nof_sc)))
    grid = grid.astype(np.complex64)
    tx = ofdm.modulate_slot(jnp.asarray(grid), dft, mu, cp=CyclicPrefix.EXTENDED)
    rx = ofdm.demodulate_slot(tx, nof_sc, dft, mu, cp=CyclicPrefix.EXTENDED)
    np.testing.assert_allclose(np.asarray(rx), grid, atol=2e-3)


def test_cp_is_cyclic():
    """The first cp_len samples of each symbol must equal its tail."""
    rng = np.random.default_rng(5)
    nof_sc, dft, mu = 120, 256, 0
    grid = (rng.normal(size=(14, nof_sc)) + 1j * rng.normal(size=(14, nof_sc))).astype(np.complex64)
    tx = np.asarray(ofdm.modulate_slot(jnp.asarray(grid), dft, mu))
    lens = cp_lengths(CyclicPrefix.NORMAL, mu, dft)
    pos = 0
    for l in range(14):
        cp_part = tx[pos: pos + lens[l]]
        data = tx[pos + lens[l]: pos + lens[l] + dft]
        np.testing.assert_allclose(cp_part, data[dft - lens[l]:], atol=1e-6)
        pos += lens[l] + dft


def test_frequency_placement():
    """A single active subcarrier lands on the right FFT bin."""
    nof_sc, dft = 24, 64
    grid = np.zeros((14, nof_sc), dtype=np.complex64)
    grid[0, nof_sc // 2] = 1.0   # first positive subcarrier == DC bin
    tx = np.asarray(ofdm.modulate_slot(jnp.asarray(grid), dft, 0))
    lens = cp_lengths(CyclicPrefix.NORMAL, 0, dft)
    sym0 = tx[lens[0]: lens[0] + dft]
    bins = np.fft.fft(sym0) / np.sqrt(dft)
    assert np.argmax(np.abs(bins)) == 0
    grid[0, nof_sc // 2] = 0
    grid[0, 0] = 1.0             # most negative subcarrier -> bin N - K/2
    tx = np.asarray(ofdm.modulate_slot(jnp.asarray(grid), dft, 0))
    sym0 = tx[lens[0]: lens[0] + dft]
    bins = np.fft.fft(sym0) / np.sqrt(dft)
    assert np.argmax(np.abs(bins)) == dft - nof_sc // 2
