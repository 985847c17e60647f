"""Golden-value parity: JAX ops vs independent spec-direct numpy models.

The reference validates every PHY block against MATLAB-generated vectors
(SURVEY §4.1); those .dat archives are absent from the mount, so the
goldens are regenerated here by srsran_tpu.parity.numpy_model — bit-serial
LFSRs, long-division CRCs, per-sample DFT sums, kron-product polar
matrices, H·c=0 parity-equation checks.  The ops implementations share no
index-plan or matmul code with the models."""

import numpy as np
import pytest
import jax.numpy as jnp

from srsran_tpu.parity import numpy_model as M


def test_gold_sequence_values():
    from srsran_tpu.ops.gold import gold_sequence, gold_sequence_np
    rng = np.random.default_rng(0)
    for c_init, length, adv in [(1, 100, 0), (0x12345678 % (1 << 31), 257, 0),
                                (12345, 64, 1009), (1, 31, 2 * 864)]:
        want = M.gold(c_init, length, adv)
        np.testing.assert_array_equal(gold_sequence_np(c_init, length, adv),
                                      want)
        np.testing.assert_array_equal(
            np.asarray(gold_sequence(c_init, length, advance=adv)), want)


def test_crc_values_all_polynomials():
    from srsran_tpu.ops.crc import crc
    rng = np.random.default_rng(1)
    for poly in ("crc24A", "crc24B", "crc24C", "crc16", "crc11", "crc6"):
        for n in (16, 100, 1013):
            bits = rng.integers(0, 2, n).astype(np.int8)
            want = M.crc(bits, poly)
            got = np.asarray(crc(jnp.asarray(bits)[None], poly))[0]
            np.testing.assert_array_equal(got, want, err_msg=f"{poly} n={n}")


def test_modulation_mapper_values():
    from srsran_tpu.ops.modulation import modulate
    rng = np.random.default_rng(2)
    for scheme, qm in [("bpsk", 1), ("qpsk", 2), ("qam16", 4),
                       ("qam64", 6), ("qam256", 8)]:
        bits = rng.integers(0, 2, 24 * qm).astype(np.int8)
        want = M.modulate(bits, scheme)
        got = np.asarray(modulate(jnp.asarray(bits)[None], scheme))[0]
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_polar_encoder_values():
    from srsran_tpu.ops.polar import encode
    rng = np.random.default_rng(3)
    for n in (3, 5, 9, 10):
        u = rng.integers(0, 2, 1 << n).astype(np.int8)
        want = M.polar_encode(u)
        got = np.asarray(encode(jnp.asarray(u)[None], n))[0]
        np.testing.assert_array_equal(got, want)


def _ils(z: int) -> int:
    a = z
    while a % 2 == 0 and a > 2:
        a //= 2
    if a == 1:
        a = 2
    return {2: 0, 3: 1, 5: 2, 7: 3, 9: 4, 11: 5, 13: 6, 15: 7}[a]


@pytest.mark.parametrize("bg,z", [(1, 384), (1, 52), (2, 384), (2, 10),
                                  (1, 2), (2, 128)])
def test_ldpc_encoder_satisfies_parity_equations(bg, z):
    """H c^T = 0 with H built directly from the 3GPP base-graph table, plus
    the systematic prefix — the TS38.212 definition of a valid codeword."""
    from srsran_tpu.ops.ldpc_encode import encode
    import os
    tab = np.load(os.path.join(os.path.dirname(M.__file__), "..", "data",
                               "ldpc_bg_tables.npz"))[f"bg{bg}"][_ils(z)]
    entries = [(r, c, int(tab[r, c])) for r in range(tab.shape[0])
               for c in range(tab.shape[1]) if tab[r, c] >= 0]
    k_cols = 22 if bg == 1 else 10
    rng = np.random.default_rng(4)
    msg = rng.integers(0, 2, (2, k_cols * z)).astype(np.int8)
    code = np.asarray(encode(jnp.asarray(msg), bg, z))
    for b in range(msg.shape[0]):
        assert (code[b, :k_cols * z] == msg[b]).all(), "not systematic"
        assert M.ldpc_parity_check(code[b], bg, z, entries), \
            f"H c != 0 for bg{bg} z={z}"


def test_pss_sss_values():
    from srsran_tpu.phy.upper import ssb
    for nid in (0, 1, 500, 1007):
        np.testing.assert_allclose(ssb.pss_sequence(nid % 3), M.pss(nid % 3),
                                   atol=1e-6)
        np.testing.assert_allclose(
            ssb.sss_sequence(nid // 3, nid % 3), M.sss(nid // 3, nid % 3),
            atol=1e-6)


def test_zadoff_chu_values():
    from srsran_tpu.ops.low_papr import base_sequence
    for u, v, m in [(0, 0, 36), (7, 0, 144), (29, 1, 624), (13, 0, 48)]:
        np.testing.assert_allclose(base_sequence(u, v, m),
                                   M.zc_base_sequence(u, v, m), atol=1e-5)


def test_ofdm_modulator_values_direct_dft():
    """ops.ofdm.modulate_slot vs the per-sample DFT-sum model, including
    CP prepend, half-spectrum mapping and phase compensation."""
    from srsran_tpu.ops import ofdm
    from srsran_tpu.ran.cyclic_prefix import CyclicPrefix, cp_lengths
    rng = np.random.default_rng(5)
    nof_sc, dft, mu, fc = 72, 128, 1, 3.5e9
    nsym = 14
    grid = (rng.normal(size=(1, nsym, nof_sc))
            + 1j * rng.normal(size=(1, nsym, nof_sc))).astype(np.complex64)
    got = np.asarray(ofdm.modulate_slot(jnp.asarray(grid), dft, mu,
                                        CyclicPrefix.NORMAL, 0, fc))[0]
    lens = cp_lengths(CyclicPrefix.NORMAL, mu, dft, 0)
    fs = dft * (15000 << mu)
    pos = 0
    for l in range(nsym):
        cp = int(lens[l])
        t_start = (pos + cp) / fs
        # independent phase compensation: e^{-j 2 pi f_c t_l}; the framework
        # uses the unitary 1/sqrt(N) IFFT normalization
        pc = np.exp(-2j * np.pi * (fc * t_start % 1.0))
        want = M.ofdm_modulate_symbol(grid[0, l], dft, cp, pc,
                                      1.0 / np.sqrt(dft))
        got_sym = got[pos:pos + cp + dft]
        np.testing.assert_allclose(got_sym, want, atol=2e-4)
        pos += cp + dft


def test_ofdm_demodulator_values_direct_dft():
    from srsran_tpu.ops import ofdm
    from srsran_tpu.ran.cyclic_prefix import CyclicPrefix, cp_lengths
    rng = np.random.default_rng(6)
    nof_sc, dft, mu, fc = 72, 128, 1, 0.0   # fc=0: isolate the window math
    nsym = 14
    grid = (rng.normal(size=(1, nsym, nof_sc))
            + 1j * rng.normal(size=(1, nsym, nof_sc))).astype(np.complex64)
    samples = np.asarray(ofdm.modulate_slot(
        jnp.asarray(grid), dft, mu, CyclicPrefix.NORMAL, 0, fc))
    got = np.asarray(ofdm.demodulate_slot(
        jnp.asarray(samples), nof_sc, dft, mu, CyclicPrefix.NORMAL, 0, fc))[0]
    lens = cp_lengths(CyclicPrefix.NORMAL, mu, dft, 0)
    pos = 0
    for l in range(nsym):
        cp = int(lens[l])
        want = M.ofdm_demodulate_symbol(samples[0, pos:pos + cp + dft],
                                        nof_sc, dft, cp,
                                        window_offset=0, phase_comp=1.0)
        want = want * np.sqrt(dft)     # undo the unitary TX normalization
        # both sides must reproduce the transmitted grid symbol
        np.testing.assert_allclose(want, grid[0, l], atol=1e-3)
        np.testing.assert_allclose(got[l], grid[0, l], atol=1e-3)
        pos += cp + dft
