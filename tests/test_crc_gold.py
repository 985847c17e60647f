"""CRC and Gold-sequence kernels vs bit-serial references and spec values."""

import numpy as np
import jax.numpy as jnp

from srsran_tpu.ops import crc, gold


def test_crc_matches_serial():
    rng = np.random.default_rng(0)
    for name in ("crc24A", "crc24B", "crc24C", "crc16", "crc11", "crc6"):
        length, _ = crc.POLYS[name]
        bits = rng.integers(0, 2, size=100).astype(np.int8)
        want = crc.crc_value_np(bits, name)
        got_bits = np.asarray(crc.crc(jnp.asarray(bits), name))
        got = int("".join(map(str, got_bits)), 2)
        assert got == want, name


def test_crc_leading_zeros_invariant():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, size=64).astype(np.int8)
    padded = np.concatenate([np.zeros(100, np.int8), bits])
    a = np.asarray(crc.crc(jnp.asarray(bits), "crc24A"))
    b = np.asarray(crc.crc(jnp.asarray(padded), "crc24A"))
    np.testing.assert_array_equal(a, b)


def test_crc_check_appended():
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, size=200).astype(np.int8)
    c = np.asarray(crc.crc(jnp.asarray(bits), "crc24B"))
    full = np.concatenate([bits, c])
    assert bool(crc.crc_check(jnp.asarray(full), "crc24B"))
    full[17] ^= 1
    assert not bool(crc.crc_check(jnp.asarray(full), "crc24B"))


def test_crc_batched():
    rng = np.random.default_rng(3)
    batch = rng.integers(0, 2, size=(5, 120)).astype(np.int8)
    got = np.asarray(crc.crc(jnp.asarray(batch), "crc16"))
    for i in range(5):
        want = crc.crc_value_np(batch[i], "crc16")
        assert int("".join(map(str, got[i])), 2) == want


def test_gold_matches_serial():
    for c_init in (0x12345, 1, 0x7FFFFFFF, 12345678):
        want = gold.gold_sequence_np(c_init, 300)
        got = np.asarray(gold.gold_sequence(c_init, 300))
        np.testing.assert_array_equal(got, want)


def test_gold_advance():
    c_init = 0xBEEF
    full = gold.gold_sequence_np(c_init, 500)
    got = np.asarray(gold.gold_sequence(c_init, 100, advance=400))
    np.testing.assert_array_equal(got, full[400:])


def test_gold_batched_seeds():
    seeds = np.array([5, 99, 2**30], dtype=np.uint32)
    got = np.asarray(gold.gold_sequence(jnp.asarray(seeds), 128))
    for i, s in enumerate(seeds):
        np.testing.assert_array_equal(got[i], gold.gold_sequence_np(int(s), 128))
