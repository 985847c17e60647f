"""Native sampio runtime, lower-PHY PRACH demod, amplitude control."""

import threading

import numpy as np
import jax.numpy as jnp

from srsran_tpu.io import SampleRing, SampleFileWriter, SampleFileReader
from srsran_tpu.phy.lower import prach_demod, amplitude_control
from srsran_tpu.phy.upper import prach as prach_up
from srsran_tpu.ran.prach_params import zc_sequence


def test_ring_roundtrip(tmp_path):
    ring = SampleRing(4096, 2)
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(2, 1000)) + 1j * rng.normal(size=(2, 1000))).astype(np.complex64)
    assert ring.write(x)
    out = ring.read(1000)
    assert out is not None
    data, ts = out
    assert ts == 0
    np.testing.assert_array_equal(data, x)
    # timestamps advance
    assert ring.write(x)
    _, ts2 = ring.read(1000)
    assert ts2 == 1000


def test_ring_wraparound_and_backpressure():
    ring = SampleRing(1024, 1)
    cap = ring.capacity
    x = np.ones((1, cap), dtype=np.complex64)
    assert ring.write(x)
    assert not ring.write(np.ones((1, 1), dtype=np.complex64))  # full
    ring.read(cap // 2)
    y = (np.arange(cap // 2, dtype=np.float32) + 1j).astype(np.complex64)[None]
    assert ring.write(y)  # wraps
    ring.read(cap // 2)
    data, _ = ring.read(cap // 2)
    np.testing.assert_array_equal(data, y)


def test_ring_threaded():
    ring = SampleRing(1 << 14, 1)
    total = 200
    blk = 512
    recv = []

    def producer():
        for i in range(total):
            x = np.full((1, blk), i + 1j * i, dtype=np.complex64)
            while not ring.write(x):
                pass

    def consumer():
        got = 0
        while got < total:
            out = ring.read(blk)
            if out is None:
                continue
            recv.append(out[0][0, 0])
            got += 1

    t1, t2 = threading.Thread(target=producer), threading.Thread(target=consumer)
    t1.start(); t2.start(); t1.join(); t2.join()
    np.testing.assert_array_equal(
        np.asarray(recv), np.arange(total) + 1j * np.arange(total))


def test_file_roundtrip(tmp_path):
    path = str(tmp_path / "x.sio")
    rng = np.random.default_rng(1)
    x = (rng.normal(size=(2, 300)) + 1j * rng.normal(size=(2, 300))).astype(np.complex64)
    w = SampleFileWriter(path, 2, 61.44e6)
    w.write(x)
    w.close()
    r = SampleFileReader(path)
    assert r.nof_channels == 2 and abs(r.sample_rate - 61.44e6) < 1
    np.testing.assert_allclose(r.read(300), x)
    r.close()


def test_prach_demod_to_detector():
    """Time-domain long preamble -> lower-PHY demod -> upper-PHY detect."""
    cfg = prach_up.PrachConfig(format="0", root_sequence_index=0,
                               zero_correlation_zone=0)  # ncs=0: 1 shift/root
    fs = 30_720_000
    n_u = fs // 1250
    # Build the time-domain preamble: IDFT of the freq-domain ZC at ra bins.
    fd = np.asarray(prach_up.generate(cfg, 3))
    first_bin = 100 * 12 * 2  # arbitrary freq offset: 100 PRB at 30kHz / 1.25k
    spec = np.zeros(n_u, dtype=np.complex64)
    spec[first_bin:first_bin + 839] = fd
    td = np.fft.ifft(spec) * np.sqrt(n_u)
    samples = np.concatenate([np.zeros(5000, np.complex64),
                              td.astype(np.complex64),
                              np.zeros(2000, np.complex64)])[None]
    got = prach_demod.demodulate(jnp.asarray(samples), "0", fs, 5000,
                                 first_bin * 1250.0)
    assert got.shape == (1, 1, 839)
    # calibrated threshold (the old hard-coded 2.0 belonged to the pre-r4
    # peak/mean metric scale; the local-reference metric recalibrated)
    det = prach_up.detect(jnp.asarray(got), cfg)
    d = np.asarray(det.detected)
    assert d[3] and d.sum() == 1, np.asarray(det.metrics)[:8]


def test_amplitude_clipping():
    rng = np.random.default_rng(2)
    x = jnp.asarray((rng.normal(size=2048) + 1j * rng.normal(size=2048))
                    .astype(np.complex64))
    out, m = amplitude_control.clip(x, gain_db=0.0, ceiling_dbfs=0.0)
    assert float(jnp.max(jnp.abs(out))) <= 1.0 + 1e-5
    assert float(m.clipped_ratio) > 0.1
    out2, m2 = amplitude_control.scale(x, gain_db=-20.0)
    assert abs(float(m2.avg_power_db) - (10 * np.log10(2) - 20)) < 0.5
