"""ctypes bindings for the native sampio runtime (native/sampio.cpp).

The shared library builds on first use with g++ -O3 (no pybind11 in this
environment; the C ABI + ctypes keeps the binding dependency-free).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "sampio.cpp")
_LIB = os.path.join(_REPO, "native", "libsampio.so")
_BUILD_LOCK = threading.Lock()
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    with _BUILD_LOCK:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                 "-fPIC", "-o", _LIB, _SRC], check=True)
        lib = ctypes.CDLL(_LIB)
        u64, u32, f64 = ctypes.c_uint64, ctypes.c_uint32, ctypes.c_double
        vp, fp = ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)
        lib.sampio_ring_create.restype = vp
        lib.sampio_ring_create.argtypes = [u64, u32]
        lib.sampio_ring_destroy.argtypes = [vp]
        lib.sampio_ring_capacity.restype = u64
        lib.sampio_ring_capacity.argtypes = [vp]
        lib.sampio_ring_readable.restype = u64
        lib.sampio_ring_readable.argtypes = [vp]
        lib.sampio_ring_writable.restype = u64
        lib.sampio_ring_writable.argtypes = [vp]
        lib.sampio_ring_write.restype = u64
        lib.sampio_ring_write.argtypes = [vp, fp, u64]
        lib.sampio_ring_read.restype = u64
        lib.sampio_ring_read.argtypes = [vp, fp, u64, ctypes.POINTER(u64)]
        lib.sampio_file_open_write.restype = vp
        lib.sampio_file_open_write.argtypes = [ctypes.c_char_p, u32, f64]
        lib.sampio_file_open_read.restype = vp
        lib.sampio_file_open_read.argtypes = [ctypes.c_char_p,
                                              ctypes.POINTER(u32),
                                              ctypes.POINTER(f64)]
        lib.sampio_file_write.restype = u64
        lib.sampio_file_write.argtypes = [vp, fp, u64]
        lib.sampio_file_read.restype = u64
        lib.sampio_file_read.argtypes = [vp, fp, u64]
        lib.sampio_file_close.argtypes = [vp]
        _lib = lib
    return _lib


def _as_float_ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class SampleRing:
    """Timestamped SPSC multi-channel cf32 ring (native, wait-free)."""

    def __init__(self, capacity: int, nof_channels: int):
        self._lib = _load()
        self._h = self._lib.sampio_ring_create(capacity, nof_channels)
        if not self._h:
            raise MemoryError("sampio ring allocation failed")
        self.nof_channels = nof_channels
        self.capacity = self._lib.sampio_ring_capacity(self._h)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.sampio_ring_destroy(self._h)
            self._h = None

    @property
    def readable(self) -> int:
        return self._lib.sampio_ring_readable(self._h)

    @property
    def writable(self) -> int:
        return self._lib.sampio_ring_writable(self._h)

    def write(self, samples: np.ndarray) -> bool:
        """samples: complex64 [channels, count].  All-or-nothing."""
        samples = np.ascontiguousarray(samples, dtype=np.complex64)
        assert samples.shape[0] == self.nof_channels
        count = samples.shape[1]
        n = self._lib.sampio_ring_write(
            self._h, _as_float_ptr(samples.view(np.float32)), count)
        return n == count

    def read(self, count: int):
        """Returns (samples [channels, count] complex64, timestamp) or None."""
        out = np.empty((self.nof_channels, count), dtype=np.complex64)
        ts = ctypes.c_uint64(0)
        n = self._lib.sampio_ring_read(
            self._h, _as_float_ptr(out.view(np.float32)), count,
            ctypes.byref(ts))
        if n != count:
            return None
        return out, int(ts.value)


class SampleFileWriter:
    def __init__(self, path: str, nof_channels: int, sample_rate: float):
        self._lib = _load()
        self._h = self._lib.sampio_file_open_write(
            path.encode(), nof_channels, sample_rate)
        if not self._h:
            raise IOError(f"cannot open {path}")
        self.nof_channels = nof_channels

    def write(self, samples: np.ndarray):
        """samples: complex64 [channels, count] -> interleaved frames."""
        samples = np.ascontiguousarray(
            np.asarray(samples, dtype=np.complex64).T)  # [count, channels]
        self._lib.sampio_file_write(
            self._h, _as_float_ptr(samples.view(np.float32)),
            samples.shape[0])

    def close(self):
        if self._h:
            self._lib.sampio_file_close(self._h)
            self._h = None


class SampleFileReader:
    def __init__(self, path: str):
        self._lib = _load()
        ch = ctypes.c_uint32(0)
        sr = ctypes.c_double(0)
        self._h = self._lib.sampio_file_open_read(
            path.encode(), ctypes.byref(ch), ctypes.byref(sr))
        if not self._h:
            raise IOError(f"cannot open {path}")
        self.nof_channels = ch.value
        self.sample_rate = sr.value

    def read(self, count: int):
        out = np.empty((count, self.nof_channels), dtype=np.complex64)
        n = self._lib.sampio_file_read(
            self._h, _as_float_ptr(out.view(np.float32)), count)
        return out[:n].T.copy()

    def close(self):
        if self._h:
            self._lib.sampio_file_close(self._h)
            self._h = None
