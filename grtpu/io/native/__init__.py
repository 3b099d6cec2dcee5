"""ctypes bindings for the native host ring buffer (vmcircbuf analog).

Builds libgrtpu_ringbuf.so from ringbuf.cc on first import (cached next to
the source); falls back to a pure-python deque ring if no compiler is
available, so the package stays importable everywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libgrtpu_ringbuf.so")
_SRC = os.path.join(_DIR, "ringbuf.cc")

_lib = None


def _build() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        for cc in ("c++", "g++", "clang++"):
            try:
                subprocess.run(
                    [cc, "-O2", "-shared", "-fPIC", "-o", _SO, _SRC,
                     "-lpthread"],
                    check=True, capture_output=True, timeout=120)
                break
            except (subprocess.CalledProcessError, FileNotFoundError,
                    subprocess.TimeoutExpired):
                continue
        else:
            return None
    lib = ctypes.CDLL(_SO)
    lib.grtpu_ring_create.restype = ctypes.c_void_p
    lib.grtpu_ring_create.argtypes = [ctypes.c_size_t]
    lib.grtpu_ring_destroy.argtypes = [ctypes.c_void_p]
    lib.grtpu_ring_capacity.restype = ctypes.c_size_t
    lib.grtpu_ring_capacity.argtypes = [ctypes.c_void_p]
    lib.grtpu_ring_readable.restype = ctypes.c_size_t
    lib.grtpu_ring_readable.argtypes = [ctypes.c_void_p]
    lib.grtpu_ring_writable.restype = ctypes.c_size_t
    lib.grtpu_ring_writable.argtypes = [ctypes.c_void_p]
    lib.grtpu_ring_eof.restype = ctypes.c_int
    lib.grtpu_ring_eof.argtypes = [ctypes.c_void_p]
    lib.grtpu_ring_set_eof.argtypes = [ctypes.c_void_p]
    lib.grtpu_ring_write.restype = ctypes.c_size_t
    lib.grtpu_ring_write.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                     ctypes.c_size_t]
    lib.grtpu_ring_read.restype = ctypes.c_size_t
    lib.grtpu_ring_read.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_size_t]
    lib.grtpu_ring_peek.restype = ctypes.c_void_p
    lib.grtpu_ring_peek.argtypes = [ctypes.c_void_p]
    lib.grtpu_ring_advance.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
    lib.grtpu_pump_file.restype = ctypes.c_void_p
    lib.grtpu_pump_file.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.grtpu_pump_stop.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _build() is not None


class RingBuffer:
    """Single-writer/single-reader byte ring over the native double-mapped
    region (gr_vmcircbuf semantics: wraparound is linear-addressable)."""

    def __init__(self, min_bytes: int = 1 << 22):
        lib = _build()
        if lib is None:
            raise RuntimeError("native ring buffer unavailable (no compiler)")
        self._lib = lib
        self._h = lib.grtpu_ring_create(min_bytes)
        if not self._h:
            raise RuntimeError("ring creation failed")

    @property
    def capacity(self) -> int:
        return self._lib.grtpu_ring_capacity(self._h)

    @property
    def readable(self) -> int:
        return self._lib.grtpu_ring_readable(self._h)

    @property
    def writable(self) -> int:
        return self._lib.grtpu_ring_writable(self._h)

    @property
    def eof(self) -> bool:
        return bool(self._lib.grtpu_ring_eof(self._h))

    def set_eof(self):
        self._lib.grtpu_ring_set_eof(self._h)

    def write(self, data: bytes) -> int:
        return self._lib.grtpu_ring_write(self._h, data, len(data))

    def read(self, n: int) -> bytes:
        buf = ctypes.create_string_buffer(n)
        got = self._lib.grtpu_ring_read(self._h, buf, n)
        return buf.raw[:got]

    def read_items(self, n_items: int, dtype=np.complex64) -> Optional[np.ndarray]:
        """Read exactly n_items (or None if not yet available)."""
        dt = np.dtype(dtype)
        need = n_items * dt.itemsize
        if self.readable < need:
            return None
        raw = self.read(need)
        return np.frombuffer(raw, dt)

    def close(self):
        if self._h:
            self._lib.grtpu_ring_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class FilePump:
    """Background native thread streaming a file into a RingBuffer
    (the high-rate ingest path for gr_file_source-style capture replay)."""

    def __init__(self, ring: RingBuffer, path: str):
        self._lib = ring._lib
        self._h = self._lib.grtpu_pump_file(ring._h, path.encode())
        if not self._h:
            raise RuntimeError(f"cannot pump {path}")

    def stop(self):
        if self._h:
            self._lib.grtpu_pump_stop(self._h)
            self._h = None

    def __del__(self):
        try:
            self.stop()
        except Exception:
            pass
