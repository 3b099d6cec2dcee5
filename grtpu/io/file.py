"""File sources/sinks: raw capture and WAV audio I/O.

Analogs (SURVEY.md §2.6): gr_file_source / gr_file_sink(_base),
gr_wavfile_source / gr_wavfile_sink (gri_wavfile), gr_tagged_file_sink.

Host-side ingest: files are memory-mapped/streamed on the host and fed into
the executor as chunked arrays; at Gsample/s scale the native ingest path
(grtpu.io.native ring buffer) feeds pinned buffers instead.
"""

from __future__ import annotations

import os
import wave
from typing import Optional

import numpy as np
import jax.numpy as jnp

from grtpu.runtime.block import Block, Port
from grtpu.runtime.tags import Tag


_DTYPE_FROM_GR = {
    "complex": np.complex64, "float": np.float32, "int": np.int32,
    "short": np.int16, "byte": np.uint8,
}


def load_capture(path: str, dtype=np.complex64, offset_items: int = 0,
                 nitems: Optional[int] = None) -> np.ndarray:
    """Read a raw binary capture (gr_file_source semantics: packed
    native-endian items)."""
    dt = np.dtype(dtype)
    count = -1 if nitems is None else nitems
    return np.fromfile(path, dtype=dt, count=count, offset=offset_items * dt.itemsize)


def save_capture(path: str, data: np.ndarray, append: bool = False):
    """Write a raw binary capture (gr_file_sink semantics)."""
    mode = "ab" if append else "wb"
    with open(path, mode) as f:
        np.asarray(data).tofile(f)


class FileSource(Block):
    """gr_file_source: stream a raw capture, optional repeat."""

    def __init__(self, path: str, dtype=jnp.complex64, repeat: bool = False,
                 name=None):
        self.out_ports = (Port(dtype),)
        super().__init__(name)
        self.data = load_capture(path, np.dtype(dtype))
        self.repeat = repeat

    def init_state(self):
        return jnp.zeros((), jnp.int32)

    def apply(self, state, n: int):
        m = len(self.data)
        idx = (state + jnp.arange(n)) % m
        y = jnp.asarray(self.data)[idx]
        if not self.repeat:
            mask = (state + jnp.arange(n)) < m
            y = y * mask.astype(y.dtype)
        return state + n, y

    def n_items(self):
        return len(self.data)


class FileSink(Block):
    """gr_file_sink: capture the stream, write on flush()."""

    def __init__(self, path: str, dtype=jnp.complex64, name=None):
        self.in_ports = (Port(dtype),)
        self.out_ports = ()
        super().__init__(name)
        self.path = path
        self.captured = None

    def apply(self, state, x):
        return state, ()

    def flush(self):
        if self.captured is not None:
            save_capture(self.path, np.asarray(self.captured[0]))


class TaggedFileSink(Block):
    """gr_tagged_file_sink: write burst segments delimited by tags to
    numbered files.  Burst extraction happens at flush() from the captured
    stream + the executor's tag store."""

    def __init__(self, basename: str, dtype=jnp.complex64, name=None):
        self.in_ports = (Port(dtype),)
        self.out_ports = ()
        super().__init__(name)
        self.basename = basename
        self.captured = None

    def apply(self, state, x):
        return state, ()

    def flush(self, tags):
        data = np.asarray(self.captured[0])
        bursts = []
        start = None
        for t in sorted(tags):
            if t.key == "burst" and t.value and start is None:
                start = t.offset
            elif t.key == "burst" and not t.value and start is not None:
                bursts.append((start, t.offset))
                start = None
        for i, (a, b) in enumerate(bursts):
            save_capture(f"{self.basename}.{i:04d}.dat", data[a:b])
        return bursts


# ----------------------------------------------------------------------- wav
def load_wav(path: str):
    """Read a WAV file -> (rate, (nframes, nchan) float32 in [-1, 1])
    (gr_wavfile_source semantics)."""
    with wave.open(path, "rb") as w:
        nch = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    if width == 2:
        arr = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 1:
        arr = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    return rate, arr.reshape(-1, nch)


def save_wav(path: str, rate: int, data: np.ndarray):
    """Write float32 [-1,1] (nframes[, nchan]) to a 16-bit WAV
    (gr_wavfile_sink semantics)."""
    arr = np.asarray(data)
    if arr.ndim == 1:
        arr = arr[:, None]
    pcm = np.clip(np.round(arr * 32767.0), -32768, 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(2)
        w.setframerate(int(rate))
        w.writeframes(pcm.tobytes())


class WavFileSource(Block):
    """gr_wavfile_source: one output port per channel."""

    def __init__(self, path: str, repeat: bool = False, name=None):
        self.rate, data = load_wav(path)
        nch = data.shape[1]
        self.out_ports = tuple(Port(jnp.float32) for _ in range(nch))
        super().__init__(name)
        self.data = data
        self.repeat = repeat

    def init_state(self):
        return jnp.zeros((), jnp.int32)

    def apply(self, state, n: int):
        m = self.data.shape[0]
        idx = (state + jnp.arange(n)) % m
        frames = jnp.asarray(self.data)[idx]
        if not self.repeat:
            mask = ((state + jnp.arange(n)) < m).astype(jnp.float32)
            frames = frames * mask[:, None]
        return state + n, tuple(frames[:, c] for c in range(self.data.shape[1]))


class WavFileSink(Block):
    """gr_wavfile_sink: capture channels, write on flush()."""

    def __init__(self, path: str, rate: int, nchan: int = 1, name=None):
        self.in_ports = tuple(Port(jnp.float32) for _ in range(nchan))
        self.out_ports = ()
        super().__init__(name)
        self.path = path
        self.rate = rate
        self.captured = None

    def apply(self, state, *xs):
        return state, ()

    def flush(self):
        if self.captured is not None:
            data = np.stack([np.asarray(c) for c in self.captured], axis=1)
            save_wav(self.path, self.rate, data)
