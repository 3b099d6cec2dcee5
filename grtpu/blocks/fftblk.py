"""FFT vector blocks + spectral models.

Analogs (SURVEY.md §2.4/§2.9): gri_fft / gr_fft_vcc (+_fftw), gr_fft_vfc
(vector-in/vector-out FFT with optional window + shift), and the
blks2impl spectral chains: logpwrfft.py (stream -> vector -> window FFT ->
|.|^2 -> log), stream_to_vector_decimator.py.

FFTW's planner/wisdom machinery (gri_fft.cc:59-83) has no analog here: XLA
emits the FFT natively and caches compiled programs.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from grtpu.runtime.block import Block, Port
from grtpu.runtime.graph import HierBlock
from grtpu.utils import firdes


class FftVcc(Block):
    """gr_fft_vcc: (vlen,) complex vectors -> FFT (or IFFT), optional
    window and spectral shift (DC-centered output)."""

    def __init__(self, fft_size: int, forward: bool = True, window=None,
                 shift: bool = False, name=None):
        self.in_ports = (Port(jnp.complex64, fft_size),)
        self.out_ports = (Port(jnp.complex64, fft_size),)
        super().__init__(name)
        self.fft_size = fft_size
        self.forward = forward
        self.window = None if window is None else np.asarray(window, np.float32)
        self.shift = shift

    def apply(self, state, x):
        v = x
        if self.window is not None:
            v = v * jnp.asarray(self.window)[None, :]
        if self.forward:
            y = jnp.fft.fft(v, axis=1)
            if self.shift:
                y = jnp.fft.fftshift(y, axes=1)
        else:
            if self.shift:
                v = jnp.fft.ifftshift(v, axes=1)
            y = jnp.fft.ifft(v, axis=1)
        return state, y.astype(jnp.complex64)


class FftVfc(Block):
    """gr_fft_vfc: float vectors -> complex FFT."""

    def __init__(self, fft_size: int, forward: bool = True, window=None,
                 shift: bool = False, name=None):
        self.in_ports = (Port(jnp.float32, fft_size),)
        self.out_ports = (Port(jnp.complex64, fft_size),)
        super().__init__(name)
        self.fft_size = fft_size
        self.window = None if window is None else np.asarray(window, np.float32)
        self.shift = shift
        self.forward = forward

    def apply(self, state, x):
        v = x if self.window is None else x * jnp.asarray(self.window)[None, :]
        y = jnp.fft.fft(v.astype(jnp.complex64), axis=1)
        if self.shift:
            y = jnp.fft.fftshift(y, axes=1)
        return state, y.astype(jnp.complex64)


class StreamToVectorDecimator(Block):
    """blks2impl/stream_to_vector_decimator.py: group into vlen vectors,
    keep one vector in vec_rate (decimate at vector granularity)."""

    def __init__(self, vlen: int, keep_one_in: int = 1, dtype=jnp.complex64,
                 name=None):
        self.in_ports = (Port(dtype, 1),)
        self.out_ports = (Port(dtype, vlen),)
        self.decim = vlen * keep_one_in
        super().__init__(name)
        self.vlen = vlen
        self.keep = keep_one_in

    def apply(self, state, x):
        v = x.reshape(-1, self.keep, self.vlen)
        return state, v[:, self.keep - 1, :]


class LogPwrFft(HierBlock):
    """blks2impl/logpwrfft.py: stream -> windowed FFT -> 10*log10(|.|^2),
    with per-vector decimation derived from frame_rate."""

    def __init__(self, sample_rate: float, fft_size: int = 1024,
                 frame_rate: float = 30.0, avg_alpha: float = 1.0,
                 dtype=jnp.complex64, name=None):
        super().__init__(name)
        keep = max(1, int(sample_rate / (fft_size * frame_rate)))
        win = firdes.window(firdes.Window.BLACKMAN_HARRIS, fft_size)
        win_power = float((win ** 2).sum())

        class _Mag2Log(Block):
            def __init__(self):
                self.in_ports = (Port(jnp.complex64, fft_size),)
                self.out_ports = (Port(jnp.float32, fft_size),)
                super().__init__()

            def apply(self, state, x):
                p = (x.real ** 2 + x.imag ** 2) / win_power
                return state, (10.0 * jnp.log10(jnp.maximum(p, 1e-20))).astype(
                    jnp.float32)

        i = self.graph.add_input(Port(dtype))
        o = self.graph.add_output(Port(jnp.float32, fft_size))
        self.graph.connect(
            i, StreamToVectorDecimator(fft_size, keep, dtype),
            FftVcc(fft_size, True, win.astype(np.float32), shift=True),
            _Mag2Log(), o)
