"""Headless GUI-sink analogs (grtpu.gui): the qtgui/wxgui display math
(spectrum scaling, waterfall raster, trigger engine, running averages)
pinned numerically, plus PNG render smoke tests."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from grtpu import Graph, StreamExecutor
from grtpu.runtime.block import Port
from grtpu import gui

RNG = np.random.RandomState(7)


def _run_into(sink, x, chunk=1024):
    g = Graph()
    pin = g.add_input(Port(sink.in_ports[0].dtype))
    g.connect(pin, sink)
    ex = StreamExecutor(g, chunk_size=chunk)
    ex.run(jnp.asarray(x))
    return ex


class TestFftSink:
    def test_tone_peak_location_and_level(self, tmp_path):
        fs, f, n_fft = 32000.0, 4000.0, 256
        x = 0.5 * np.exp(2j * np.pi * f / fs * np.arange(8192))
        sink = gui.FftSink(n_fft, fs)
        _run_into(sink, x.astype(np.complex64))
        spec = sink.spectrum()
        freqs = sink.freqs()
        peak = np.argmax(spec)
        assert abs(freqs[peak] - f) < fs / n_fft
        # logpwrfft convention: a ref_scale/2-amplitude tone reads 0 dB;
        # amplitude 0.5 -> -6.02 dB, plus the Blackman-Harris coherent/
        # power gain mismatch -3.02 dB -> -9.04 dB at the peak
        assert abs(spec[peak] - (-9.04)) < 0.5
        out = sink.render(str(tmp_path / "fft.png"))
        assert os.path.getsize(out) > 4000

    def test_averaging(self):
        fs, n_fft = 8000.0, 64
        x = (RNG.randn(64 * 64) + 1j * RNG.randn(64 * 64)).astype(
            np.complex64)
        s_last = gui.FftSink(n_fft, fs, avg_alpha=1.0)
        s_avg = gui.FftSink(n_fft, fs, avg_alpha=0.1)
        _run_into(s_last, x)
        _run_into(s_avg, x)
        # averaging flattens the noise spectrum
        assert s_avg.spectrum().std() < s_last.spectrum().std()


class TestWaterfallSink:
    def test_raster_shape_and_render(self, tmp_path):
        fs, n_fft = 8000.0, 128
        x = (RNG.randn(4096) + 1j * RNG.randn(4096)).astype(np.complex64)
        sink = gui.WaterfallSink(n_fft, fs)
        _run_into(sink, x)
        s = sink.spectra()
        assert s.shape == (4096 // n_fft, n_fft)
        out = sink.render(str(tmp_path / "wf.png"))
        assert os.path.getsize(out) > 4000


class TestScopeSink:
    def test_triggered_render(self, tmp_path):
        fs = 1000.0
        t = np.arange(8192) / fs
        x = np.sin(2 * np.pi * 10 * t).astype(np.float32)
        sink = gui.ScopeSink(frame_size=256, sample_rate=fs)
        _run_into(sink, x)
        frames = sink.frames(level=0.0, slope="pos")
        assert len(frames) > 0
        # every triggered frame starts at a positive-going zero crossing
        for fr in frames:
            assert fr[0] < 0.1 and fr[1] >= fr[0]
        out = sink.render(str(tmp_path / "scope.png"))
        assert os.path.getsize(out) > 4000


class TestConstNumberHisto:
    def test_const_sink(self, tmp_path):
        pts = np.array([1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j], np.complex64)
        x = np.repeat(pts, 256)
        sink = gui.ConstSink(max_points=512)
        _run_into(sink, x)
        assert len(sink.points()) == 512
        out = sink.render(str(tmp_path / "const.png"))
        assert os.path.getsize(out) > 4000

    def test_number_sink_converges_to_mean(self, tmp_path):
        x = np.full(4096, 3.25, np.float32)
        sink = gui.NumberSink(avg_alpha=0.05)
        _run_into(sink, x)
        assert abs(sink.value() - 3.25) < 1e-3
        out = sink.render(str(tmp_path / "num.png"))
        assert os.path.getsize(out) > 2000

    def test_histo_sink(self, tmp_path):
        x = RNG.randn(8192).astype(np.float32)
        sink = gui.HistoSinkDisplay(nbins=32)
        _run_into(sink, x)
        counts, edges = sink.histogram()
        assert counts.sum() == 8192
        assert len(counts) == 32
        out = sink.render(str(tmp_path / "histo.png"))
        assert os.path.getsize(out) > 2000


class TestRealAndComplexHandling:
    def test_fft_sink_real_dtype_axis(self, tmp_path):
        fs, f = 8000.0, 1000.0
        x = np.sin(2 * np.pi * f / fs * np.arange(4096)).astype(np.float32)
        sink = gui.FftSink(128, fs, dtype=jnp.float32)
        _run_into(sink, x)
        freqs = sink.freqs()
        assert freqs[0] == 0 and np.all(np.diff(freqs) > 0)
        disp = sink._display(sink.spectrum())
        assert disp.shape == freqs.shape
        assert abs(freqs[np.argmax(disp)] - f) < fs / 128
        out = sink.render(str(tmp_path / "rfft.png"))
        assert os.path.getsize(out) > 4000

    def test_number_sink_complex_magnitude(self):
        x = np.full(2048, 3.0j, np.complex64)
        sink = gui.NumberSink(avg_alpha=0.05, dtype=jnp.complex64)
        _run_into(sink, x)
        assert abs(sink.value() - 3.0) < 1e-3
