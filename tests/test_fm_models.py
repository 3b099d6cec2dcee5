"""End-to-end FM model tests: north-star config #1.

The reference's qa pattern at chain level (qa_wfm_rcv has no golden data in
tree; we go further): synthesize a known FM signal, run the full WBFM
receive chain, and bound the SNR of the recovered audio against the known
message — "bit-exact within SNR bound" per BASELINE.json.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from grtpu import Graph, StreamExecutor
from grtpu.runtime.block import Port
from grtpu.models.fm import WfmRcv, NbfmRx, NbfmTx, FmDeemph
from grtpu.blocks.analog import FrequencyModulator


def snr_db(ref, est):
    err = est - ref
    return 10 * np.log10((ref ** 2).sum() / max((err ** 2).sum(), 1e-30))


def align(ref, est, max_lag=256):
    """Align est to ref by cross-correlation (filters are causal here, the
    reference chain is zero-delay — the lag is the chain's group delay)."""
    n = min(len(ref), len(est))
    r, e = ref[:n], est[:n]
    corr = [np.dot(r[: n - l], e[l: n]) for l in range(max_lag)]
    lag = int(np.argmax(corr))
    m = n - lag
    return r[:m], e[lag: lag + m], lag


class TestWfmRcv:
    def test_tone_recovery(self):
        quad_rate = 256_000.0
        audio_decim = 8
        audio_rate = quad_rate / audio_decim
        n = 1 << 16
        f_tone = 1000.0
        t = np.arange(n) / quad_rate
        msg = (0.5 * np.sin(2 * np.pi * f_tone * t)).astype(np.float32)

        # FM modulate at 75 kHz deviation (matching WfmRcv's demod gain)
        g = Graph()
        pin = g.add_input(Port(jnp.float32))
        pout = g.add_output(Port(jnp.float32))
        mod = FrequencyModulator(2 * np.pi * 75e3 / quad_rate)
        rcv = WfmRcv(quad_rate, audio_decim)
        g.connect(pin, mod, rcv, pout)
        ex = StreamExecutor(g, chunk_size=8192)
        audio = np.asarray(ex.run(jnp.asarray(msg)))

        assert audio.shape[0] == n // audio_decim
        # compare against deemphasized message (the chain includes deemph)
        g2 = Graph()
        p2 = g2.add_input(Port(jnp.float32))
        o2 = g2.add_output(Port(jnp.float32))
        g2.connect(p2, FmDeemph(audio_rate, 75e-6), o2)
        ex2 = StreamExecutor(g2, chunk_size=1024)
        ref = np.asarray(ex2.run(jnp.asarray(msg[::audio_decim])))

        # discard filter transient, align group delay, bound SNR
        settle = 512
        r, e, lag = align(ref[settle:-settle], audio[settle:-settle])
        s = snr_db(r, e)
        assert s > 30.0, f"WBFM audio SNR too low: {s:.1f} dB (lag {lag})"

    def test_chunk_size_invariance(self):
        """Streaming must be exact: different chunk sizes, same output."""
        quad_rate = 64_000.0
        n = 1 << 13
        rng = np.random.RandomState(7)
        msg = rng.randn(n).astype(np.float32) * 0.3

        outs = []
        for cs in (1024, 4096):
            g = Graph()
            pin = g.add_input(Port(jnp.float32))
            pout = g.add_output(Port(jnp.float32))
            g.connect(pin, FrequencyModulator(2 * np.pi * 75e3 / quad_rate),
                      WfmRcv(quad_rate, 4), pout)
            ex = StreamExecutor(g, chunk_size=cs)
            outs.append(np.asarray(ex.run(jnp.asarray(msg))))
        np.testing.assert_allclose(outs[0], outs[1], atol=2e-4)


class TestNbfm:
    def test_loopback(self):
        audio_rate = 16_000.0
        quad_rate = 64_000.0
        n = 1 << 14
        t = np.arange(n) / audio_rate
        msg = (0.5 * np.sin(2 * np.pi * 800 * t)).astype(np.float32)

        g = Graph()
        pin = g.add_input(Port(jnp.float32))
        pout = g.add_output(Port(jnp.float32))
        g.connect(pin, NbfmTx(audio_rate, quad_rate),
                  NbfmRx(audio_rate, quad_rate), pout)
        ex = StreamExecutor(g, chunk_size=4096)
        audio = np.asarray(ex.run(jnp.asarray(msg)))
        assert audio.shape[0] == n

        # Recovered tone should be ~800 Hz dominant with decent SNR after
        # settle; compare spectra rather than waveforms (group delay).
        settle = 2048
        seg = audio[settle:settle + 8192]
        spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        peak_freq = np.argmax(spec) * audio_rate / len(seg)
        assert abs(peak_freq - 800) < 10, peak_freq
        inband = spec[np.arange(len(spec)) * audio_rate / len(seg) < 3000]
        total = spec.sum()
        assert inband.sum() / total > 0.95


class TestEmphasis:
    def test_deemph_response(self):
        """Deemphasis: unity at DC, -3dB at 1/(2 pi tau)."""
        fs, tau = 48000.0, 75e-6
        g = Graph()
        pin = g.add_input(Port(jnp.float32))
        pout = g.add_output(Port(jnp.float32))
        g.connect(pin, FmDeemph(fs, tau), pout)
        ex = StreamExecutor(g, chunk_size=4096)
        # impulse response -> frequency response
        x = np.zeros(4096, np.float32)
        x[0] = 1.0
        h = np.asarray(ex.run(jnp.asarray(x)))
        H = np.fft.rfft(h, 8192)
        f = np.fft.rfftfreq(8192, 1 / fs)
        f3 = 1 / (2 * np.pi * tau)  # ~2122 Hz
        assert abs(abs(H[0]) - 1.0) < 1e-3
        i3 = np.argmin(np.abs(f - f3))
        assert abs(20 * np.log10(abs(H[i3])) + 3.0) < 0.5
