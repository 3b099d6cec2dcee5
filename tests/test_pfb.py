"""Polyphase filterbank tests: channelizer tone routing, synthesis
roundtrip, arbitrary resampler fidelity.

Mirrors the reference's pfb demos (gnuradio-examples/python/pfb/channelize.py:
tones placed in different channels must each appear cleanly in their own
output channel at the decimated rate).
"""

import numpy as np
import jax.numpy as jnp
import pytest
from fractions import Fraction

from grtpu.ops.pfb import (
    arb_resample, channelize, design_arb_resampler_taps,
    design_channelizer_taps, polyphase_taps, synthesize,
)


def tone(f, n, fs=1.0, amp=1.0):
    return (amp * np.exp(2j * np.pi * f / fs * np.arange(n))).astype(np.complex64)


class TestChannelizer:
    def test_tone_routing(self):
        """A tone at channel c's center + delta appears in channel c as a
        tone at delta (output rate fs/N)."""
        N = 8
        proto = design_channelizer_taps(N, 12)
        kp = -(-len(proto) // N)
        n = 4096
        hist = kp * N
        for c, delta in [(0, 0.01), (2, 0.02), (5, -0.015), (7, 0.0)]:
            f = c / N + delta / N  # cycles/sample
            x = tone(f, n + hist)
            y = np.asarray(channelize(jnp.asarray(x), proto, N))  # (T, N)
            powers = (np.abs(y[kp * 2:]) ** 2).mean(axis=0)
            assert np.argmax(powers) == c, (c, powers)
            # selectivity: target channel carries ~all energy
            assert powers[c] / powers.sum() > 0.95, powers
            # recovered tone frequency in-channel = delta (at rate fs/N)
            seg = y[kp * 2:, c]
            dphi = np.angle(seg[1:] * np.conj(seg[:-1])).mean() / (2 * np.pi)
            assert abs(dphi - delta) < 2e-3, (dphi, delta)

    def test_two_tones_two_channels(self):
        N = 4
        proto = design_channelizer_taps(N, 12)
        kp = -(-len(proto) // N)
        n = 2048
        hist = kp * N
        x = tone(1 / N + 0.01 / N, n + hist) + tone(3 / N - 0.02 / N, n + hist)
        y = np.asarray(channelize(jnp.asarray(x), proto, N))
        p = (np.abs(y[kp * 2:]) ** 2).mean(axis=0)
        assert p[1] > 0.5 and p[3] > 0.5 and p[0] < 0.05 and p[2] < 0.05, p


class TestSynthesis:
    def test_channelize_synthesize_roundtrip(self):
        """analysis -> synthesis reconstructs the input within the
        critically-sampled bank's edge-aliasing bound (a root-Nyquist
        prototype keeps the composite response flat; residual NMSE is the
        non-cancelling edge aliasing, a property shared with the reference's
        critically-sampled bank)."""
        from grtpu.utils import firdes
        N = 4
        proto = firdes.root_raised_cosine(1.0, N, 1.0, 0.2, 14 * N)
        proto = proto / proto.sum()
        kp = -(-len(proto) // N)
        n = 4096
        hist = kp * N
        rng = np.random.RandomState(3)
        # band-limited signal (stay inside the bank's composite passband)
        base = rng.randn(n // 2 + hist // 2 + 64) + 1j * rng.randn(n // 2 + hist // 2 + 64)
        from grtpu.ops.fir import interp_fir_filter
        from grtpu.utils import firdes
        up_taps = firdes.low_pass(2.0, 2.0, 0.4, 0.2)
        kpu = -(-len(up_taps) // 2)
        xb = jnp.concatenate([jnp.zeros(kpu - 1, jnp.complex64),
                              jnp.asarray(base.astype(np.complex64))])
        x = np.asarray(interp_fir_filter(xb, jnp.asarray(up_taps), 2))[: n + hist]

        y = channelize(jnp.asarray(x), proto, N)           # (T, N)
        ych = jnp.concatenate(
            [jnp.zeros((kp - 1, N), jnp.complex64), y], axis=0)
        rec = np.asarray(synthesize(ych, proto))

        xin = np.asarray(x)[hist:]
        # find best alignment & complex gain, then require high fidelity
        best = (1e9, 0)
        for lag in range(0, 3 * kp * N):
            m = min(len(rec) - lag, len(xin)) - 256
            if m < 1000:
                break
            a = xin[256: 256 + m]
            b = rec[lag + 256: lag + 256 + m]
            g = np.vdot(b, a) / max(np.vdot(b, b).real, 1e-12)
            err = np.abs(a - g * b) ** 2
            nmse = err.mean() / (np.abs(a) ** 2).mean()
            if nmse < best[0]:
                best = (nmse, lag)
        assert best[0] < 0.1, best


class TestOversampledChannelizer:
    def test_tone_routing_os2(self):
        """2x oversampled: same channel routing, double output rate."""
        N = 8
        proto = design_channelizer_taps(N, 12)
        kp = -(-len(proto) // N)
        n = 4096
        hist = kp * N
        c, delta = 3, 0.012
        f = c / N + delta / N
        x = tone(f, n + hist)
        y = np.asarray(channelize(jnp.asarray(x), proto, N, oversample=2))
        assert y.shape[0] == 2 * n // N
        powers = (np.abs(y[kp * 4:]) ** 2).mean(axis=0)
        assert np.argmax(powers) == c, powers
        seg = y[kp * 4:, c]
        dphi = np.angle(seg[1:] * np.conj(seg[:-1])).mean() / (2 * np.pi)
        # output rate is 2*fs/N -> tone appears at delta/2
        assert abs(dphi - delta / 2) < 2e-3, (dphi, delta / 2)

    def test_even_rows_match_critical(self):
        """os=2 rows at even t hit the same commutator positions as the
        critically-sampled bank (twiddle = 1 there), so y_os2[::2] must
        equal channelize(..., oversample=1) to matmul precision."""
        N = 16
        proto = design_channelizer_taps(N, 8)
        kp = -(-len(proto) // N)
        n = 2048
        rng = np.random.RandomState(7)
        x = (rng.randn(n + kp * N) + 1j * rng.randn(n + kp * N)).astype(
            np.complex64)
        y1 = np.asarray(channelize(jnp.asarray(x), proto, N))
        y2 = np.asarray(channelize(jnp.asarray(x), proto, N, oversample=2))
        assert y2.shape == (2 * (n // N), N)
        np.testing.assert_allclose(y2[::2], y1, rtol=0, atol=2e-5)

    def test_bf16_modes_close(self):
        """Oversampled path honors the precision arg: bf16x3 ~exact,
        single-pass bf16 within its documented ~48 dB envelope."""
        N = 16
        proto = design_channelizer_taps(N, 8)
        kp = -(-len(proto) // N)
        n = 2048
        rng = np.random.RandomState(3)
        x = (rng.randn(n + kp * N) + 1j * rng.randn(n + kp * N)).astype(
            np.complex64)
        ref = np.asarray(channelize(jnp.asarray(x), proto, N, oversample=2))
        scale = np.abs(ref).mean()
        y3 = np.asarray(channelize(jnp.asarray(x), proto, N, oversample=2,
                                   precision="bf16x3"))
        assert np.abs(y3 - ref).max() / scale < 1e-4
        y1 = np.asarray(channelize(jnp.asarray(x), proto, N, oversample=2,
                                   precision="bf16"))
        assert np.abs(y1 - ref).max() / scale < 0.05


class TestArbResampler:
    @pytest.mark.parametrize("rate", [Fraction(3, 2), Fraction(2, 3),
                                      Fraction(147, 160), Fraction(5, 4)])
    def test_tone_fidelity(self, rate):
        """Resampled tone keeps its absolute frequency: f_out = f_in/rate
        cycles/output-sample."""
        fs_in = 1.0
        f = 0.05
        taps = design_arb_resampler_taps(float(rate))
        kp = polyphase_taps(taps, 32).shape[1]
        n = 6000 - 6000 % rate.denominator
        x = tone(f, n + kp - 1)
        y = np.asarray(arb_resample(jnp.asarray(x), taps, rate))
        assert len(y) == int(n * rate)
        seg = y[200:-200]
        dphi = np.angle(seg[1:] * np.conj(seg[:-1])).mean() / (2 * np.pi)
        assert abs(dphi - f / float(rate)) < 1e-4, dphi
        # amplitude preserved
        assert abs(np.abs(seg).mean() - 1.0) < 0.05

    def test_vs_scipy_resample(self):
        import scipy.signal as sig

        rate = Fraction(7, 5)
        taps = design_arb_resampler_taps(float(rate))
        kp = polyphase_taps(taps, 32).shape[1]
        rng = np.random.RandomState(5)
        n = 4000
        # bandlimited real signal
        base = rng.randn(n)
        b = sig.firwin(101, 0.25)
        xs = sig.lfilter(b, [1], base).astype(np.float32)
        x = jnp.concatenate([jnp.zeros(kp - 1, jnp.complex64),
                             jnp.asarray(xs.astype(np.complex64))])
        y = np.asarray(arb_resample(x, taps, rate)).real
        ref = sig.resample_poly(xs, 7, 5)
        # align (group delay ~ (kp-1)/2 input samples * rate)
        best = 1e9
        for lag in range(0, 64):
            m = min(len(y) - lag, len(ref)) - 400
            a = ref[200: 200 + m]
            bb = y[lag + 200: lag + 200 + m]
            g = np.dot(bb, a) / max(np.dot(bb, bb), 1e-12)
            nmse = ((a - g * bb) ** 2).mean() / (a ** 2).mean()
            best = min(best, nmse)
        assert best < 0.01, best


class TestPfbBlocks:
    def test_channelizer_block_in_graph(self):
        from grtpu import Graph, StreamExecutor
        from grtpu.runtime.block import Port
        from grtpu.blocks.pfb import PfbChannelizer
        from grtpu.blocks.gengen import VectorSink

        N = 4
        blk = PfbChannelizer(N)
        g = Graph()
        pin = g.add_input(Port(jnp.complex64))
        sink = VectorSink(jnp.complex64, vlen=N)
        g.connect(pin, blk, sink)
        ex = StreamExecutor(g, chunk_size=1024)
        f = 1 / N + 0.005
        x = tone(f, 4096)
        ex.run(jnp.asarray(x))
        y = sink.data()
        assert y.shape == (1024, N)
        p = (np.abs(y[200:]) ** 2).mean(axis=0)
        assert np.argmax(p) == 1

    def test_arb_resampler_block(self):
        from grtpu import Graph, StreamExecutor
        from grtpu.runtime.block import Port
        from grtpu.blocks.pfb import PfbArbResampler
        from grtpu.blocks.gengen import VectorSink

        blk = PfbArbResampler(0.75, dtype=jnp.complex64)
        assert blk.interp == 3 and blk.decim == 4
        g = Graph()
        pin = g.add_input(Port(jnp.complex64))
        sink = VectorSink(jnp.complex64)
        g.connect(pin, blk, sink)
        ex = StreamExecutor(g, chunk_size=1024)
        x = tone(0.05, 4096)
        ex.run(jnp.asarray(x))
        y = sink.data()
        assert len(y) == 3072
        seg = y[200:-200]
        dphi = np.angle(seg[1:] * np.conj(seg[:-1])).mean() / (2 * np.pi)
        assert abs(dphi - 0.05 / 0.75) < 1e-3

    def test_pfb_clock_sync_bpsk(self):
        """RRC BPSK at sps=4 with timing offset: recovered symbols match."""
        from grtpu.blocks.pfb import pfb_clock_sync, pfb_clock_sync_init
        from grtpu.utils import firdes
        from grtpu.ops.fir import interp_fir_filter as ifir

        sps, nfilts, nsym = 4, 32, 1000
        rng = np.random.RandomState(11)
        bits = rng.randint(0, 2, nsym) * 2 - 1
        tx_rrc = firdes.root_raised_cosine(sps, sps, 1.0, 0.35, 11 * sps)
        kpt = -(-len(tx_rrc) // sps)
        xh = jnp.concatenate([jnp.zeros(kpt - 1, jnp.complex64),
                              jnp.asarray((bits + 0j).astype(np.complex64))])
        wave = np.asarray(ifir(xh, jnp.asarray(tx_rrc), sps))
        # fractional timing offset
        t = np.arange(len(wave))
        wave = (np.interp(t - 1.3, t, wave.real)
                + 1j * np.interp(t - 1.3, t, wave.imag)).astype(np.complex64)
        # matched filter bank prototype at nfilts phases
        # prototype: matched RRC at nfilts x the input rate
        mf = firdes.root_raised_cosine(nfilts, nfilts * sps, 1.0,
                                       0.35, 11 * sps * nfilts)
        st = pfb_clock_sync_init(nfilts)
        ys, n_valid, _ = pfb_clock_sync(jnp.asarray(wave), st, float(sps),
                                        mf, nfilts, 2 * np.pi / 100)
        got = np.sign(np.asarray(ys.real)[: int(n_valid)])
        best = 0
        for off in range(4):
            m = min(len(got) - off, nsym) - 200
            acc = max((got[off + 200: off + 200 + m] == bits[200: 200 + m]).mean(),
                      (got[off + 200: off + 200 + m] == -bits[200: 200 + m]).mean())
            best = max(best, acc)
        assert best > 0.98, best


class TestWindowedPfbClockSync:
    def test_bit_exact_vs_loop(self):
        import jax.numpy as jnp
        from grtpu.blocks.pfb import (
            pfb_clock_sync, pfb_clock_sync_init, pfb_clock_sync_windowed,
            pfb_clock_sync_windowed_init)
        from grtpu.utils import firdes
        rng = np.random.default_rng(0)
        sps, nfilts, nsym = 4, 32, 800
        taps = firdes.root_raised_cosine(nfilts, nfilts * sps, 1.0, 0.35,
                                         11 * sps * nfilts)
        syms = ((rng.integers(0, 2, nsym) * 2 - 1)
                + 1j * (rng.integers(0, 2, nsym) * 2 - 1)) / np.sqrt(2)
        up = np.zeros(nsym * sps, np.complex128)
        up[::sps] = syms
        h = firdes.root_raised_cosine(1.0, sps, 1.0, 0.35, 11 * sps)
        x = np.convolve(up, h, "same")
        # small fractional resample = timing offset
        t = np.arange(0, len(x) - 2, 1.0001)
        fr = t % 1
        x = ((1 - fr) * x[t.astype(int)] + fr * x[t.astype(int) + 1]
             ).astype(np.complex64)

        st = pfb_clock_sync_init(nfilts)
        ys, nv, _ = pfb_clock_sync(jnp.asarray(x), st, float(sps), taps,
                                   nfilts, 0.06)
        ref = np.asarray(ys)[:int(nv)]

        W = 32
        xw = np.concatenate([np.zeros(W, np.complex64), x])
        stw = pfb_clock_sync_windowed_init(nfilts)
        got, _ = pfb_clock_sync_windowed(jnp.asarray(xw), stw, sps, taps,
                                         nfilts, 0.06, W=W)
        got = np.asarray(got)
        n = min(len(ref), len(got))
        assert n > 600
        assert np.abs(ref[:n] - got[:n]).max() < 1e-5


class TestWindowedPfbClockSyncFractional:
    @pytest.mark.slow
    def test_matches_loop_fractional_sps(self):
        """Fractional sps (the reference float contract,
        gr_pfb_clock_sync_ccf.cc): windowed rows on the floor grid track
        the exact loop's float pointer, base_t = t*sps + integer slips."""
        import jax.numpy as jnp
        from grtpu.blocks.pfb import (
            pfb_clock_sync, pfb_clock_sync_init, pfb_clock_sync_windowed,
            pfb_clock_sync_windowed_init)
        from grtpu.utils import firdes
        rng = np.random.default_rng(1)
        sps, nfilts, nsym = 4.25, 32, 800
        taps = firdes.root_raised_cosine(nfilts, nfilts * sps, 1.0, 0.35,
                                         int(11 * sps) * nfilts)
        syms = ((rng.integers(0, 2, nsym) * 2 - 1)
                + 1j * (rng.integers(0, 2, nsym) * 2 - 1)) / np.sqrt(2)
        gen_sps = 5
        up = np.zeros(nsym * gen_sps, np.complex128)
        up[::gen_sps] = syms
        h = firdes.root_raised_cosine(1.0, gen_sps, 1.0, 0.35, 11 * gen_sps)
        x0 = np.convolve(up, h, "same")
        t = np.arange(0, len(x0) - 2, gen_sps / sps)
        fr = t % 1
        x = ((1 - fr) * x0[t.astype(int)] + fr * x0[t.astype(int) + 1]
             ).astype(np.complex64)

        st = pfb_clock_sync_init(nfilts)
        ys, nv, _ = pfb_clock_sync(jnp.asarray(x), st, sps, taps,
                                   nfilts, 0.06)
        ref = np.asarray(ys)[:int(nv)]

        W = 32
        xw = np.concatenate([np.zeros(W, np.complex64), x,
                             np.zeros(2 * W, np.complex64)])
        stw = pfb_clock_sync_windowed_init(nfilts)
        got, _ = pfb_clock_sync_windowed(jnp.asarray(xw), stw, sps, taps,
                                         nfilts, 0.06, W=W)
        got = np.asarray(got)
        n = min(len(ref), len(got))
        assert n > 600
        assert np.abs(ref[:n] - got[:n]).max() < 1e-5


class TestChannelizerPrecisionModes:
    def test_bf16x3_matches_f32(self):
        """Split-word channelizer == exact channelizer within ~1e-5."""
        from grtpu.ops.pfb import channelize, design_channelizer_taps

        N = 16
        proto = design_channelizer_taps(N, 8)
        kp = -(-len(proto) // N)
        rng = np.random.RandomState(2)
        n = N * 64
        x = (rng.randn(n + kp * N)
             + 1j * rng.randn(n + kp * N)).astype(np.complex64)
        ya = np.asarray(channelize(jnp.asarray(x), proto, N))
        yb = np.asarray(channelize(jnp.asarray(x), proto, N,
                                   precision="bf16x3"))
        assert np.abs(ya - yb).max() / np.abs(ya).max() < 2e-5


class TestChannelizerBf16SinglePass:
    def test_bf16_mode_snr(self):
        """Single-pass bf16 channelizer: ~50 dB vs exact — the fast mode
        for chains whose demods lock far below that."""
        from grtpu.ops.pfb import channelize, design_channelizer_taps

        N = 16
        proto = design_channelizer_taps(N, 8)
        kp = -(-len(proto) // N)
        rng = np.random.RandomState(3)
        n = N * 128
        x = (rng.randn(n + kp * N)
             + 1j * rng.randn(n + kp * N)).astype(np.complex64)
        import jax.numpy as jnp
        ya = np.asarray(channelize(jnp.asarray(x), proto, N,
                                   precision="f32"))
        yb = np.asarray(channelize(jnp.asarray(x), proto, N,
                                   precision="bf16"))
        snr = 10 * np.log10((np.abs(ya) ** 2).sum()
                            / (np.abs(ya - yb) ** 2).sum())
        assert snr > 45.0
