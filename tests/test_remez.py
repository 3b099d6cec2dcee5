"""Own Parks-McClellan engine vs scipy.signal.remez (golden reference).

The gr_remez parity path (gr_remez.cc): grtpu.utils.remez_engine is a
self-contained exchange implementation; scipy (a port of the same classic
program) is the golden oracle here, per repo convention.
"""

import numpy as np
import pytest

from grtpu.utils import remez_engine as re

sig = pytest.importorskip("scipy.signal")


def resp(h, n=8192):
    return np.abs(np.fft.fft(h, n))[: n // 2]


CASES = [
    # (numtaps, bands, desired, weight, type)
    (65, [0, 0.2, 0.25, 0.5], [1, 0], [1, 1], "bandpass"),      # type I LP
    (64, [0, 0.2, 0.25, 0.5], [1, 0], [1, 1], "bandpass"),      # type II LP
    (81, [0, .1, .15, .3, .35, .5], [0, 1, 0], [10, 1, 10],
     "bandpass"),                                               # weighted BP
    (41, [0, 0.22, 0.27, 0.5], [0, 1], [1, 2], "bandpass"),     # HP
    (61, [0.05, 0.45], [1], None, "hilbert"),                   # type III
    (31, [0.02, 0.48], [1], None, "hilbert"),
    (32, [0.0, 0.4], [1], None, "differentiator"),              # type IV
]


class TestVsScipy:
    @pytest.mark.parametrize("n,bands,des,w,ft", CASES)
    def test_matches_scipy(self, n, bands, des, w, ft):
        mine = re.design(n, bands, des, w, ftype=ft)
        kw = {} if ft == "bandpass" else {"type": ft}
        ref = sig.remez(n, bands, des, weight=w, fs=1.0, **kw)
        # both converge to the unique minimax solution: responses agree to
        # well under the ripple level; taps to the convergence tolerance
        assert np.max(np.abs(resp(mine) - resp(ref))) < 2e-3
        assert np.max(np.abs(mine - ref)) < 1e-3

    def test_equiripple_property(self):
        """The defining property, independently of scipy: the weighted
        error alternates with equal magnitude across the bands."""
        h = re.design(65, [0, 0.2, 0.25, 0.5], [1, 0], [1, 1])
        f = np.linspace(0, 0.5, 4096)
        H = np.abs(np.sum(h[None, :]
                          * np.exp(-2j * np.pi * f[:, None]
                                   * np.arange(len(h))[None, :]), axis=1))
        pb = H[f <= 0.2]
        sb = H[f >= 0.25]
        dp = max(pb.max() - 1, 1 - pb.min())
        ds = sb.max()
        # equal ripple across equally-weighted bands
        assert abs(dp - ds) < 0.05 * ds
        # the passband error actually touches the bound several times
        crossings = np.sum(np.abs(np.diff(np.sign(pb - 1))) > 0)
        assert crossings >= 10


class TestGrApi:
    def test_pm_remez_edge_pairs(self):
        """gr_remez.h:42-58: edges normalized to Fs=1, desired PER EDGE,
        linearly interpolated across the band."""
        h = re.pm_remez(64, [0, 0.4, 0.5, 1.0], [1, 1, 0, 0], [1, 1])
        ref = sig.remez(65, [0, 0.2, 0.25, 0.5], [1, 0], weight=[1, 1],
                        fs=1.0)
        assert np.max(np.abs(h - ref)) < 1e-3

    def test_sloped_band(self):
        """A band with different edge amplitudes designs a sloped
        response (the per-edge desired the scipy surface can't express)."""
        h = re.pm_remez(100, [0, 0.8, 0.9, 1.0], [1.0, 0.5, 0, 0], [1, 1])
        f = np.linspace(0, 0.4, 512)
        H = np.abs(np.sum(h[None, :]
                          * np.exp(-2j * np.pi * f[:, None]
                                   * np.arange(len(h))[None, :]), axis=1))
        want = 1.0 + (0.5 - 1.0) * f / 0.4
        assert np.max(np.abs(H - want)) < 0.02

    def test_too_few_taps_raises(self):
        with pytest.raises(ValueError):
            re.design(1, [0.05, 0.45], [1], ftype="hilbert")
        with pytest.raises(ValueError):
            re.design(31, [0, 0.2, 0.25, 0.5], [1, 0], ftype="nonsense")


class TestOptfirUsesOwnEngine:
    def test_low_pass_meets_spec(self):
        from grtpu.utils import optfir
        taps = optfir.low_pass(1.0, 1.0, 0.18, 0.24, 0.2, 50)
        H = resp(np.asarray(taps, np.float64))
        f = np.arange(len(H)) / (2 * len(H))
        sb = H[f >= 0.24]
        assert 20 * np.log10(sb.max()) < -49.0
        pb = H[f <= 0.18]
        assert np.max(np.abs(20 * np.log10(pb))) < 0.25
