"""Adaptive equalizers: CMA, LMS decision-directed, kurtotic.

Analogs (gr-digital, SURVEY.md §2.7): digital_cma_equalizer_cc,
digital_lms_dd_equalizer_cc, digital_kurtotic_equalizer_cc — all built on
gr_adaptive_fir_ccc (per-output tap update).

TPU-native: the tap-update recurrence is a lax.scan carrying the tap
vector; each step is one K-tap dot + rank-1 update (VPU).  Sample-rate
operation (sps=1 after matched filtering / decimation), like the reference
blocks' typical use.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from grtpu.runtime.block import Block, Port
from grtpu.digital.constellation import Constellation


def _window_scan(x, ntaps):
    """Windows w[t] = x[t : t + ntaps] reversed (newest first), built once
    vectorized (the scan then just indexes rows)."""
    n = x.shape[0] - (ntaps - 1)
    idx = jnp.arange(n)[:, None] + jnp.arange(ntaps - 1, -1, -1)[None, :]
    return x[idx]  # (n, ntaps), newest sample first


def cma_equalize(x: jnp.ndarray, taps: jnp.ndarray, modulus: float,
                 mu: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Constant-modulus algorithm (digital_cma_equalizer_cc):
    error = y (|y|^2 - modulus); taps -= mu * err * conj(window)
    (the Wirtinger steepest-descent direction for y = taps . window).

    x carries ntaps-1 history samples.  Returns (y, taps')."""
    ntaps = taps.shape[0]
    wins = _window_scan(x, ntaps)

    def f(tp, w):
        y = (tp * w).sum()
        err = y * (jnp.abs(y) ** 2 - modulus)
        tp2 = tp - mu * err * jnp.conj(w)
        return tp2, y

    taps2, y = jax.lax.scan(f, taps, wins)
    return y.astype(jnp.complex64), taps2


def lms_dd_equalize(x: jnp.ndarray, taps: jnp.ndarray,
                    points: jnp.ndarray, mu: float):
    """Decision-directed LMS (digital_lms_dd_equalizer_cc):
    error = decision(y) - y; taps += mu * err * conj(window)."""
    ntaps = taps.shape[0]
    wins = _window_scan(x, ntaps)

    def f(tp, w):
        y = (tp * w).sum()
        d = points[jnp.argmin(jnp.abs(y - points) ** 2)]
        err = d - y
        tp2 = tp + mu * err * jnp.conj(w)
        return tp2, y

    taps2, y = jax.lax.scan(f, taps, wins)
    return y.astype(jnp.complex64), taps2


def kurtotic_equalize(x: jnp.ndarray, taps: jnp.ndarray, mu: float,
                      stats: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]):
    """Kurtosis-maximizing blind equalizer (digital_kurtotic_equalizer_cc):
    running moments (p = E|y|^2, q = E y^2, m4 = E|y|^4) drive the error."""
    ntaps = taps.shape[0]
    wins = _window_scan(x, ntaps)
    alpha = 0.01

    def f(carry, w):
        tp, p, q, m4 = carry
        y = (tp * w).sum()
        ay2 = jnp.abs(y) ** 2
        p = (1 - alpha) * p + alpha * ay2
        q = (1 - alpha) * q + alpha * y * y
        m4 = (1 - alpha) * m4 + alpha * ay2 * ay2
        ku = m4 - 2 * p * p - jnp.abs(q) ** 2
        err = jnp.sign(ku) * (ay2 * y - p * y - jnp.conj(q) * jnp.conj(y))
        tp2 = tp - mu * err * jnp.conj(w)
        return (tp2, p, q, m4), y

    (taps2, p, q, m4), y = jax.lax.scan(f, (taps, *stats), wins)
    return y.astype(jnp.complex64), taps2, (p, q, m4)


def center_spike_taps(ntaps: int) -> np.ndarray:
    t = np.zeros(ntaps, np.complex64)
    t[ntaps // 2] = 1.0
    return t


class CmaEqualizer(Block):
    """digital_cma_equalizer_cc block wrapper (sps=1)."""

    def __init__(self, num_taps: int = 11, modulus: float = 1.0,
                 mu: float = 0.01, name=None):
        self.in_ports = (Port(jnp.complex64),)
        self.out_ports = (Port(jnp.complex64),)
        self.history = num_taps
        super().__init__(name)
        self.num_taps, self.modulus, self.mu = num_taps, modulus, mu

    def init_state(self):
        return jnp.asarray(center_spike_taps(self.num_taps))

    def apply(self, state, x):
        y, taps = cma_equalize(x, state, self.modulus, self.mu)
        return taps, y


class LmsDdEqualizer(Block):
    """digital_lms_dd_equalizer_cc block wrapper."""

    def __init__(self, constellation: Constellation, num_taps: int = 11,
                 mu: float = 0.01, name=None):
        self.in_ports = (Port(jnp.complex64),)
        self.out_ports = (Port(jnp.complex64),)
        self.history = num_taps
        super().__init__(name)
        self.points = np.asarray(constellation.points, np.complex64)
        self.num_taps, self.mu = num_taps, mu

    def init_state(self):
        return jnp.asarray(center_spike_taps(self.num_taps))

    def apply(self, state, x):
        y, taps = lms_dd_equalize(x, state, jnp.asarray(self.points), self.mu)
        return taps, y
