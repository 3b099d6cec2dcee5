"""MMSE fractional-delay interpolator bank.

Analog of gri_mmse_fir_interpolator(_cc) (gnuradio-core/src/lib/filter/
gri_mmse_fir_interpolator.{cc,h}, interpolator_taps.h:7-9): an 8-tap,
128(+1)-phase precomputed filter bank giving samples at fractional delays,
used by clock recovery and fractional resampling.

The reference ships a numerically-optimized constant table; here the bank is
*designed at import time* by least-squares fractional-delay fitting (minimize
passband error vs the ideal delay response over [0, 0.8*pi]), which is the
same MMSE criterion.  8 taps x 129 phases, float32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NTAPS = 8
NSTEPS = 128
_CENTER = NTAPS // 2 - 1  # integer part of the nominal delay (=3)
_BAND = 0.8 * np.pi  # passband edge for the LS fit


@functools.lru_cache(maxsize=1)
def _mmse_table() -> np.ndarray:
    """(NSTEPS+1, NTAPS) least-squares fractional-delay filters.

    Phase p approximates delay d = _CENTER + p/NSTEPS:
        h_p = argmin ∫_0^B |Σ_k h[k] e^{-jwk} - e^{-jwd}|^2 dw
    whose normal equations have closed-form sinc integrals."""
    W = _BAND

    def sint(a):  # ∫_0^W cos(w*a) dw = sin(W*a)/a  (-> W as a -> 0)
        a = np.asarray(a, np.float64)
        out = np.where(np.abs(a) < 1e-12, W, np.sin(W * a) / np.where(a == 0, 1, a))
        return out

    k = np.arange(NTAPS)
    A = sint(k[:, None] - k[None, :])
    bank = np.zeros((NSTEPS + 1, NTAPS), np.float64)
    for p in range(NSTEPS + 1):
        d = _CENTER + p / NSTEPS
        b = sint(k - d)
        bank[p] = np.linalg.solve(A, b)
    return bank.astype(np.float32)


def mmse_taps() -> np.ndarray:
    return _mmse_table()


def mmse_interpolate(x: jnp.ndarray, pos: jnp.ndarray,
                     bank: jnp.ndarray | None = None) -> jnp.ndarray:
    """Sample x at fractional positions.

    pos[i] = continuous-time position (in input samples); uses
    x[floor(pos) .. floor(pos)+7] with the phase filter nearest to
    frac(pos).  Caller guarantees floor(pos)+7 < len(x)."""
    if bank is None:
        bank = jnp.asarray(_mmse_table())
    base = jnp.floor(pos).astype(jnp.int32)
    mu = pos - base
    phase = jnp.round(mu * NSTEPS).astype(jnp.int32)
    idx = base[:, None] + jnp.arange(NTAPS)[None, :]
    windows = x[idx]  # (n, 8) gather
    taps = bank[phase]  # (n, 8)
    if jnp.iscomplexobj(x):
        return (windows * taps).sum(axis=1).astype(x.dtype)
    return (windows * taps).sum(axis=1).astype(x.dtype)


def interpolate_point(x_window: jnp.ndarray, mu: jnp.ndarray,
                      bank: jnp.ndarray) -> jnp.ndarray:
    """Single-point interpolation from an 8-sample window (scan-friendly:
    used inside clock-recovery recurrences).  mu in [0, 1]."""
    phase = jnp.round(mu * NSTEPS).astype(jnp.int32)
    return (x_window * bank[phase]).sum()
