"""OFDM stack: mapper, cyclic prefix, sync, frame acquisition, frame sink.

Analogs (the dmr fork's headline modification, SURVEY.md §2.7):
  * digital_ofdm_mapper_bcv — bits -> occupied-subcarrier symbol vectors.
  * digital_ofdm_insert_preamble / digital_ofdm_cyclic_prefixer.
  * ofdm_sync_pn.py — Schmidl&Cox-style autocorrelation timing/CFO sync
    from a repeated-half PN preamble.
  * digital_ofdm_sampler — symbol-aligned FFT-window extraction.
  * digital_ofdm_frame_acquisition (lib/digital_ofdm_frame_acquisition.cc:
    122-223) — coarse carrier alignment + per-subcarrier channel estimate
    from the known preamble + one-tap equalization.
  * digital_ofdm_frame_sink (lib/digital_ofdm_frame_sink.cc:422-423) —
    demap; THE FORK'S FEATURE: exports the per-subcarrier channel
    estimates alongside the demodulated data (apurv++ outputs).

TPU-native: the whole receive chain is batched over OFDM symbols — the
timing metric is one vectorized autocorrelation, FFTs are XLA batched FFTs,
equalization is elementwise over the (nsymbols, ncarriers) grid.  Burst
(packet) processing as pure jitted functions, like grtpu.digital.modems.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class OfdmParams(NamedTuple):
    fft_len: int = 64
    cp_len: int = 16
    occupied_carriers: Tuple[int, ...] = ()  # logical indices (+-)
    mod_order: int = 4  # QPSK mapping on carriers


def default_carriers(fft_len: int = 64, occupied: int = 48) -> np.ndarray:
    """Symmetric band of occupied carriers, skipping DC (ofdm.py default
    layout: zeros_on_left + occupied_tones centered)."""
    half = occupied // 2
    neg = np.arange(-half, 0)
    pos = np.arange(1, half + 1)
    return np.concatenate([neg, pos])  # logical carrier indices


def carrier_bins(carriers: np.ndarray, fft_len: int) -> np.ndarray:
    return np.where(carriers < 0, carriers + fft_len, carriers).astype(np.int64)


class OfdmModem:
    """Burst OFDM modem with Schmidl&Cox sync + preamble channel estimation.

    Frame = [sync preamble (repeated-half PN) | known preamble | data syms].
    """

    def __init__(self, fft_len: int = 64, cp_len: int = 16,
                 occupied: int = 48, mod_order: int = 4, seed: int = 17):
        self.fft_len = fft_len
        self.cp_len = cp_len
        self.carriers = default_carriers(fft_len, occupied)
        self.bins = carrier_bins(self.carriers, fft_len)
        self.occupied = occupied
        self.mod_order = mod_order
        self.bits_per_sym = int(np.log2(mod_order))
        rng = np.random.RandomState(seed)
        # sync preamble: PN on even logical carriers -> time-domain signal
        # with two identical halves (Schmidl & Cox)
        pn = (2 * rng.randint(0, 2, occupied) - 1).astype(np.float32)
        sync_freq = np.zeros(fft_len, np.complex64)
        even_mask = self.bins % 2 == 0  # energy on even FFT bins only ->
        # time-domain symbol has two identical halves (Schmidl & Cox)
        sync_freq[self.bins[even_mask]] = (
            pn[even_mask] * np.sqrt(2)).astype(np.complex64)
        self.sync_time = np.fft.ifft(sync_freq).astype(np.complex64)
        # channel-estimation preamble: known QPSK on every occupied carrier
        s = 1 / np.sqrt(2)
        cpts = np.array([s * (1 + 1j), s * (-1 + 1j), s * (-1 - 1j),
                         s * (1 - 1j)], np.complex64)
        self.known_idx = rng.randint(0, 4, occupied)
        self.known = cpts[self.known_idx]
        self.qpsk = cpts

    # ----------------------------------------------------------------- mod
    def _with_cp(self, time_syms: jnp.ndarray) -> jnp.ndarray:
        """(nsym, fft_len) -> flattened stream with cyclic prefixes
        (digital_ofdm_cyclic_prefixer)."""
        cp = time_syms[:, -self.cp_len:]
        return jnp.concatenate([cp, time_syms], axis=1).reshape(-1)

    def modulate(self, bits: np.ndarray) -> jnp.ndarray:
        """bits -> burst samples (preambles + data symbols, all CP'd)."""
        bits = np.asarray(bits, np.uint8)
        k = self.bits_per_sym
        per_sym = self.occupied * k
        nsym = -(-len(bits) // per_sym)
        pad = nsym * per_sym - len(bits)
        b = np.concatenate([bits, np.zeros(pad, np.uint8)])
        pts = b.reshape(nsym, self.occupied, k)
        idx = np.zeros((nsym, self.occupied), np.int64)
        for j in range(k):
            idx = (idx << 1) | pts[:, :, j]
        sym = self.qpsk[idx] if self.mod_order == 4 else \
            np.where(idx == 1, 1.0, -1.0).astype(np.complex64)
        freq = np.zeros((nsym, self.fft_len), np.complex64)
        freq[:, self.bins] = sym
        data_time = np.fft.ifft(freq, axis=1).astype(np.complex64)
        known_freq = np.zeros((1, self.fft_len), np.complex64)
        known_freq[0, self.bins] = self.known
        known_time = np.fft.ifft(known_freq, axis=1).astype(np.complex64)
        frames = np.concatenate(
            [self.sync_time[None, :], known_time, data_time], axis=0)
        return self._with_cp(jnp.asarray(frames))

    # --------------------------------------------------------------- sync
    def sync_metric(self, x: jnp.ndarray) -> jnp.ndarray:
        """Schmidl&Cox timing metric |P(d)|^2 / R(d)^2 (ofdm_sync_pn.py):
        P = autocorrelation at lag L/2 over a window of L/2."""
        L = self.fft_len
        h = L // 2
        n = x.shape[0]
        prod = x[h:] * jnp.conj(x[:-h])
        pw = jnp.abs(x[h:]) ** 2
        cs = jnp.cumsum(prod)
        cs = jnp.concatenate([jnp.zeros(1, cs.dtype), cs])
        P = cs[h:] - cs[:-h]
        ce = jnp.cumsum(pw)
        ce = jnp.concatenate([jnp.zeros(1, ce.dtype), ce])
        R = jnp.real(ce[h:] - ce[:-h])
        # gate low-energy regions: at burst edges R -> 0 faster than |P|,
        # which would send the ratio above 1 (false peaks)
        gate = R > 0.1 * jnp.max(R)
        m = jnp.where(gate, (jnp.abs(P) ** 2) / jnp.maximum(R ** 2, 1e-12),
                      0.0)
        return m, P

    def _acquire(self, x: jnp.ndarray):
        """Timing + fine CFO from the sync preamble (jit-friendly)."""
        metric, P = self.sync_metric(x)
        L, h = self.fft_len, self.fft_len // 2
        search = metric[: x.shape[0] - 3 * L]
        mx = jnp.max(search)
        # S&C metric plateaus over the sync CP; take the plateau START
        # (first index within 90% of the peak) = CP start of the frame
        d = jnp.argmax(search > 0.9 * mx).astype(jnp.int32)
        d_pk = jnp.argmax(search).astype(jnp.int32)
        # fractional CFO in radians/sample from the lag-h autocorrelation
        cfo_rad = jnp.angle(P[d_pk]) / h
        return d, cfo_rad

    # --------------------------------------------------------------- demod
    def demodulate(self, x, nsym_data: int):
        """Burst receive: sync, CFO-correct, FFT, channel-estimate from the
        known preamble, equalize, demap.

        Returns (bits, channel_estimate, cfo_rad, start_index) — channel
        estimate exported per the fork's frame-sink extension
        (digital_ofdm_frame_sink.cc:422-423).
        """
        x = jnp.asarray(x)
        d, cfo = self._acquire(x)
        n = x.shape[0]
        # derotate
        xr = x * jnp.exp(-1j * cfo * jnp.arange(n))
        # d = frame CP start; symbol i's FFT window nominally begins at
        # d + cp + i*sym_len; back off half a CP so timing error stays
        # ISI-free (the residual circular shift is a per-bin phase ramp
        # common to all symbols, absorbed by the channel estimate)
        sym_len = self.fft_len + self.cp_len
        start = d + self.cp_len - self.cp_len // 2
        nsym_total = nsym_data + 2

        def window(i):
            return jax.lax.dynamic_slice_in_dim(
                xr, start + i * sym_len, self.fft_len)

        wins = jnp.stack([window(i) for i in range(nsym_total)])
        F = jnp.fft.fft(wins, axis=1)
        # mid-CP anchor introduces a known per-bin phase ramp; fold it into
        # the channel estimate (flat across the frame)
        occ = F[:, jnp.asarray(self.bins)]
        chan = occ[1] / jnp.asarray(self.known)  # per-carrier complex gain
        data = occ[2:] / jnp.maximum(jnp.abs(chan), 1e-9) / jnp.exp(
            1j * jnp.angle(chan))
        # residual-CFO tracking: per-symbol decision-directed common-phase
        # loop (the frame sink's phase tracking; without it the CFO
        # estimation noise integrates across the burst)
        pts = jnp.asarray(self.qpsk)

        def track(phase, row):
            r = row * jnp.exp(-1j * phase)
            dec = jnp.argmin(jnp.abs(r[:, None] - pts[None, :]) ** 2, axis=1)
            ref = pts[dec]
            err = jnp.angle(jnp.sum(r * jnp.conj(ref)))
            return phase + err, r * jnp.exp(-1j * err)

        _, data = jax.lax.scan(track, jnp.zeros((), jnp.float32), data)
        # demap QPSK (gray-free direct 2-bit mapping as in modulate)
        d2 = jnp.abs(data[..., None] - pts[None, None, :]) ** 2
        idx = jnp.argmin(d2, axis=-1)
        b1 = (idx >> 1) & 1
        b0 = idx & 1
        bits = jnp.stack([b1, b0], axis=-1).reshape(nsym_data, -1)
        return bits.reshape(-1).astype(jnp.uint8), chan, cfo, d


def ofdm_frame_acquisition(symbols: jnp.ndarray, known: jnp.ndarray,
                           bins: np.ndarray):
    """Standalone analog of digital_ofdm_frame_acquisition: given FFT'd
    symbol vectors (first = known preamble), estimate per-carrier channel
    and equalize the rest.  Returns (equalized, channel_estimate)."""
    occ = symbols[:, jnp.asarray(bins)]
    chan = occ[0] / known
    eq = occ[1:] * jnp.conj(chan) / jnp.maximum(jnp.abs(chan) ** 2, 1e-12)
    return eq, chan
