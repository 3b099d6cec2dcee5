"""OFDM stack tests: loopback, sync under CFO, channel-estimate export
(the fork's feature: per-subcarrier channel estimates alongside data)."""

import numpy as np
import jax.numpy as jnp
import pytest

from grtpu.digital.ofdm import OfdmModem, default_carriers, ofdm_frame_acquisition

RNG = np.random.RandomState(21)


def run_loopback(modem, bits, channel=None, pad=200, snr_db=None, cfo=0.0):
    tx = np.asarray(modem.modulate(bits))
    sig = tx
    if channel is not None:
        sig = np.convolve(sig, channel)[: len(sig)]
    if cfo:
        sig = sig * np.exp(1j * cfo * np.arange(len(sig)))
    sig = np.concatenate([np.zeros(pad, np.complex64), sig,
                          np.zeros(pad, np.complex64)])
    if snr_db is not None:
        p = (np.abs(sig[pad:-pad]) ** 2).mean()
        n0 = p / 10 ** (snr_db / 10)
        sig = sig + (RNG.randn(len(sig)) + 1j * RNG.randn(len(sig))) * np.sqrt(n0 / 2)
    per_sym = modem.occupied * modem.bits_per_sym
    nsym = -(-len(bits) // per_sym)
    got, chan, cfo_est, d = modem.demodulate(sig.astype(np.complex64), nsym)
    return np.asarray(got), np.asarray(chan), float(cfo_est), int(d)


class TestOfdmLoopback:
    def test_clean(self):
        m = OfdmModem()
        bits = RNG.randint(0, 2, 5 * 48 * 2).astype(np.uint8)
        got, chan, cfo, d = run_loopback(m, bits)
        assert (got[: len(bits)] == bits).mean() > 0.999
        np.testing.assert_allclose(np.abs(chan), 1.0, atol=0.1)

    def test_noisy(self):
        m = OfdmModem()
        bits = RNG.randint(0, 2, 8 * 48 * 2).astype(np.uint8)
        got, chan, cfo, d = run_loopback(m, bits, snr_db=15)
        ber = (got[: len(bits)] != bits).mean()
        assert ber < 0.01, ber

    def test_cfo_correction(self):
        m = OfdmModem()
        bits = RNG.randint(0, 2, 4 * 48 * 2).astype(np.uint8)
        cfo_true = 0.004  # rad/sample, ~4% subcarrier spacing
        got, chan, cfo_est, d = run_loopback(m, bits, cfo=cfo_true, snr_db=25)
        assert abs(cfo_est - cfo_true) < 5e-4, (cfo_est, cfo_true)
        ber = (got[: len(bits)] != bits).mean()
        assert ber < 0.01, ber

    def test_multipath_channel_estimate(self):
        """The fork's feature: exported channel estimates must match the
        true channel response at the occupied carriers."""
        m = OfdmModem()
        bits = RNG.randint(0, 2, 6 * 48 * 2).astype(np.uint8)
        h = np.array([1.0, 0.0, 0.25 - 0.15j], np.complex64)
        got, chan, cfo, d = run_loopback(m, bits, channel=h, snr_db=30)
        ber = (got[: len(bits)] != bits).mean()
        assert ber < 0.01, ber
        # true channel at the occupied bins
        H = np.fft.fft(h, m.fft_len)[m.bins]
        # the estimate carries an arbitrary common delay/phase ramp from
        # timing; compare magnitudes and relative phase structure
        np.testing.assert_allclose(np.abs(chan), np.abs(H), atol=0.15)

    def test_frame_acquisition_op(self):
        """Standalone frame acquisition (digital_ofdm_frame_acquisition):
        equalized known symbols recover the constellation exactly."""
        m = OfdmModem()
        nsym = 3
        idx = RNG.randint(0, 4, (nsym, m.occupied))
        sym = m.qpsk[idx]
        freq = np.zeros((nsym + 1, m.fft_len), np.complex64)
        freq[0, m.bins] = m.known
        freq[1:, m.bins] = sym
        H = np.fft.fft(np.array([0.9, 0.1j, -0.05], np.complex64), m.fft_len)
        rx = freq * H[None, :]
        eq, chan = ofdm_frame_acquisition(jnp.asarray(rx),
                                          jnp.asarray(m.known), m.bins)
        np.testing.assert_allclose(np.asarray(chan), H[m.bins], atol=1e-4)
        np.testing.assert_allclose(np.asarray(eq), sym, atol=1e-3)


class TestCarrierLayout:
    def test_default_carriers_skip_dc(self):
        c = default_carriers(64, 48)
        assert 0 not in c
        assert len(c) == 48
        assert c.min() == -24 and c.max() == 24
