"""NOAA HRPT receive chain golden tests (gr-noaa parity).

Covers HrptPll (loop recurrence vs a per-sample reference recurrence,
noaa_hrpt_pll_cf.cc:60-83), HrptDeframer (biphase stream -> word-exact
minor frames, chunked == full-stream, noaa_hrpt_deframer.cc:69-131) and
HrptDecoder.report() telemetry fields (noaa_hrpt_decoder.cc process_*).
"""

import numpy as np
import jax.numpy as jnp

from grtpu.models import noaa

RNG = np.random.RandomState(7)
NW = noaa.HRPT_MINOR_FRAME_WORDS


def make_frame(mfnum, addr=13, day=200, ms=12345678):
    w = RNG.randint(0, 1024, NW).astype(np.int64)
    w[:6] = noaa.HRPT_SYNC_WORDS
    w[6] = (mfnum << 7) | (addr << 3) | (w[6] & 0x7)
    w[8] = (day << 1) | (w[8] & 1)
    w[9] = (w[9] & 0x380) | ((ms >> 20) & 0x7F)
    w[10] = (ms >> 10) & 0x3FF
    w[11] = ms & 0x3FF
    return w


def biphase(bits):
    """bit b -> (~b, b): guaranteed mid-bit transition, second half is
    the bit value — the 2-sample/bit stream the deframer consumes."""
    out = np.empty(2 * len(bits), np.uint8)
    out[0::2] = 1 - bits
    out[1::2] = bits
    return out


class TestHrptDeframer:
    def _stream(self, frames, lead=37, tail=10):
        words = np.concatenate(frames)
        bits = noaa.encode_words(words)
        return words, np.concatenate([
            RNG.randint(0, 2, lead).astype(np.uint8),
            biphase(bits),
            np.zeros(tail, np.uint8)])

    def test_word_exact_and_chunked(self):
        """Two back-to-back frames (exercises idle->synced->idle->synced
        re-acquisition) recovered word-exact, full-stream; chunked run is
        identical (CPU scan is slow at 880k samples, so one shared
        stream covers both properties)."""
        words, stream = self._stream([make_frame(1), make_frame(2)])
        blk = noaa.HrptDeframer()
        _, (y, n) = blk.apply(blk.init_state(), jnp.asarray(stream))
        assert int(n) == 2 * NW
        got = np.asarray(y)[: int(n)].astype(np.int64) & 0x3FF
        np.testing.assert_array_equal(got, words)

        st = blk.init_state()
        parts = []
        csize = 1 << 17
        for i in range(0, len(stream), csize):
            st, (yc, nc) = blk.apply(st, jnp.asarray(stream[i:i + csize]))
            parts.append(np.asarray(yc)[: int(nc)])
        chunked = np.concatenate(parts).astype(np.int64) & 0x3FF
        np.testing.assert_array_equal(chunked, words)

    def test_decoder_report(self):
        frames = [make_frame(1, addr=13, day=123, ms=4242424),
                  make_frame(2, addr=13, day=123, ms=4242424)]
        blk = noaa.HrptDecoder()
        blk.captured = (np.concatenate(frames).astype(np.int16),)
        rep = blk.report()
        assert rep["frames_seen"] == 2
        assert rep["seq_errs"] == 0          # MF1 -> MF2 is in sequence
        assert rep["address"] == 13
        assert rep["spacecraft"] == "NOAA18"  # hrpt_ids[13]
        assert rep["day_of_year"] == 123
        assert rep["milliseconds"] == 4242424
        assert rep["mfnums"] == [1, 2]

    def test_decoder_sequence_error(self):
        frames = [make_frame(1), make_frame(3)]  # MF1 -> MF3 skips MF2
        blk = noaa.HrptDecoder()
        blk.captured = (np.concatenate(frames).astype(np.int16),)
        assert blk.report()["seq_errs"] == 1


class TestHrptPll:
    def test_matches_reference_recurrence(self):
        """Loop state vs a literal per-sample recurrence of the reference
        update equations (noaa_hrpt_pll_cf.cc:60-83)."""
        n = 512
        fo = 0.02
        data = np.sign(RNG.randn(n)).astype(np.float32)
        ph = np.cumsum(np.full(n, fo)) + 0.6 * data
        x = np.exp(1j * ph).astype(np.complex64)

        alpha, beta, moff = 0.05, 0.05 ** 2 / 4, 0.1
        blk = noaa.HrptPll(alpha=alpha, max_offset=moff)
        _, y = blk.apply(blk.init_state(), jnp.asarray(x))

        def wrap(p):
            return (p + np.pi) % (2 * np.pi) - np.pi

        phase = freq = 0.0
        ref = np.zeros(n, np.float32)
        for i, xi in enumerate(x):
            ref[i] = np.imag(xi * np.exp(-1j * phase))
            err = wrap(np.angle(xi) - phase)
            freq = np.clip(freq + beta * err, -moff, moff)
            phase = wrap(phase + alpha * err + freq)
        np.testing.assert_allclose(np.asarray(y), ref, atol=3e-5)

    def test_tracks_and_demodulates(self):
        """After acquisition, PLL output sign recovers the PM data."""
        n = 4000
        data = np.sign(RNG.randn(n)).astype(np.float32)
        ph = np.cumsum(np.full(n, 0.01)) + 0.7 * data
        x = np.exp(1j * ph).astype(np.complex64)
        blk = noaa.HrptPll(alpha=0.05)
        _, y = blk.apply(blk.init_state(), jnp.asarray(x))
        tail = np.asarray(y)[1000:]
        agree = (np.sign(tail) == data[1000:]).mean()
        assert agree > 0.98
