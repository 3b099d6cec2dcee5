"""ATSC 8-VSB codec tests (the qa_atsc.py transport-loopback idiom)."""

import numpy as np
import pytest

from grtpu.models import atsc

RNG = np.random.RandomState(55)


def make_packets(n):
    pk = RNG.randint(0, 256, (n, 188)).astype(np.uint8)
    pk[:, 0] = atsc.MPEG_SYNC
    return pk


class TestRandomizer:
    def test_self_inverse(self):
        pk = make_packets(5)
        r1, r2 = atsc.Randomizer(), atsc.Randomizer()
        white = r1.randomize_packets(pk)
        back = r2.derandomize_packets(white)
        np.testing.assert_array_equal(back, pk)

    def test_whitens(self):
        pk = np.zeros((3, 188), np.uint8)
        pk[:, 0] = atsc.MPEG_SYNC
        white = atsc.Randomizer().randomize_packets(pk)
        # all-zero payload becomes the PRBS itself: roughly balanced bits
        bits = np.unpackbits(white)
        assert 0.4 < bits.mean() < 0.6


class TestInterleaver:
    def test_roundtrip_with_delay(self):
        data = RNG.randint(0, 256, 3000).astype(np.uint8)
        il = atsc.ConvolutionalInterleaver()
        dl = atsc.ConvolutionalDeinterleaver()
        out = dl.process(il.process(data))
        d = atsc.TOTAL_INTERLEAVE_DELAY
        np.testing.assert_array_equal(out[d:], data[: len(data) - d])

    def test_burst_spreading(self):
        """A contiguous byte burst must spread across the deinterleaved
        stream (the whole point: bursts become RS-correctable)."""
        n = 24000
        il = atsc.ConvolutionalInterleaver()
        dl = atsc.ConvolutionalDeinterleaver()
        clean = np.zeros(n, np.uint8)
        il2 = atsc.ConvolutionalInterleaver()
        sent = il2.process(clean.copy())
        corrupted = sent.copy()
        corrupted[12000:12080] ^= 0xFF  # 80-byte burst on the line
        got = dl.process(corrupted)
        errpos = np.nonzero(got != dl.process(sent) * 0)[0]
        # errors spread over a span far exceeding the burst length
        assert errpos.max() - errpos.min() > 2000


class TestTrellis:
    def test_encode_decode_clean(self):
        dib = RNG.randint(0, 4, 12 * 400).astype(np.int32)
        levels, _ = atsc.trellis_encode(dib)
        assert set(np.unique(levels)).issubset(set(atsc.LEVELS))
        dec = atsc.trellis_decode(levels)
        np.testing.assert_array_equal(dec, dib)

    def test_decode_with_noise(self):
        dib = RNG.randint(0, 4, 12 * 600).astype(np.int32)
        levels, _ = atsc.trellis_encode(dib)
        noisy = levels + RNG.randn(len(levels)) * 0.7
        dec = atsc.trellis_decode(noisy)
        ser = (dec != dib).mean()
        assert ser < 0.01, ser

    def test_fsm_matches_reference_tables(self):
        """The derived recursion must reproduce the reference's published
        state machine (atsci_basic_trellis_encoder tables)."""
        f = atsc.atsc_trellis_fsm()
        # spot values read from the standard's trellis (A/53):
        assert f.OS[0, 0] == 0 and f.OS[0, 3] == 6
        assert f.NS[0, 2] == 4  # x2=1 flips precoder bit
        assert f.OS[1, 0] == 1  # z0 = m0
        # precoder: two successive x2=1 inputs return p to 0
        s = 0
        s1 = f.NS[s, 2]
        s2 = f.NS[s1, 2]
        assert (s2 >> 2) & 1 == 0


class TestEndToEnd:
    def test_transport_loopback(self):
        """qa_atsc idiom: packets -> full TX -> channel -> RX -> packets."""
        npk = 16
        pk = make_packets(npk)
        tx = atsc.AtscTransmitter()
        levels = tx.process(pk)
        # flush the interleaver (pipeline delay 10608 bytes ~= 52 segments)
        flush = tx.process(make_packets(56))
        stream = np.concatenate([levels, flush])
        # mild channel noise
        noisy = stream + RNG.randn(len(stream)) * 0.5
        rx = atsc.AtscReceiver()
        packets, bad = rx.process(noisy)
        assert bad == 0
        np.testing.assert_array_equal(packets[:npk], pk)

    def test_burst_error_correction(self):
        """Symbol burst -> interleaver spreads it -> RS corrects."""
        npk = 16
        pk = make_packets(npk)
        tx = atsc.AtscTransmitter()
        levels = tx.process(pk)
        flush = tx.process(make_packets(56))
        stream = np.concatenate([levels, flush]).copy()
        stream[5000:5040] = 7.0  # 40-symbol burst corruption
        rx = atsc.AtscReceiver()
        packets, bad = rx.process(stream)
        assert bad == 0
        np.testing.assert_array_equal(packets[:npk], pk)
