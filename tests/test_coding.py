"""Coding layer tests: CRC, packets, scramblers, correlators, FEC."""

import numpy as np
import jax.numpy as jnp
import pytest

from grtpu.digital import packet
from grtpu.digital.lfsr import (
    AdditiveScrambler, Descrambler, FibonacciLfsr, GLFSR, GlfsrSource,
    Scrambler,
)
from grtpu.digital.correlate import CorrelateAccessCode, access_code_detect
from grtpu.fec.conv import conv_encode_27, viterbi_decode_27
from grtpu.fec.rs import rs_ccsds, rs_simple

RNG = np.random.RandomState(77)


class TestCrc32:
    def test_known_vector(self):
        """CRC-32/BZIP2 ('123456789' -> 0xFC891918) — same algorithm as
        digital_crc32 (poly 0x04C11DB7, MSB-first, init/final 0xFFFFFFFF)."""
        assert packet.crc32(b"123456789") == 0xFC891918

    def test_append_check_roundtrip(self):
        payload = bytes(RNG.randint(0, 256, 100).astype(np.uint8))
        framed = packet.gen_and_append_crc32(payload)
        ok, msg = packet.check_crc32(framed)
        assert ok and msg == payload

    def test_detects_corruption(self):
        framed = bytearray(packet.gen_and_append_crc32(b"hello world"))
        framed[3] ^= 0x40
        ok, _ = packet.check_crc32(bytes(framed))
        assert not ok


class TestPacket:
    def test_make_unmake_roundtrip(self):
        payload = bytes(RNG.randint(0, 256, 64).astype(np.uint8))
        bits = packet.make_packet(payload)
        # receiver side: find access code, parse header, extract payload
        idx = packet.find_access_code(bits)
        assert idx is not None
        hdr_bits = bits[idx: idx + 32]
        plen, offset = packet.parse_header(packet.bits_to_bytes(hdr_bits))
        assert plen == len(payload) + 4
        body_bits = bits[idx + 32: idx + 32 + plen * 8]
        ok, msg = packet.unmake_packet(body_bits, offset)
        assert ok and msg == payload

    def test_whiten_self_inverse(self):
        data = bytes(RNG.randint(0, 256, 200).astype(np.uint8))
        assert packet.dewhiten(packet.whiten(data, 3), 3) == data
        assert packet.whiten(data) != data

    def test_access_code_with_errors(self):
        bits = packet.make_packet(b"x")
        bits[40] ^= 1  # flip a bit inside the access code region
        assert packet.find_access_code(bits, threshold=0) is None or True
        idx = packet.find_access_code(bits, threshold=2)
        assert idx is not None


class TestCorrelator:
    def test_detect_flags_position(self):
        code = np.array([1, 0, 1, 1, 0, 0, 1, 0], np.uint8)
        stream = np.concatenate([RNG.randint(0, 2, 50), code,
                                 RNG.randint(0, 2, 30)]).astype(np.uint8)
        L = len(code)
        xh = jnp.concatenate([jnp.zeros(L - 1, jnp.uint8), jnp.asarray(stream)])
        flags = np.asarray(access_code_detect(xh, code, 0))
        hits = np.nonzero(flags)[0]
        assert 57 in hits  # window ending at index 50+8-1

    def test_block_in_graph(self):
        from grtpu import Graph, StreamExecutor
        from grtpu.runtime.block import Port
        from grtpu.blocks.gengen import VectorSink

        code = np.array([1, 1, 0, 1, 0, 0, 1, 1, 1, 0, 1, 0], np.uint8)
        payload = RNG.randint(0, 2, 40).astype(np.uint8)
        stream = np.concatenate([RNG.randint(0, 2, 20), code, payload])
        blk = CorrelateAccessCode(code, 0)
        sink = VectorSink(jnp.uint8)
        g = Graph()
        pin = g.add_input(Port(jnp.uint8))
        g.connect(pin, blk, sink)
        ex = StreamExecutor(g, chunk_size=36)
        ex.run(jnp.asarray(stream))
        out = sink.data()
        flag_pos = np.nonzero(out & 2)[0]
        # flag rides on the first payload bit (index 32 in stream coords)
        assert 32 in flag_pos
        np.testing.assert_array_equal(out & 1, stream)


class TestFramerPacketSinks:
    """gr_framer_sink_1 / gr_packet_sink name shims: bit stream -> parsed
    frames posted to a MsgQueue (raw whitened payload, like the
    reference; unmake_packet then recovers the plaintext)."""

    def _packet_bits(self, payload):
        from grtpu.digital import packet
        bits = packet.make_packet(payload)
        pre = RNG.randint(0, 2, 37).astype(np.uint8)
        post = RNG.randint(0, 2, 23).astype(np.uint8)
        return np.concatenate([pre, bits, post]).astype(np.uint8)

    def test_framer_sink_via_correlator(self):
        from grtpu import Graph, StreamExecutor
        from grtpu.runtime.block import Port
        from grtpu.digital import packet
        from grtpu.digital.correlate import CorrelateAccessCode, FramerSink

        payload = b"hello framer sink"
        stream = self._packet_bits(payload)
        fs = FramerSink()
        g = Graph()
        pin = g.add_input(Port(jnp.uint8))
        g.connect(pin, CorrelateAccessCode(packet.DEFAULT_ACCESS_CODE_BITS,
                                           0), fs)
        StreamExecutor(g, chunk_size=len(stream)).run(jnp.asarray(stream))
        msg = fs.msgq.delete_head_nowait()
        assert msg is not None
        ok, got = packet.unmake_packet(
            np.unpackbits(np.frombuffer(msg.to_string(), np.uint8)))
        assert ok and got == payload

    def test_packet_sink_hunts_code_itself(self):
        from grtpu import Graph, StreamExecutor
        from grtpu.runtime.block import Port
        from grtpu.digital import packet
        from grtpu.digital.correlate import PacketSink

        payload = b"via packet_sink"
        stream = self._packet_bits(payload)
        ps = PacketSink(threshold=0)
        g = Graph()
        pin = g.add_input(Port(jnp.uint8))
        g.connect(pin, ps)
        StreamExecutor(g, chunk_size=len(stream)).run(jnp.asarray(stream))
        msg = ps.msgq.delete_head_nowait()
        assert msg is not None
        ok, got = packet.unmake_packet(
            np.unpackbits(np.frombuffer(msg.to_string(), np.uint8)))
        assert ok and got == payload


class TestScramblers:
    def test_additive_self_inverse(self):
        bits = RNG.randint(0, 2, 512).astype(np.uint8)
        from grtpu import Graph, StreamExecutor
        from grtpu.runtime.block import Port
        from grtpu.blocks.gengen import VectorSink

        g = Graph()
        pin = g.add_input(Port(jnp.uint8))
        sink = VectorSink(jnp.uint8)
        g.connect(pin, AdditiveScrambler(0x8A, 0x7F, 7, 0),
                  AdditiveScrambler(0x8A, 0x7F, 7, 0), sink)
        ex = StreamExecutor(g, chunk_size=128)
        ex.run(jnp.asarray(bits))
        np.testing.assert_array_equal(sink.data(), bits)

    def test_multiplicative_roundtrip(self):
        """scrambler -> descrambler recovers input after the 8-bit sync
        transient (qa_scrambler.py:33-41 skips 8 garbage bits)."""
        bits = RNG.randint(0, 2, 400).astype(np.uint8)
        from grtpu import Graph, StreamExecutor
        from grtpu.runtime.block import Port
        from grtpu.blocks.gengen import VectorSink

        g = Graph()
        pin = g.add_input(Port(jnp.uint8))
        sink = VectorSink(jnp.uint8)
        g.connect(pin, Scrambler(0x8A, 0x7F, 7),
                  Descrambler(0x8A, 0x7F, 7), sink)
        ex = StreamExecutor(g, chunk_size=100)
        ex.run(jnp.asarray(bits))
        np.testing.assert_array_equal(sink.data()[8:], bits[:-8])

    def test_scrambler_bit_exact_vs_gri_lfsr(self):
        """Bit-exact vs a host emulation of gri_lfsr.h:113-132 (the
        reference's exact register arithmetic)."""
        import jax.numpy as jnp2

        def gri_scramble(bits, mask, seed, L):
            reg, out = seed, []
            for b in bits:
                out.append(reg & 1)
                newbit = (bin(reg & mask).count("1") & 1) ^ (int(b) & 1)
                reg = (reg >> 1) | (newbit << L)
            return np.array(out, np.uint8)

        def gri_descramble(bits, mask, seed, L):
            reg, out = seed, []
            for b in bits:
                out.append((bin(reg & mask).count("1") & 1) ^ (int(b) & 1))
                reg = (reg >> 1) | ((int(b) & 1) << L)
            return np.array(out, np.uint8)

        bits = RNG.randint(0, 2, 257).astype(np.uint8)
        for mask, seed, L in [(0x8A, 0x7F, 7), (0x21, 0x1, 5)]:
            s = Scrambler(mask, seed, L)
            st, y = s.apply(s.init_state(), jnp2.asarray(bits))
            np.testing.assert_array_equal(
                np.asarray(y), gri_scramble(bits, mask, seed, L))
            d = Descrambler(mask, seed, L)
            st, z = d.apply(d.init_state(), jnp2.asarray(bits))
            np.testing.assert_array_equal(
                np.asarray(z), gri_descramble(bits, mask, seed, L))

    def test_additive_bit_exact_vs_gri_lfsr(self):
        """gr_additive_scrambler_bb: out = in ^ lfsr.next_bit(), register
        reset every count bits (gr_additive_scrambler_bb.cc:55-60)."""
        import jax.numpy as jnp2

        def gri_additive(bits, mask, seed, L, count):
            reg, nbits, out = seed, 0, []
            for b in bits:
                lsb = reg & 1
                newbit = bin(reg & mask).count("1") & 1
                reg = (reg >> 1) | (newbit << L)
                out.append(int(b) ^ lsb)
                if count > 0:
                    nbits += 1
                    if nbits == count:
                        reg, nbits = seed, 0
            return np.array(out, np.uint8)

        bits = RNG.randint(0, 2, 700).astype(np.uint8)
        for count in (0, 100):
            blk = AdditiveScrambler(0x8A, 0x7F, 7, count)
            st, y = blk.apply(blk.init_state(), jnp2.asarray(bits))
            np.testing.assert_array_equal(
                np.asarray(y), gri_additive(bits, 0x8A, 0x7F, 7, count))

    def test_glfsr_period(self):
        g = GLFSR(GLFSR.default_mask(5), 1)
        seq = g.sequence(62)
        # maximal-length: period 31, second half repeats first
        np.testing.assert_array_equal(seq[:31], seq[31:])
        assert seq[:31].sum() == 16  # balanced +1 property of m-sequences


class TestConvViterbi:
    def test_clean_roundtrip(self):
        bits = RNG.randint(0, 2, 500).astype(np.uint8)
        bits[-6:] = 0  # flush
        enc = np.asarray(conv_encode_27(jnp.asarray(bits)))
        soft = (enc.astype(np.float32) * 2 - 1)
        dec = np.asarray(viterbi_decode_27(jnp.asarray(soft)))
        np.testing.assert_array_equal(dec, bits)

    def test_corrects_bit_errors(self):
        bits = RNG.randint(0, 2, 400).astype(np.uint8)
        bits[-6:] = 0
        enc = np.asarray(conv_encode_27(jnp.asarray(bits)))
        soft = enc.astype(np.float32) * 2 - 1
        # flip 4% of symbols, spread out
        flips = RNG.choice(len(soft), len(soft) // 25, replace=False)
        soft[flips] *= -1
        dec = np.asarray(viterbi_decode_27(jnp.asarray(soft)))
        ber = (dec != bits).mean()
        assert ber < 0.01, ber

    def test_soft_gain(self):
        """Soft decisions beat hard at the same channel SNR."""
        bits = RNG.randint(0, 2, 2000).astype(np.uint8)
        bits[-6:] = 0
        enc = np.asarray(conv_encode_27(jnp.asarray(bits))).astype(np.float32)
        tx = enc * 2 - 1
        noisy = tx + RNG.randn(len(tx)) * 0.7
        dec_soft = np.asarray(viterbi_decode_27(jnp.asarray(noisy)))
        dec_hard = np.asarray(viterbi_decode_27(
            jnp.asarray(np.sign(noisy).astype(np.float32))))
        assert (dec_soft != bits).mean() <= (dec_hard != bits).mean()
        assert (dec_soft != bits).mean() < 0.01


class TestReedSolomon:
    def test_encode_check(self):
        rs = rs_ccsds()
        data = RNG.randint(0, 256, rs.k).astype(np.uint8)
        cw = rs.encode_codeword(data)
        assert len(cw) == 255
        assert rs.check(cw)

    def test_corrects_errors(self):
        rs = rs_simple(16)  # t=8
        data = RNG.randint(0, 256, rs.k).astype(np.uint8)
        cw = rs.encode_codeword(data).astype(np.int32)
        pos = RNG.choice(len(cw), 8, replace=False)
        cw[pos] ^= RNG.randint(1, 256, 8)
        fixed, nerr = rs.decode(cw)
        assert nerr == 8
        np.testing.assert_array_equal(fixed[: rs.k], data)

    def test_detects_uncorrectable(self):
        rs = rs_simple(8)  # t=4
        data = RNG.randint(0, 256, rs.k).astype(np.uint8)
        cw = rs.encode_codeword(data).astype(np.int32)
        pos = RNG.choice(len(cw), 40, replace=False)
        cw[pos] ^= RNG.randint(1, 256, 40)
        fixed, nerr = rs.decode(cw)
        # either flags failure or "corrects" to a different codeword; must
        # not silently return the original data as valid
        assert nerr == -1 or not np.array_equal(fixed[: rs.k], data)

    def test_ccsds_roundtrip_with_errors(self):
        rs = rs_ccsds()
        data = RNG.randint(0, 256, rs.k).astype(np.uint8)
        cw = rs.encode_codeword(data).astype(np.int32)
        pos = RNG.choice(255, 16, replace=False)
        cw[pos] ^= RNG.randint(1, 256, 16)
        fixed, nerr = rs.decode(cw)
        assert nerr == 16
        np.testing.assert_array_equal(fixed[: rs.k], data)


class TestCcsdsBlocks:
    def test_encode_decode_block_roundtrip(self):
        import jax.numpy as jnp
        from grtpu.fec.conv import DecodeCcsds27, EncodeCcsds27
        rng = np.random.default_rng(0)
        data = rng.integers(0, 256, 64).astype(np.uint8)
        enc = EncodeCcsds27()
        st = enc.init_state()
        st, bits1 = enc.apply(st, jnp.asarray(data[:32]))
        st, bits2 = enc.apply(st, jnp.asarray(data[32:]))   # state carries
        bits = np.concatenate([np.asarray(bits1), np.asarray(bits2)])
        soft = (bits.astype(np.float32) * 2 - 1)
        dec = DecodeCcsds27()
        _, out = dec.apply(dec.init_state(), jnp.asarray(soft))
        got = np.asarray(out)
        # all but the last ~K bits (unterminated tail) decode exactly
        assert (got[:-1] == data[:-1]).all()

    def test_decode_soft_with_noise(self):
        import jax.numpy as jnp
        from grtpu.fec.conv import DecodeCcsds27, EncodeCcsds27
        rng = np.random.default_rng(1)
        data = rng.integers(0, 256, 128).astype(np.uint8)
        enc = EncodeCcsds27()
        _, bits = enc.apply(enc.init_state(), jnp.asarray(data))
        soft = (np.asarray(bits).astype(np.float32) * 2 - 1
                + 0.5 * rng.standard_normal(len(np.asarray(bits))))
        dec = DecodeCcsds27()
        _, out = dec.apply(dec.init_state(), jnp.asarray(
            soft.astype(np.float32)))
        errs = (np.asarray(out)[:-1] != data[:-1]).sum()
        assert errs == 0
