"""Variable-rate blocks as first-class graph citizens.

VERDICT.md round-1 item #1: the reference scheduler natively runs blocks
with data-dependent consumption mid-graph (digital_clock_recovery_mm_cc.cc
:160-217 variable consume; gr_block_executor.cc:302-350 demand negotiation).
These tests prove grtpu's device-FIFO emission machinery gives the same
capability: a clock-recovery block placed on ordinary Graph edges, with
downstream blocks consuming its compacted output — chunked execution
sample-identical to one full-stream run, and the reference's generic demod
chain (agc2 -> fll_band_edge -> pfb_clock_sync -> constellation_receiver,
gr-digital/python/generic_mod_demod.py:268-313) built as a 4-block Graph.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grtpu.runtime.block import Block, Port
from grtpu.runtime.graph import Graph
from grtpu.runtime.executor import StreamExecutor
from grtpu.blocks.analog import Agc2
from grtpu.blocks.pfb import PfbClockSync, pfb_clock_sync, pfb_clock_sync_init
from grtpu.digital import loops
from grtpu.digital.blocks import (BinarySlicer, ClockRecoveryMMCC,
                                  ClockRecoveryMMFF, ConstellationReceiver,
                                  FllBandEdge)
from grtpu.digital.constellation import psk_constellation
from grtpu.utils import firdes


def _nrz(nsym, sps, seed=0):
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, nsym)
    sym = bits * 2.0 - 1.0
    x = np.repeat(sym, sps).astype(np.float32)
    return bits, x


def _hand_mm_ff(block, x_full):
    """Full-stream single-call reference: replicate the executor's halo
    (history-1 leading zeros), run the op once over everything."""
    xp = jnp.concatenate([jnp.zeros(block.history - 1, jnp.float32),
                          jnp.asarray(x_full)])
    ys, nv, _ = loops.clock_recovery_mm_ff(
        xp, block.init_state(), block.omega, block.gain_omega,
        block.gain_mu, block.omega_relative_limit)
    return np.asarray(ys)[: int(nv)]


class TestMMFirstClass:
    def test_vr_block_to_pad_chunked_equals_full_run(self):
        sps = 4
        bits, x = _nrz(3000, sps, seed=1)
        mm = ClockRecoveryMMFF(omega=sps, gain_omega=0.25 * 0.175 ** 2,
                               mu=0.5, gain_mu=0.175)
        g = Graph()
        pin = g.add_input(Port(jnp.float32))
        pout = g.add_output(Port(jnp.float32))
        g.connect(pin, mm, pout)
        ex = StreamExecutor(g, chunk_size=1000)
        got = ex.run(x)

        want = _hand_mm_ff(mm, x)
        assert got is not None and len(got) > 2500
        # graph emits whole n_emit windows; anything still queued in the
        # FIFO at the end stays carried — compare the emitted prefix
        assert len(got) <= len(want)
        np.testing.assert_array_equal(np.asarray(got), want[: len(got)])
        # residue bounded by one emission
        assert len(want) - len(got) < ex.vr_emit[mm.uid] + 2

    def test_vr_with_downstream_consumer(self):
        """slicer AFTER clock recovery on ordinary graph edges — the thing
        round 1 could not express."""
        sps = 4
        bits, x = _nrz(2000, sps, seed=2)
        mm = ClockRecoveryMMFF(omega=sps, gain_omega=0.25 * 0.175 ** 2,
                               mu=0.5, gain_mu=0.175)
        g = Graph()
        pin = g.add_input(Port(jnp.float32))
        pout = g.add_output(Port(jnp.uint8))
        g.connect(pin, mm, BinarySlicer(), pout)
        ex = StreamExecutor(g, chunk_size=500)
        got = ex.run(x)

        want_syms = _hand_mm_ff(mm, x)
        want = (want_syms >= 0).astype(np.uint8)
        np.testing.assert_array_equal(np.asarray(got), want[: len(got)])
        # and the decisions actually recover the data: align (the history
        # zeros offset the stream by a few symbols) and discard the settle
        dec = np.asarray(got).astype(np.int32)
        best = max(
            ((dec[50:1800] == bits[50 - lag:1800 - lag]).mean(), lag)
            for lag in range(0, 8))
        assert best[0] > 0.999, best

    def test_chunk_size_invariance(self):
        """Different chunkings must produce the identical symbol stream
        (the FIFO + freeze-state machinery is exact, not approximate)."""
        sps = 4
        _, x = _nrz(1500, sps, seed=3)
        outs = []
        for cs in (250, 640, 1500):
            mm = ClockRecoveryMMFF(omega=sps, gain_omega=0.25 * 0.175 ** 2,
                                   mu=0.5, gain_mu=0.175)
            g = Graph()
            pin = g.add_input(Port(jnp.float32))
            pout = g.add_output(Port(jnp.float32))
            g.connect(pin, mm, pout)
            got = StreamExecutor(g, chunk_size=cs).run(x)
            outs.append(np.asarray(got))
        n = min(len(o) for o in outs)
        np.testing.assert_array_equal(outs[0][:n], outs[1][:n])
        np.testing.assert_array_equal(outs[0][:n], outs[2][:n])

    def test_vr_complex(self):
        sps = 4
        rng = np.random.default_rng(4)
        syms = (rng.integers(0, 2, 800) * 2 - 1) + 1j * (
            rng.integers(0, 2, 800) * 2 - 1)
        x = np.repeat(syms, sps).astype(np.complex64) / np.sqrt(2)
        mm = ClockRecoveryMMCC(omega=sps, gain_omega=0.25 * 0.175 ** 2,
                               mu=0.5, gain_mu=0.175)
        g = Graph()
        pin = g.add_input(Port(jnp.complex64))
        pout = g.add_output(Port(jnp.complex64))
        g.connect(pin, mm, pout)
        got = StreamExecutor(g, chunk_size=400).run(x)
        xp = jnp.concatenate([jnp.zeros(mm.history - 1, jnp.complex64),
                              jnp.asarray(x)])
        ys, nv, _ = loops.clock_recovery_mm_cc(
            xp, mm.init_state(), mm.omega, mm.gain_omega, mm.gain_mu,
            mm.omega_relative_limit)
        want = np.asarray(ys)[: int(nv)]
        np.testing.assert_array_equal(np.asarray(got), want[: len(got)])


def _qpsk_burst(nsym, sps, excess_bw=0.35, snr_db=25.0, seed=7):
    """RRC-shaped QPSK at sps samples/symbol + AWGN."""
    rng = np.random.default_rng(seed)
    m = 4
    syms_i = rng.integers(0, m, nsym)
    const = psk_constellation(m)
    pts = np.asarray(const.points) * np.exp(1j * np.pi / m)
    cpx = pts[syms_i].astype(np.complex64)
    ntaps = 11 * sps
    rrc = firdes.root_raised_cosine(sps, sps, 1.0, excess_bw, ntaps)
    up = np.zeros(nsym * sps, np.complex64)
    up[::sps] = cpx
    x = np.convolve(up, rrc).astype(np.complex64)[: nsym * sps]
    p = (np.abs(x) ** 2).mean()
    sigma = np.sqrt(p / 10 ** (snr_db / 10) / 2)
    x = x + sigma * (rng.standard_normal(len(x))
                     + 1j * rng.standard_normal(len(x))).astype(np.complex64)
    return syms_i, x.astype(np.complex64), pts


class TestGenericDemodGraph:
    """The reference generic receive chain as a 4-block Graph
    (generic_mod_demod.py:268-313): agc2 -> fll_band_edge ->
    pfb_clock_sync -> constellation_receiver."""

    def _build(self, sps, excess_bw, nfilts=32):
        mf_bank = firdes.root_raised_cosine(
            nfilts, nfilts * sps, 1.0, excess_bw, 11 * sps * nfilts)
        agc = Agc2(attack_rate=1e-1, decay_rate=1e-2, reference=1.0,
                   gain=1.0 / sps)
        fll = FllBandEdge(sps, excess_bw, sps * 4, 0.035)
        clk = PfbClockSync(sps, 0.045, mf_bank, nfilts=nfilts)
        const = psk_constellation(4)
        const.points = (np.asarray(const.points)
                        * np.exp(1j * np.pi / 4)).astype(np.complex64)
        rx = ConstellationReceiver(const, 0.06)
        g = Graph()
        pin = g.add_input(Port(jnp.complex64))
        pout = g.add_output(Port(jnp.uint8))
        g.connect(pin, agc, fll, clk, rx, pout)
        return g, (agc, fll, clk, rx), mf_bank, const

    def _hand(self, x, blocks, mf_bank, const, sps, excess_bw, nfilts=32):
        """Same four stage functions composed by hand over the full burst,
        replicating the executor's halo conventions exactly."""
        agc, fll, clk, rx = blocks
        _, xa = agc.apply(agc.init_state(), jnp.asarray(x))
        fsz = sps * 4
        xh = jnp.concatenate([jnp.zeros(fsz - 1, jnp.complex64), xa])
        xf, _ = loops.fll_band_edge(xh, loops.fll_init_state(), float(sps),
                                    excess_bw, fsz, 0.035)
        xc = jnp.concatenate([jnp.zeros(clk.history - 1, jnp.complex64), xf])
        ys, nv, _ = pfb_clock_sync(xc, pfb_clock_sync_init(nfilts),
                                   float(sps), mf_bank, nfilts, 0.045)
        sym_samps = np.asarray(ys)[: int(nv)]
        syms, _, _ = loops.constellation_receiver(
            jnp.asarray(sym_samps), loops.costas_init_state(), const, 0.06)
        return np.asarray(syms).astype(np.uint8)

    def test_graph_equals_hand_composition(self):
        sps, ebw = 4, 0.35
        syms_tx, x, pts = _qpsk_burst(2500, sps, ebw, snr_db=30, seed=11)
        g, blocks, mf_bank, const = self._build(sps, ebw)
        ex = StreamExecutor(g, chunk_size=1000)
        got = np.asarray(ex.run(x))
        want = self._hand(x, blocks, mf_bank, const, sps, ebw)
        assert len(got) > 2000
        np.testing.assert_array_equal(got, want[: len(got)])

    @pytest.mark.slow
    def test_graph_ber_matches_hand_fused_modem(self):
        """Same BER as the hand-fused GenericModem on the same waveform:
        both must recover the data exactly after the acquisition settle."""
        from grtpu.digital.generic_mod_demod import GenericModem

        sps, ebw = 4, 0.35
        rng = np.random.default_rng(13)
        nbits = 5000
        bits = rng.integers(0, 2, nbits).astype(np.uint8)
        modem = GenericModem(m=4, samples_per_symbol=sps, excess_bw=ebw,
                             differential=True)
        x = np.asarray(modem.modulate(bits))
        p = (np.abs(x) ** 2).mean()
        snr_db = 20.0
        sigma = np.sqrt(p / 10 ** (snr_db / 10) / 2)
        noisy = (x + sigma * (rng.standard_normal(len(x)) + 1j *
                              rng.standard_normal(len(x)))).astype(np.complex64)

        # hand-fused path.  Loops have acquisition transients; measure the
        # steady state (settle-N discard, the reference QA pattern —
        # qa_costas_loop_cc.py:27-70)
        bits_fused = modem.demodulate(noisy)
        settle = 2000
        n = min(len(bits_fused), nbits)
        ber_fused = (bits_fused[settle:n] != bits[settle:n]).mean()

        # graph path: 4-block chain to symbol decisions, then the same
        # diff-decode + ungray + unpack host post-processing
        g, blocks, mf_bank, const = self._build(sps, ebw)
        ex = StreamExecutor(g, chunk_size=1024)
        dec = np.asarray(ex.run(noisy)).astype(np.int32)
        d = (dec - np.concatenate([[0], dec[:-1]])) % 4
        out = modem.ungray_map[d]
        bits_graph = ((out[:, None] >> np.arange(1, -1, -1)) & 1).reshape(-1)
        # the graph chain's leading history zeros shift the stream by a few
        # symbols; align at dibit granularity, then measure BER
        span = 2500
        ber_graph = min(
            (bits_graph[settle + 2 * lag: settle + 2 * lag + span]
             != bits[settle: settle + span]).mean()
            for lag in range(0, 16)
            if len(bits_graph) >= settle + 2 * lag + span)

        assert ber_fused == 0.0
        assert ber_graph == 0.0  # same BER as the hand-fused modem


class TestVrRateLogic:
    def test_emission_size_respects_downstream_decimation(self):
        """A decimating block behind the VR boundary constrains n_emit."""
        from grtpu.blocks.filter import FirFilter

        sps = 4
        _, x = _nrz(2000, sps, seed=5)
        mm = ClockRecoveryMMFF(omega=sps, gain_omega=0.25 * 0.175 ** 2,
                               mu=0.5, gain_mu=0.175)
        taps = firdes.low_pass(1.0, 1.0, 0.2, 0.1)
        dec = FirFilter(5, taps, "fff")
        g = Graph()
        pin = g.add_input(Port(jnp.float32))
        pout = g.add_output(Port(jnp.float32))
        g.connect(pin, mm, dec, pout)
        ex = StreamExecutor(g, chunk_size=500)
        assert ex.vr_emit[mm.uid] % 5 == 0
        got = ex.run(x)
        assert got is not None and len(got) > 300

    def test_vr_join_rejected(self):
        """Joining a VR-derived stream with a static stream cannot be
        rate-aligned and must fail loudly."""
        from grtpu.blocks.gengen import Add

        sps = 4
        mm = ClockRecoveryMMFF(omega=sps, gain_omega=0.25 * 0.175 ** 2,
                               mu=0.5, gain_mu=0.175)
        g = Graph()
        pin = g.add_input(Port(jnp.float32))
        pout = g.add_output(Port(jnp.float32))
        add = Add(dtype=jnp.float32, nin=2)
        g.connect(pin, mm, (add, 0))
        g.connect(pin, (add, 1))
        g.connect(add, pout)
        with pytest.raises(ValueError, match="variable-rate"):
            StreamExecutor(g, chunk_size=512)

    def test_required_multiple_exact(self):
        """interp-then-decim chains get the exact denominator-based
        multiple (VERDICT weak item #3)."""
        from grtpu.blocks.filter import FirFilter, InterpFirFilter

        taps = firdes.low_pass(1.0, 1.0, 0.2, 0.1)
        g = Graph()
        pin = g.add_input(Port(jnp.float32))
        pout = g.add_output(Port(jnp.float32))
        up = InterpFirFilter(3, taps, "fff")
        dn = FirFilter(2, taps, "fff")
        g.connect(pin, up, dn, pout)
        ex = StreamExecutor(g, chunk_size=4096)
        # after interp 3, input n*3 must divide by 2 -> n must be even; an
        # exact derivation gives 2, not lcm(3, 2)=6 or anything coarser
        assert ex.required_multiple() == 2
        got = ex.run(np.random.default_rng(0).standard_normal(8192).astype(np.float32))
        assert len(got) == 8192 * 3 // 2


class TestCheckpointValidation:
    def test_load_rejects_mismatched_graph(self, tmp_path):
        from grtpu.blocks.filter import FirFilter

        taps = firdes.low_pass(1.0, 1.0, 0.2, 0.1)

        def build(decim):
            g = Graph()
            pin = g.add_input(Port(jnp.float32))
            pout = g.add_output(Port(jnp.float32))
            g.connect(pin, FirFilter(decim, taps, "fff"), pout)
            return StreamExecutor(g, chunk_size=512)

        ex1 = build(1)
        path = str(tmp_path / "ck.npz")
        ex1.save_checkpoint(path)
        ex1.load_checkpoint(path)  # self round-trip fine
        ex2 = build(2)
        with pytest.raises(ValueError, match="does not match|leaf|leaves"):
            ex2.load_checkpoint(path)


class TestGmskHierChain:
    """gmsk.py's mod/demod chains as stream hier blocks end-to-end
    (quadrature_demod -> first-class M&M -> slicer)."""

    def test_gmsk_loopback_through_graph(self):
        from grtpu.digital.generic_mod_demod import (GmskDemodBlock,
                                                     GmskModBlock)

        rng = np.random.default_rng(21)
        data = rng.integers(0, 256, 400).astype(np.uint8)
        g = Graph()
        pin = g.add_input(Port(jnp.uint8))
        pout = g.add_output(Port(jnp.uint8))
        g.connect(pin, GmskModBlock(samples_per_symbol=2),
                  GmskDemodBlock(samples_per_symbol=2), pout)
        ex = StreamExecutor(g, chunk_size=200)
        bits_out = np.asarray(ex.run(data))
        bits_in = np.unpackbits(data)
        # GMSK Gaussian ISI + MM lock: align and compare steady state
        best = max(
            ((bits_out[200:2800] == bits_in[200 - lag:2800 - lag]).mean(),
             lag) for lag in range(0, 12))
        assert best[0] > 0.995, best


class TestCompactHeadSkipHead:
    """gr_head/gr_skiphead with the reference's exact compacting semantics
    (first-class variable rate)."""

    def test_head_compact_ends_stream(self):
        from grtpu.blocks.stream import Head

        g = Graph()
        pin = g.add_input(Port(jnp.float32))
        pout = g.add_output(Port(jnp.float32))
        g.connect(pin, Head(300, dtype=jnp.float32, compact=True), pout)
        ex = StreamExecutor(g, chunk_size=128, vr_chunks=None)
        x = np.arange(1024, dtype=np.float32)
        y = np.asarray(ex.run(x))
        # exactly the first 300 items, nothing after (modulo emission size)
        assert len(y) <= 300
        np.testing.assert_array_equal(y, x[: len(y)])
        assert 300 - len(y) < ex.vr_emit[ex.vr_blocks[0].uid]

    def test_skiphead_compact_drops_prefix(self):
        from grtpu.blocks.stream import SkipHead

        g = Graph()
        pin = g.add_input(Port(jnp.float32))
        pout = g.add_output(Port(jnp.float32))
        g.connect(pin, SkipHead(100, dtype=jnp.float32, compact=True), pout)
        ex = StreamExecutor(g, chunk_size=128)
        x = np.arange(1024, dtype=np.float32)
        y = np.asarray(ex.run(x))
        np.testing.assert_array_equal(y, x[100: 100 + len(y)])
        assert len(y) > 1024 - 100 - 130


class TestPacketBlocks:
    """Streaming blks2 packet encoder/decoder (packet.py packet_mod_X /
    packet_demod_X): in-graph framing with CRC-gated variable-rate payload
    recovery."""

    def test_float_stream_roundtrip(self):
        from grtpu.digital.packet_blocks import PacketDecoder, PacketEncoder
        from grtpu.blocks.gengen import PackedToUnpacked

        rng = np.random.default_rng(0)
        x = rng.standard_normal(2048).astype(np.float32)
        g = Graph()
        pin = g.add_input(Port(jnp.float32))
        pout = g.add_output(Port(jnp.float32))
        g.connect(pin, PacketEncoder("float", payload_length=64),
                  PackedToUnpacked(1),
                  PacketDecoder("float", payload_length=64), pout)
        ex = StreamExecutor(g, chunk_size=256)
        y = np.asarray(ex.run(x))
        assert len(y) > 1500
        np.testing.assert_array_equal(y, x[: len(y)])

    def test_corrupted_packet_dropped(self):
        from grtpu.digital.packet_blocks import PacketDecoder, PacketEncoder

        rng = np.random.default_rng(1)
        x = rng.standard_normal(512).astype(np.float32)
        enc = PacketEncoder("float", payload_length=64)
        st, by = enc.apply((), jnp.asarray(x))
        bits = np.unpackbits(np.asarray(by).astype(np.uint8))
        # corrupt one payload bit in packet 2
        pkt_bits = len(bits) // (512 // 16)
        bits = bits.copy()
        bits[pkt_bits * 1 + 140] ^= 1
        dec = PacketDecoder("float", payload_length=64)
        g = Graph()
        pin = g.add_input(Port(jnp.uint8))
        pout = g.add_output(Port(jnp.float32))
        g.connect(pin, dec, pout)
        ex = StreamExecutor(g, chunk_size=len(bits))
        y = np.asarray(ex.run(bits.astype(np.uint8)))
        per = 16  # floats per packet
        # one packet dropped, the rest recovered exactly in order
        assert len(y) <= len(x) - per
        src_pkts = [x[i * per:(i + 1) * per] for i in range(len(x) // per)]
        got_pkts = [y[i * per:(i + 1) * per] for i in range(len(y) // per)]
        si = 0
        for gp in got_pkts:
            while si < len(src_pkts) and not np.array_equal(
                    gp, src_pkts[si]):
                si += 1
            assert si < len(src_pkts), "recovered packet not in source"
            si += 1
