"""Digital stack tests: loops, constellations, modem BER loopbacks.

Mirrors the reference's QA strategy: qa_costas_loop_cc.py:27-70 (zero-bw
passthrough + convergence-from-rotation with settle discard),
qa_constellation_receiver.py (end-to-end mod->channel->demod BER bound),
qa_clock_recovery_mm.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from grtpu.digital import loops
from grtpu.digital.constellation import (
    constellation_bpsk, constellation_qpsk, psk_constellation,
    qam_constellation,
)
from grtpu.digital.modems import Fsk4Modem, GmskModem, PskModem, awgn

RNG = np.random.RandomState(123)


class TestCostas:
    def test_passthrough_when_locked(self):
        """QPSK symbols with no offset: loop output ~ input
        (qa_costas_loop_cc test_02-ish)."""
        c = constellation_qpsk()
        syms = RNG.randint(0, 4, 500)
        x = c.points[syms]
        y, _ = loops.costas_loop(jnp.asarray(x), loops.costas_init_state(),
                                 0.02, 4)
        np.testing.assert_allclose(np.asarray(y)[100:], x[100:], atol=0.2)

    def test_converges_from_rotation(self):
        """Fixed phase offset must be pulled out (qa test_03)."""
        c = constellation_qpsk()
        syms = RNG.randint(0, 4, 2000)
        rot = np.exp(1j * 0.2)
        x = c.points[syms] * rot
        y, (phase, freq) = loops.costas_loop(
            jnp.asarray(x.astype(np.complex64)), loops.costas_init_state(),
            0.05, 4)
        y = np.asarray(y)[1500:]
        ref = c.points[syms][1500:]
        # up to 4-fold symmetry ambiguity; offset 0.2 < pi/4 so no slip
        np.testing.assert_allclose(y, ref, atol=0.15)

    def test_tracks_cfo_bpsk(self):
        syms = RNG.randint(0, 2, 4000) * 2 - 1
        cfo = 0.01
        x = syms * np.exp(1j * cfo * np.arange(4000))
        y, (phase, freq) = loops.costas_loop(
            jnp.asarray(x.astype(np.complex64)), loops.costas_init_state(),
            0.06, 2)
        assert abs(float(freq) - cfo) < 2e-3
        tail = np.asarray(y)[3000:]
        assert np.abs(np.imag(tail)).mean() < 0.1


class TestDiff:
    def test_encode_decode_roundtrip(self):
        x = RNG.randint(0, 4, 256).astype(np.uint8)
        enc, st = loops.diff_encode(jnp.asarray(x), jnp.zeros((), jnp.uint8), 4)
        dec, _ = loops.diff_decode(enc, jnp.zeros((), jnp.uint8), 4)
        np.testing.assert_array_equal(np.asarray(dec), x)

    def test_encode_chunked_equals_whole(self):
        x = RNG.randint(0, 2, 64).astype(np.uint8)
        whole, _ = loops.diff_encode(jnp.asarray(x), jnp.zeros((), jnp.uint8), 2)
        st = jnp.zeros((), jnp.uint8)
        parts = []
        for c in range(4):
            y, st = loops.diff_encode(jnp.asarray(x[c * 16:(c + 1) * 16]), st, 2)
            parts.append(np.asarray(y))
        np.testing.assert_array_equal(np.concatenate(parts), np.asarray(whole))


class TestConstellation:
    @pytest.mark.parametrize("make", [constellation_bpsk, constellation_qpsk,
                                      lambda: psk_constellation(8),
                                      lambda: qam_constellation(16)])
    def test_decision_inverts_map(self, make):
        c = make()
        idx = np.arange(c.arity())
        pts = c.map_to_points(jnp.asarray(idx))
        dec = np.asarray(c.decision_maker(pts))
        np.testing.assert_array_equal(dec, idx)

    def test_decisions_with_noise(self):
        c = constellation_qpsk()
        syms = RNG.randint(0, 4, 1000)
        x = c.points[syms] + 0.1 * (RNG.randn(1000) + 1j * RNG.randn(1000))
        dec = np.asarray(c.decision_maker(jnp.asarray(x.astype(np.complex64))))
        assert (dec == syms).mean() > 0.999

    def test_soft_decisions_sign(self):
        c = constellation_bpsk()
        x = jnp.asarray(np.array([1.0 + 0j, -1.0 + 0j], np.complex64))
        llr = np.asarray(c.soft_decision_maker(x))
        assert llr[0, 0] > 0 and llr[1, 0] < 0


class TestClockRecovery:
    def test_mm_ff_recovers_timing(self):
        """NRZ at sps=4 with fractional delay: recovered symbols match."""
        sps = 4
        nsym = 800
        bits = RNG.randint(0, 2, nsym) * 2 - 1
        from grtpu.utils import firdes
        from grtpu.ops.fir import interp_fir_filter as ifir

        taps = np.convolve(firdes.gaussian(1.0, sps, 0.5, 4 * sps),
                           np.ones(sps, np.float32)).astype(np.float32)
        kp = -(-len(taps) // sps)
        xh = jnp.concatenate([jnp.zeros(kp - 1, jnp.float32),
                              jnp.asarray(bits.astype(np.float32))])
        wave = np.asarray(ifir(xh, jnp.asarray(taps), sps))
        # fractional delay of 1.7 samples via resampling shift
        wave = np.interp(np.arange(len(wave)) - 1.7,
                         np.arange(len(wave)), wave).astype(np.float32)
        st = loops.mm_init_state(float(sps), 0.5)
        ys, n_valid, _ = loops.clock_recovery_mm_ff(
            jnp.asarray(wave), st, float(sps), 0.25 * 0.175 ** 2, 0.175, 0.005)
        got = np.sign(np.asarray(ys)[: int(n_valid)])
        # align to sent bits (unknown integer symbol offset)
        best = 0
        for off in range(4):
            n = min(len(got) - off, nsym - 50) - 50
            acc = (got[off + 50: off + 50 + n] == bits[50: 50 + n]).mean()
            best = max(best, acc)
        assert best > 0.98, best


class TestGmsk:
    def test_loopback_clean(self):
        modem = GmskModem(samples_per_symbol=4)
        bits = RNG.randint(0, 2, 2000).astype(np.uint8)
        tx = modem.modulate(bits)
        rx = modem.demodulate(tx)
        ber, shift = _best_ber(bits, rx)
        assert ber < 0.002, (ber, shift)

    def test_loopback_noisy(self):
        modem = GmskModem(samples_per_symbol=4)
        bits = RNG.randint(0, 2, 4000).astype(np.uint8)
        tx = modem.modulate(bits)
        rx = modem.demodulate(awgn(tx, 12.0, seed=3))
        ber, _ = _best_ber(bits, rx)
        assert ber < 0.02, ber


class TestChunkedModems:
    """Modems with chunked=True route timing recovery through the
    chunk-batched M&M (clock_recovery_mm_{ff,cc}_chunked); BER must
    match the windowed-scan modems."""

    def test_gmsk_chunked(self):
        rng = np.random.RandomState(77)   # local: don't shift the shared
        modem = GmskModem(samples_per_symbol=4, chunked=True)
        bits = rng.randint(0, 2, 3000).astype(np.uint8)
        tx = modem.modulate(bits)
        ber, _ = _best_ber(bits, modem.demodulate(tx))
        assert ber < 0.002, ber
        ber_n, _ = _best_ber(bits, modem.demodulate(awgn(tx, 12.0,
                                                         seed=3)))
        assert ber_n < 0.02, ber_n

    def test_dqpsk_chunked(self):
        rng = np.random.RandomState(78)
        modem = PskModem(m=4, samples_per_symbol=4, chunked=True)
        bits = rng.randint(0, 2, 4000).astype(np.uint8)
        tx = modem.modulate(bits)
        ber, _ = _best_ber(bits, modem.demodulate(tx), settle=300)
        assert ber < 0.02, ber


class TestDbpsk:
    def test_loopback_clean(self):
        modem = PskModem(m=2, samples_per_symbol=4)
        bits = RNG.randint(0, 2, 2000).astype(np.uint8)
        tx = modem.modulate(bits)
        rx = modem.demodulate(tx)
        ber, _ = _best_ber(bits, rx)
        assert ber < 0.01, ber

    def test_loopback_cfo_noise(self):
        modem = PskModem(m=2, samples_per_symbol=4)
        bits = RNG.randint(0, 2, 4000).astype(np.uint8)
        tx = np.asarray(modem.modulate(bits))
        cfo = 0.002  # rad/sample
        tx = tx * np.exp(1j * cfo * np.arange(len(tx)))
        rx = modem.demodulate(awgn(tx, 15.0, seed=5))
        ber, _ = _best_ber(bits, rx)
        assert ber < 0.02, ber


class TestDqpsk:
    def test_dqpsk_loopback(self):
        """DQPSK through the costas+M&M receiver (point-index differential
        coding cancels the order-4 lock ambiguity)."""
        modem = PskModem(m=4, samples_per_symbol=4)
        bits = RNG.randint(0, 2, 4000).astype(np.uint8)
        tx = modem.modulate(bits)
        ber, _ = _best_ber(bits, modem.demodulate(tx), settle=300)
        assert ber < 0.02, ber

    def test_dqpsk_noisy(self):
        modem = PskModem(m=4, samples_per_symbol=4)
        bits = RNG.randint(0, 2, 4000).astype(np.uint8)
        tx = modem.modulate(bits)
        ber, _ = _best_ber(bits, modem.demodulate(awgn(tx, 15.0, seed=2)),
                           settle=300)
        assert ber < 0.03, ber

    def test_d8psk_loopback(self):
        modem = PskModem(m=8, samples_per_symbol=4, costas_bw=0.03)
        bits = RNG.randint(0, 2, 4002).astype(np.uint8)
        tx = modem.modulate(bits)
        ber, _ = _best_ber(bits, modem.demodulate(tx), settle=300)
        assert ber < 0.03, ber


class TestFsk4:
    def test_loopback_clean(self):
        modem = Fsk4Modem(samples_per_symbol=5)
        dibits = RNG.randint(0, 4, 1000).astype(np.uint8)
        tx = modem.modulate(dibits)
        rx = modem.demodulate(tx)
        ser, _ = _best_ber(dibits, rx, settle=600)
        assert ser < 0.005, ser

    def test_loopback_noisy(self):
        modem = Fsk4Modem(samples_per_symbol=5)
        dibits = RNG.randint(0, 4, 2000).astype(np.uint8)
        tx = modem.modulate(dibits)
        rx = modem.demodulate(awgn(tx, 15.0, seed=9))
        ser, _ = _best_ber(dibits, rx, settle=600)
        assert ser < 0.02, ser


def _best_ber(sent, got, max_shift=64, settle=0):
    """BER minimized over alignment shift (clock recovery has unknown
    integer symbol delay); ``settle`` discards the acquisition transient
    (the reference's QA does the same, e.g. qa_costas settle-N discard)."""
    best = 1.0
    bshift = 0
    sent = np.asarray(sent)
    got = np.asarray(got)
    for s in range(max_shift):
        n = min(len(got) - s, len(sent)) - 32
        if n <= settle:
            continue
        err = (got[s + settle: s + n] != sent[settle:n]).mean()
        if err < best:
            best, bshift = err, s
    return best, bshift


class TestEqualizers:
    def test_cma_opens_eye(self):
        """CMA on a QPSK stream through a mild channel: output modulus
        error must shrink vs the unequalized input."""
        from grtpu.digital.equalizers import cma_equalize, center_spike_taps

        c = constellation_qpsk()
        syms = c.points[RNG.randint(0, 4, 6000)].astype(np.complex64)
        h = np.array([1.0, 0.0, 0.25 - 0.12j], np.complex64)
        rx = np.convolve(syms, h)[: len(syms)].astype(np.complex64)
        ntaps = 11
        xh = jnp.concatenate([jnp.zeros(ntaps - 1, jnp.complex64),
                              jnp.asarray(rx)])
        y, taps = cma_equalize(xh, jnp.asarray(center_spike_taps(ntaps)),
                               1.0, 0.005)
        y = np.asarray(y)
        before = np.abs(np.abs(rx[3000:]) ** 2 - 1.0).mean()
        after = np.abs(np.abs(y[3000:]) ** 2 - 1.0).mean()
        assert after < before * 0.5, (before, after)

    def test_lms_dd_converges(self):
        from grtpu.digital.equalizers import lms_dd_equalize, center_spike_taps

        c = constellation_qpsk()
        syms = c.points[RNG.randint(0, 4, 6000)].astype(np.complex64)
        h = np.array([1.0, 0.2 + 0.1j], np.complex64)
        rx = np.convolve(syms, h)[: len(syms)].astype(np.complex64)
        ntaps = 9
        xh = jnp.concatenate([jnp.zeros(ntaps - 1, jnp.complex64),
                              jnp.asarray(rx)])
        y, taps = lms_dd_equalize(xh, jnp.asarray(center_spike_taps(ntaps)),
                                  jnp.asarray(c.points), 0.01)
        y = np.asarray(y)[4000:]
        dec = np.asarray(c.decision_maker(jnp.asarray(y)))
        evm = np.abs(y - c.points[dec]).mean()
        # unequalized EVM
        dec0 = np.asarray(c.decision_maker(jnp.asarray(rx[4000:])))
        evm0 = np.abs(rx[4000:] - c.points[dec0]).mean()
        assert evm < evm0 * 0.5, (evm0, evm)

    def test_kurtotic_block_in_graph(self):
        """KurtoticEqualizer as a connectable graph block
        (digital_kurtotic_equalizer_cc): chunked executor run must match
        one full-stream kurtotic_equalize() call exactly (tap + moment
        state carried across chunk boundaries), and open the eye."""
        from grtpu.digital.equalizers import (
            KurtoticEqualizer, kurtotic_equalize, center_spike_taps)
        from grtpu import Graph, StreamExecutor

        c = constellation_qpsk()
        syms = c.points[RNG.randint(0, 4, 4096)].astype(np.complex64)
        h = np.array([1.0, 0.22 - 0.11j], np.complex64)
        rx = np.convolve(syms, h)[: len(syms)].astype(np.complex64)
        ntaps = 11
        mu = 0.002
        blk = KurtoticEqualizer(num_taps=ntaps, mu=mu)
        g = Graph()
        pin = g.add_input(blk.in_ports[0])
        pout = g.add_output(blk.out_ports[0])
        g.connect(pin, blk, pout)
        ex = StreamExecutor(g, chunk_size=512)
        y = np.asarray(ex.run(jnp.asarray(rx)))

        xh = jnp.concatenate([jnp.zeros(ntaps - 1, jnp.complex64),
                              jnp.asarray(rx)])
        t0 = np.zeros(ntaps, np.complex64)
        t0[0] = 1.0
        y_full, _, _ = kurtotic_equalize(
            xh, jnp.asarray(t0), mu,
            (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.complex64),
             jnp.zeros((), jnp.float32)))
        np.testing.assert_allclose(y, np.asarray(y_full), atol=2e-4)

        # The reference ships this block with no QA and no python usage;
        # its clipped error keeps the blind loop bounded but does not
        # guarantee convergence on constant-modulus inputs.  Assert the
        # faithful property: finite, bounded output.
        assert np.all(np.isfinite(y))
        assert np.abs(y).max() < 100.0


class TestDmrBurst:
    def test_burst_roundtrip_clean(self):
        from grtpu.models.dmr import DmrReceiver, DmrTransmitter

        tx = DmrTransmitter(samples_per_symbol=10)
        rx = DmrReceiver(samples_per_symbol=10)
        payload = RNG.randint(0, 2, 216).astype(np.uint8)
        samples = tx.transmit(payload, "bs_data")
        got = rx.receive(samples, "bs_data")
        assert len(got) == 1
        np.testing.assert_array_equal(got[0], payload)

    def test_burst_with_noise_and_cfo(self):
        from grtpu.models.dmr import DmrReceiver, DmrTransmitter

        tx = DmrTransmitter(samples_per_symbol=10)
        rx = DmrReceiver(samples_per_symbol=10)
        payload = RNG.randint(0, 2, 216).astype(np.uint8)
        s = np.asarray(tx.transmit(payload, "bs_voice"))
        s = s * np.exp(1j * 2 * np.pi * 50 / 48000 * np.arange(len(s)))
        got = rx.receive(awgn(s, 15.0, seed=4), "bs_voice")
        assert len(got) == 1
        ber = (got[0] != payload).mean()
        assert ber < 0.02, ber

    def test_wrong_sync_rejected(self):
        from grtpu.models.dmr import DmrReceiver, DmrTransmitter

        tx = DmrTransmitter(samples_per_symbol=10)
        rx = DmrReceiver(samples_per_symbol=10)
        payload = RNG.randint(0, 2, 216).astype(np.uint8)
        samples = tx.transmit(payload, "bs_data")
        got = rx.receive(samples, "ms_voice", max_errors=2)
        assert len(got) == 0


class TestGenericModem:
    def test_generic_qpsk_clean(self):
        """The reference's exact receive chain: agc2 -> fll_band_edge ->
        pfb_clock_sync -> constellation receiver (generic_mod_demod.py)."""
        from grtpu.digital.generic_mod_demod import GenericModem

        gm = GenericModem(m=4, samples_per_symbol=4)
        bits = RNG.randint(0, 2, 4000).astype(np.uint8)
        tx = gm.modulate(bits)
        ber, _ = _best_ber(bits, gm.demodulate(tx), settle=300)
        assert ber < 0.01, ber

    @pytest.mark.slow
    def test_generic_qpsk_cfo_noise(self):
        from grtpu.digital.generic_mod_demod import GenericModem

        gm = GenericModem(m=4, samples_per_symbol=4)
        bits = RNG.randint(0, 2, 4000).astype(np.uint8)
        tx = np.asarray(gm.modulate(bits))
        tx = tx * np.exp(1j * 0.004 * np.arange(len(tx)))
        ber, _ = _best_ber(bits, gm.demodulate(awgn(tx, 12.0, seed=2)),
                           settle=300)
        assert ber < 0.02, ber

    @pytest.mark.parametrize("sps", [
        pytest.param(5.3, marks=pytest.mark.slow), 2.5])
    def test_generic_qpsk_fractional_sps(self, sps):
        """Fractional samples/symbol — the reference default contract
        (generic_mod_demod.py:94, float sps >= 2): RRC shaping runs as a
        pfb_arb_resampler and clock sync on the fractional floor grid,
        with BER unchanged vs the integer-sps chain."""
        from grtpu.digital.generic_mod_demod import GenericModem

        gm = GenericModem(m=4, samples_per_symbol=sps)
        bits = RNG.randint(0, 2, 4000).astype(np.uint8)
        tx = gm.modulate(bits)
        ber, _ = _best_ber(bits, gm.demodulate(tx), settle=300)
        assert ber < 0.01, ber

    def test_generic_qpsk_chunked_parity(self):
        """chunked=True (chunk-batched AGC/FLL/clock-sync/receiver with
        closed-form loop trajectories — the TPU fast path, ~14x the
        per-sample scans in vmapped banks) must lock and match the exact
        chain at BER level: clean BER 0, noisy BER within a small factor."""
        from grtpu.digital.generic_mod_demod import GenericModem

        bits = RNG.randint(0, 2, 8000).astype(np.uint8)
        gm_ex = GenericModem(m=4, samples_per_symbol=2)
        gm_ck = GenericModem(m=4, samples_per_symbol=2, chunked=True)
        tx = np.asarray(gm_ex.modulate(bits))
        ber_ck, _ = _best_ber(bits, gm_ck.demodulate(tx), settle=600)
        assert ber_ck == 0.0, ber_ck

        txc = tx * np.exp(1j * 0.004 * np.arange(len(tx)))
        noisy = awgn(txc, 12.0, seed=5)
        ber_ex, _ = _best_ber(bits, gm_ex.demodulate(noisy), settle=600)
        ber_ck, _ = _best_ber(bits, gm_ck.demodulate(noisy), settle=600)
        assert ber_ck < 0.02, (ber_ex, ber_ck)
        assert ber_ck < max(ber_ex * 8, 0.008), (ber_ex, ber_ck)

    @pytest.mark.slow
    def test_generic_qpsk_fractional_sps_noise(self):
        from grtpu.digital.generic_mod_demod import GenericModem

        gm = GenericModem(m=4, samples_per_symbol=5.3)
        bits = RNG.randint(0, 2, 4000).astype(np.uint8)
        tx = np.asarray(gm.modulate(bits))
        ber, _ = _best_ber(bits, gm.demodulate(awgn(tx, 12.0, seed=3)),
                           settle=300)
        assert ber < 0.02, ber


class TestChunkedClockRecovery:
    """Chunk-batched M&M (loops.clock_recovery_mm_ff_chunked, the
    round-5 fixed-point formulation — ~2.5-3.6x the windowed scan in
    vmapped banks): symbol decisions must match the windowed loop on a
    clean stream and stay at parity under noise."""

    def test_chunked_matches_windowed(self):
        from grtpu.digital import loops

        rng = np.random.RandomState(0)
        sps, gm = 4, 0.175
        go = 0.25 * gm * gm
        nsym = 6000
        syms = rng.choice([-1.0, 1.0], nsym)
        x = np.repeat(syms, sps).astype(np.float32)[3:]
        W = 32
        L = sps + 2 * W + loops.NTAPS
        xp = np.concatenate([np.zeros(W, np.float32), x,
                             np.zeros(L + sps, np.float32)])
        st = loops.mm_windowed_init_state(float(sps), 0.5)
        y_ref = np.asarray(loops.clock_recovery_mm_ff_windowed(
            jnp.asarray(xp), st, sps, go, gm, W=W)[0])
        y_ck = np.asarray(loops.clock_recovery_mm_ff_chunked(
            jnp.asarray(xp), st, sps, go, gm, W=W, chunk=16)[0])
        n = min(len(y_ref), len(y_ck)) - 8
        best = 0.0
        for lag in range(-3, 4):
            a = np.sign(y_ref[300:n])
            b = np.sign(y_ck[300 + lag: 300 + lag + len(a)])
            if len(b) == len(a):
                best = max(best, float((a == b).mean()))
        assert best > 0.999, best

    def test_chunked_noise_parity(self):
        from grtpu.digital import loops

        rng = np.random.RandomState(0)
        sps, gm = 4, 0.175
        go = 0.25 * gm * gm
        nsym = 6000
        syms = rng.choice([-1.0, 1.0], nsym)
        x = np.repeat(syms, sps).astype(np.float32)[3:]
        x = (x + 0.15 * np.random.RandomState(7).randn(len(x))).astype(
            np.float32)
        W = 32
        L = sps + 2 * W + loops.NTAPS
        xp = np.concatenate([np.zeros(W, np.float32), x,
                             np.zeros(L + sps, np.float32)])
        st = loops.mm_windowed_init_state(float(sps), 0.5)
        y_ck = np.asarray(loops.clock_recovery_mm_ff_chunked(
            jnp.asarray(xp), st, sps, go, gm, W=W, chunk=16)[0])
        n = len(y_ck) - 8
        best = 0.0
        for lag in range(-3, 4):
            a = syms[300: n - 100]
            b = np.sign(y_ck[300 + lag: 300 + lag + len(a)])
            if len(b) == len(a):
                best = max(best, float((a == b).mean()))
        assert best > 0.995, best


class TestWindowedClockRecovery:
    """The gather-free fixed-rate M&M must be bit-exact vs the
    mask-and-compact loop while the drift stays inside +-W."""

    def _signal(self, nsym, sps, complex_mode, seed=0, ppm=50.0):
        rng = np.random.default_rng(seed)
        if complex_mode:
            sym = ((rng.integers(0, 2, nsym) * 2 - 1)
                   + 1j * (rng.integers(0, 2, nsym) * 2 - 1))
        else:
            sym = rng.integers(0, 2, nsym) * 2 - 1
        up = np.zeros(nsym * sps, np.complex128 if complex_mode else
                      np.float64)
        up[::sps] = sym
        h = np.hanning(2 * sps - 1)
        h /= h.sum()
        sig = np.convolve(up, h, "same")
        # resample with a small clock offset
        t = np.arange(0, len(sig) - 2, 1 + ppm * 1e-6)
        fr = t % 1
        lo = sig[t.astype(int)]
        hi = sig[t.astype(int) + 1]
        out = (1 - fr) * lo + fr * hi
        return out.astype(np.complex64 if complex_mode else np.float32)

    @pytest.mark.parametrize("complex_mode", [False, True])
    def test_bit_exact_vs_loop(self, complex_mode):
        from grtpu.digital import loops
        sps, nsym = 5, 1500
        x = self._signal(nsym, sps, complex_mode)
        gm, go = 0.175, 0.25 * 0.175 ** 2
        st = loops.mm_init_state(float(sps), 0.5, complex_mode=complex_mode)
        fn = (loops.clock_recovery_mm_cc if complex_mode
              else loops.clock_recovery_mm_ff)
        ys, nv, _ = fn(jnp.asarray(x), st, float(sps), go, gm, 0.0005)
        ref = np.asarray(ys)[:int(nv)]

        W = 48
        xw = np.concatenate([np.zeros(W, x.dtype), x])
        stw = loops.mm_windowed_init_state(float(sps), 0.5,
                                           complex_mode=complex_mode)
        fnw = (loops.clock_recovery_mm_cc_windowed if complex_mode
               else loops.clock_recovery_mm_ff_windowed)
        got, st2 = fnw(jnp.asarray(xw), stw, sps, go, gm, 0.0005, W=W)
        got = np.asarray(got)
        n = min(len(ref), len(got))
        assert n > 1000
        assert np.abs(ref[:n] - got[:n]).max() == 0.0

    @pytest.mark.parametrize("complex_mode", [False, True])
    def test_bit_exact_vs_loop_fractional_sps(self, complex_mode):
        """Fractional samples/symbol (float omega is the reference
        contract, digital_clock_recovery_mm_cc.cc:160-217): the windowed
        form rides the floor grid of the rationalized clock and stays
        bit-exact vs the dynamic-slice loop."""
        from grtpu.digital import loops
        sps, nsym = 5.3, 1200
        base = self._signal(nsym, 6, complex_mode, seed=11)
        # resample the 6-sps signal onto a 5.3-sps clock
        t = np.arange(0, len(base) - 2, 6 / sps)
        fr = (t % 1).astype(base.dtype)
        x = ((1 - fr) * base[t.astype(int)] + fr * base[t.astype(int) + 1]
             ).astype(base.dtype)
        gm, go = 0.175, 0.25 * 0.175 ** 2
        st = loops.mm_init_state(sps, 0.5, complex_mode=complex_mode)
        fn = (loops.clock_recovery_mm_cc if complex_mode
              else loops.clock_recovery_mm_ff)
        ys, nv, _ = fn(jnp.asarray(x), st, sps, go, gm, 0.005)
        ref = np.asarray(ys)[:int(nv)]

        W = 48
        xw = np.concatenate([np.zeros(W, x.dtype), x,
                             np.zeros(2 * W, x.dtype)])
        stw = loops.mm_windowed_init_state(sps, 0.5,
                                           complex_mode=complex_mode)
        fnw = (loops.clock_recovery_mm_cc_windowed if complex_mode
               else loops.clock_recovery_mm_ff_windowed)
        got, _ = fnw(jnp.asarray(xw), stw, sps, go, gm, 0.005, W=W)
        got = np.asarray(got)
        n = min(len(ref), len(got))
        assert n > 1000
        assert np.abs(ref[:n] - got[:n]).max() == 0.0

    @pytest.mark.slow
    def test_chunked_equals_whole_fractional_sps(self):
        """Chunked == whole at fractional sps: chunks advance by whole
        grid periods (symbols per chunk divisible by the rationalized
        denominator), so the floor grid tiles exactly."""
        from grtpu.digital import loops
        sps, nsym, W = 2.5, 1200, 32
        P, Q = loops.rationalize_sps(sps)
        base = self._signal(nsym, 3, False, seed=4)
        t = np.arange(0, len(base) - 2, 3 / sps)
        fr = (t % 1).astype(np.float32)
        x = ((1 - fr) * base[t.astype(int)] + fr * base[t.astype(int) + 1]
             ).astype(np.float32)
        xw = np.concatenate([np.zeros(W, np.float32), x])
        go, gm = 0.25 * 0.175 ** 2, 0.175
        st = loops.mm_windowed_init_state(sps, 0.5)
        whole, _ = loops.clock_recovery_mm_ff_windowed(
            jnp.asarray(xw), st, sps, go, gm, W=W)
        L = -(-P // Q) + 2 * W + loops.NTAPS
        st = loops.mm_windowed_init_state(sps, 0.5)
        parts = []
        Tc = 200
        assert Tc % Q == 0
        adv = Tc * P // Q                     # samples per chunk, exact
        pos = 0
        while pos + adv + L <= len(xw):
            seg = xw[pos: pos + adv + L]
            ys, st = loops.clock_recovery_mm_ff_windowed(
                jnp.asarray(seg), st, sps, go, gm, W=W)
            parts.append(np.asarray(ys)[:Tc])
            pos += adv
        got = np.concatenate(parts)
        n = min(len(got), len(np.asarray(whole)))
        assert n > 800
        assert np.abs(np.asarray(whole)[:n] - got[:n]).max() == 0.0

    def test_chunked_equals_whole(self):
        from grtpu.digital import loops
        sps, nsym, W = 4, 1200, 32
        x = self._signal(nsym, sps, False, seed=3)
        xw = np.concatenate([np.zeros(W, np.float32), x])
        st = loops.mm_windowed_init_state(float(sps), 0.5)
        whole, _ = loops.clock_recovery_mm_ff_windowed(
            jnp.asarray(xw), st, sps, 0.25 * 0.175 ** 2, 0.175, W=W)
        L = sps + 2 * W + loops.NTAPS
        st = loops.mm_windowed_init_state(float(sps), 0.5)
        parts = []
        Tc = 250                       # symbols per chunk
        pos = 0
        while pos + Tc * sps + L - sps <= len(xw):
            seg = xw[pos: pos + (Tc - 1) * sps + L]
            ys, st = loops.clock_recovery_mm_ff_windowed(
                jnp.asarray(seg), st, sps, 0.25 * 0.175 ** 2, 0.175, W=W)
            parts.append(np.asarray(ys))
            pos += Tc * sps
        got = np.concatenate(parts)
        n = min(len(got), len(np.asarray(whole)))
        assert n > 900
        assert np.abs(np.asarray(whole)[:n] - got[:n]).max() == 0.0


class TestBurstBank:
    def test_bank_matches_single_burst_demod(self):
        """demodulate_burst_bank == demodulate_burst per channel (same
        open-loop algorithm, vectorized on device)."""
        from grtpu.digital.modems import Fsk4Modem, awgn

        modem = Fsk4Modem(samples_per_symbol=10)
        rng = np.random.RandomState(4)
        C, nsym = 4, 200
        bursts, singles = [], []
        for c in range(C):
            dibits = rng.randint(0, 4, nsym)
            iq = np.asarray(modem.modulate(dibits))
            iq = awgn(iq, 20.0, seed=c)
            bursts.append(iq)
            singles.append(modem.demodulate_burst(iq))
        bank = modem.demodulate_burst_bank(np.stack(bursts))
        for c in range(C):
            n = min(len(singles[c]), bank.shape[1])
            # identical decisions (allow a couple of edge-symbol diffs from
            # the single-path's slightly different tail handling)
            diff = (bank[c][:n] != singles[c][:n]).sum()
            assert diff <= 2, f"ch {c}: {diff} mismatches"
