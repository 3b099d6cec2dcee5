"""gr-trellis completion QA: interleaver, encoders, SISO extrinsics,
SCCC/PCCC turbo decoders, permutation + blockwise decoder blocks.

Mirrors the reference's trellis examples (gr-trellis/src/examples):
encode -> map to a constellation -> AWGN -> metrics -> iterative decode,
asserting exact recovery at high SNR and coding gain at moderate SNR.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from grtpu.trellis import (
    FSM, Interleaver, PcccDecoder, PcccEncoder, Permutation, ScccDecoder,
    ScccEncoder, SisoF, TrellisEncoder, TrellisMetrics, ViterbiDecoder,
    calc_metric_cost, fsm_utils, pccc_decoder, pccc_decoder_combined,
    sccc_decoder, sccc_decoder_combined, siso_cost, fsm_encode, viterbi,
)

# rate-1/2, 4-state RSC-ish feedforward code (awgn1o2_4.fsm analog):
# G = (1+D^2, 1+D+D^2) -> octal (5, 7)
FSM4 = FSM.from_convolutional(1, 2, [[0b101, 0b111]])
# Rate-2/3 inner code for SCCC (inner.I == outer.O == 4, O = 8 -> 8PSK):
# the reference's awgn2o3_4_msb.fsm — the (5,7) code applied to both input
# bits with the MSB output punctured (fsm_files/awgn2o3_4_msb.fsm; used by
# gr-trellis/src/examples/test_sccc_turbo.py).  A rate-1 inner would be
# catastrophic — SCCC needs inner redundancy.
FSM_INNER = FSM(4, 4, 8,
                NS=[0, 1, 2, 3] * 4,
                OS=[0, 5, 3, 6,
                    4, 1, 7, 2,
                    7, 2, 4, 1,
                    3, 6, 0, 5])

# 4-PAM mapping for 2-bit output symbols (example-style table)
PAM4 = np.array([-1.5, -0.5, 0.5, 1.5], np.float32)


def run_block(blk, x):
    state = blk.init_state()
    _, y = blk.apply(state, np.asarray(x))
    out = y[0] if isinstance(y, tuple) else y
    return np.asarray(out)


class TestInterleaver:
    def test_roundtrip_and_inverse(self):
        il = Interleaver.random(64, seed=3)
        x = np.arange(64)
        assert (il.deinterleave(il.interleave(x)) == x).all()
        assert (il.DEINTER[il.INTER] == np.arange(64)).all()

    def test_file_io(self, tmp_path):
        il = Interleaver.random(16, seed=1)
        p = tmp_path / "il.txt"
        il.write_interleaver_txt(str(p))
        il2 = Interleaver.from_file(str(p))
        assert (il2.INTER == il.INTER).all()

    def test_rejects_non_permutation(self):
        with pytest.raises(ValueError):
            Interleaver(4, [0, 1, 1, 3])


class TestEncoders:
    def test_trellis_encoder_streams_state(self):
        enc = TrellisEncoder(FSM4)
        bits = np.random.default_rng(0).integers(0, 2, 64)
        st = enc.init_state()
        st, y1 = enc.apply(st, bits[:32])
        st, y2 = enc.apply(st, bits[32:])
        full = FSM4.encode(bits)
        assert (np.concatenate([np.asarray(y1), np.asarray(y2)]) == full).all()

    def test_pccc_encoder_matches_composition(self):
        K = 32
        il = Interleaver.random(K, seed=5)
        enc = PcccEncoder(FSM4, 0, FSM4, 0, il, K)
        bits = np.random.default_rng(1).integers(0, 2, 2 * K)
        y = run_block(enc, bits)
        for b in range(2):
            blk = bits[b * K:(b + 1) * K]
            o1 = FSM4.encode(blk)
            o2 = FSM4.encode(blk[il.INTER])
            assert (y[b * K:(b + 1) * K] == o1 * FSM4.O + o2).all()

    def test_sccc_encoder_matches_composition(self):
        K = 32
        il = Interleaver.random(K, seed=6)
        enc = ScccEncoder(FSM4, 0, FSM_INNER, 0, il, K)
        bits = np.random.default_rng(2).integers(0, 2, K)
        y = run_block(enc, bits)
        mid = FSM4.encode(bits)
        expect = FSM_INNER.encode(mid[il.INTER])
        assert (y == expect).all()

    def test_sccc_wiring_check(self):
        with pytest.raises(ValueError):
            ScccEncoder(FSM_INNER, 0, FSM4, 0, Interleaver.identity(8), 8)


class TestSisoCost:
    def test_clean_metrics_recover_inputs(self):
        rng = np.random.default_rng(3)
        bits = rng.integers(0, 2, 64)
        syms = FSM4.encode(bits)
        obs = PAM4[syms]
        m = np.asarray(calc_metric_cost(obs, PAM4, 1))
        post = np.asarray(siso_cost(FSM4, np.zeros((64, 2), np.float32), m))
        assert (post.argmin(1) == bits).all()

    def test_posto_shape_and_consistency(self):
        rng = np.random.default_rng(4)
        bits = rng.integers(0, 2, 32)
        obs = PAM4[FSM4.encode(bits)]
        m = calc_metric_cost(obs, PAM4, 1)
        pi_, po_ = siso_cost(FSM4, np.zeros((32, 2), np.float32), m,
                             posti=True, posto=True)
        assert np.asarray(pi_).shape == (32, 2)
        assert np.asarray(po_).shape == (32, 4)
        # output posterior (which EXCLUDES the channel prior at step k,
        # core_algorithms.cc:504-519) must still favor the sent symbol on a
        # clean noiseless trellis-consistent sequence — except at the final
        # step, where the free end state leaves the last input (hence output
        # symbol) unconstrained by the surrounding path
        assert (np.asarray(po_).argmin(1)[:-1] == FSM4.encode(bits)[:-1]).all()

    @pytest.mark.parametrize("sum_product", [False, True])
    def test_posto_grouped_matches_masked(self, sum_product):
        """The grouped-by-output-symbol posto reduction must equal the
        direct masked formulation, including FSMs whose outputs have
        NON-uniform edge counts (exercises the INF padding)."""
        from grtpu.trellis.algorithms import INF, _reduce

        # 2-state FSM, O=3 with output 0 on two edges, 1 and 2 on one each
        fsm = FSM(2, 2, 3, NS=[0, 1, 0, 1], OS=[0, 1, 2, 0])
        rng = np.random.default_rng(11)
        K = 24
        pri = rng.random((K, fsm.I)).astype(np.float32)
        pro = rng.random((K, fsm.O)).astype(np.float32)
        pi_, po_ = siso_cost(fsm, pri, pro, 0, -1, posti=True, posto=True,
                             sum_product=sum_product)
        # reference masked formulation on the same alphas/betas — recompute
        # posteriors from scratch with the (K, S*I, O) mask
        import jax.numpy as jnp
        S, I = fsm.S, fsm.I
        NS = np.asarray(fsm.NS)
        # recover alphas/betas by re-running a posti-only call and solving
        # is overkill: instead compare po_ against a brute-force edge sweep
        ref = np.full((K, fsm.O), np.inf)
        al = np.full((S,), INF); al[0] = 0.0
        alphas = []
        OSm = np.asarray(fsm.OS)
        for t in range(K):
            alphas.append(al.copy())
            nxt = np.full((S,), np.inf)
            for s in range(S):
                for i in range(I):
                    c = al[s] + pri[t, i] + pro[t, OSm[s, i]]
                    d = NS[s, i]
                    nxt[d] = (min(nxt[d], c) if not sum_product else
                              -np.logaddexp(-nxt[d], -c))
            al = nxt - nxt.min()
        be = np.zeros((S,))
        betas = [None] * K
        for t in range(K - 1, -1, -1):
            betas[t] = be.copy()
            prv = np.full((S,), np.inf)
            for s in range(S):
                for i in range(I):
                    c = be[NS[s, i]] + pri[t, i] + pro[t, OSm[s, i]]
                    prv[s] = (min(prv[s], c) if not sum_product else
                              -np.logaddexp(-prv[s], -c))
            be = prv - prv.min()
        for t in range(K):
            for s in range(S):
                for i in range(I):
                    c = alphas[t][s] + pri[t, i] + betas[t][NS[s, i]]
                    n = OSm[s, i]
                    ref[t, n] = (min(ref[t, n], c) if not sum_product else
                                 -np.logaddexp(-ref[t, n], -c))
        ref = ref - ref.min(axis=1, keepdims=True)
        np.testing.assert_allclose(np.asarray(po_), ref, atol=2e-4)

    def test_sum_product_matches_minsum_at_high_confidence(self):
        rng = np.random.default_rng(5)
        bits = rng.integers(0, 2, 48)
        obs = PAM4[FSM4.encode(bits)] + 0.01 * rng.standard_normal(48)
        m = calc_metric_cost(np.float32(obs), PAM4, 1) * 50.0
        a = np.asarray(siso_cost(FSM4, np.zeros((48, 2), np.float32), m))
        b = np.asarray(siso_cost(FSM4, np.zeros((48, 2), np.float32), m,
                                 sum_product=True))
        assert (a.argmin(1) == b.argmin(1)).all()


def _pam_table_pccc():
    """Combined-symbol table: 2-D observation (pam(o1), pam(o2))."""
    t = np.zeros((FSM4.O * FSM4.O, 2), np.float32)
    for o1 in range(FSM4.O):
        for o2 in range(FSM4.O):
            t[o1 * FSM4.O + o2] = (PAM4[o1], PAM4[o2])
    return t


class TestPccc:
    K = 128

    def _loopback(self, snr_db, iterations=8, seed=0, sum_product=False):
        rng = np.random.default_rng(seed)
        il = Interleaver.random(self.K, seed=11)
        bits = rng.integers(0, 2, self.K)
        o1 = FSM4.encode(bits)
        o2 = FSM4.encode(bits[il.INTER])
        obs = np.stack([PAM4[o1], PAM4[o2]], 1).astype(np.float32)  # (K, 2)
        es = np.mean(PAM4 ** 2) * 2
        sigma = np.sqrt(es / 2 / 10 ** (snr_db / 10))
        obs += sigma * rng.standard_normal(obs.shape).astype(np.float32)
        dec = np.asarray(pccc_decoder_combined(
            FSM4, FSM4, il, obs.reshape(-1), _pam_table_pccc(), dim=2,
            scaling=1.0 / max(sigma ** 2, 1e-6), iterations=iterations,
            sum_product=sum_product, st1k=-1, st2k=-1))
        return bits, dec

    def test_noiseless_exact(self):
        bits, dec = self._loopback(snr_db=40.0, iterations=4)
        assert (dec == bits).all()

    def test_turbo_gain_at_low_snr(self):
        """Near the code threshold the turbo decode must beat 1 iteration."""
        errs_1 = errs_8 = total = 0
        for seed in range(4):
            bits, d1 = self._loopback(5.0, iterations=1, seed=seed)
            _, d8 = self._loopback(5.0, iterations=8, seed=seed)
            errs_1 += int((d1 != bits).sum())
            errs_8 += int((d8 != bits).sum())
            total += len(bits)
        assert errs_8 <= errs_1
        assert errs_8 / total < 0.05

    def test_decoder_block(self):
        il = Interleaver.random(self.K, seed=11)
        rng = np.random.default_rng(7)
        bits = rng.integers(0, 2, self.K)
        enc = PcccEncoder(FSM4, 0, FSM4, 0, il, self.K)
        comb = run_block(enc, bits)
        m = np.zeros((self.K, FSM4.O * FSM4.O), np.float32) + 10.0
        m[np.arange(self.K), comb] = 0.0
        dec = PcccDecoder(FSM4, 0, -1, FSM4, 0, -1, il, self.K,
                          iterations=4)
        out = run_block(dec, m.reshape(-1))
        assert (out == bits).all()


class TestSccc:
    K = 128
    # 8PSK, natural mapping — the modulation test_sccc_turbo.py pairs with
    # the msb inner code (fsm_utils.psk8).
    PSK8 = np.exp(2j * np.pi * np.arange(8) / 8).astype(np.complex64)

    def _encode(self, bits, il):
        mid = FSM4.encode(bits)
        return FSM_INNER.encode(mid[il.INTER])

    def _loopback(self, snr_db, iterations=8, seed=0):
        rng = np.random.default_rng(seed)
        il = Interleaver.random(self.K, seed=21)
        bits = rng.integers(0, 2, self.K)
        syms = self._encode(bits, il)
        obs = self.PSK8[syms]
        sigma = np.sqrt(1.0 / 10 ** (snr_db / 10) / 2)
        obs = obs + sigma * (rng.standard_normal(self.K)
                             + 1j * rng.standard_normal(self.K))
        dec = np.asarray(sccc_decoder_combined(
            FSM4, FSM_INNER, il, obs.astype(np.complex64), self.PSK8,
            dim=1, scaling=1.0 / max(2 * sigma ** 2, 1e-6),
            iterations=iterations))
        return bits, dec

    def test_noiseless_exact(self):
        bits, dec = self._loopback(snr_db=40.0, iterations=4)
        assert (dec == bits).all()

    def test_iteration_gain(self):
        errs_1 = errs_8 = total = 0
        for seed in range(4):
            bits, d1 = self._loopback(7.0, iterations=1, seed=seed)
            _, d8 = self._loopback(7.0, iterations=8, seed=seed)
            errs_1 += int((d1 != bits).sum())
            errs_8 += int((d8 != bits).sum())
            total += len(bits)
        assert errs_8 <= errs_1
        assert errs_8 / total < 0.05

    def test_decoder_block_roundtrip(self):
        il = Interleaver.random(self.K, seed=21)
        rng = np.random.default_rng(9)
        bits = rng.integers(0, 2, 2 * self.K)   # two K-blocks
        enc = ScccEncoder(FSM4, 0, FSM_INNER, 0, il, self.K)
        syms = run_block(enc, bits)
        obs = self.PSK8[syms]
        m = np.asarray(calc_metric_cost(obs, self.PSK8, 1))
        dec = ScccDecoder(FSM4, 0, -1, FSM_INNER, 0, -1, il, self.K,
                          iterations=4)
        out = run_block(dec, m.reshape(-1))
        assert (out == bits).all()


class TestParallelTrellis:
    """The log-depth tropical-semiring formulation must match the O(K)
    sequential scans (algorithms._viterbi_parallel / _alphas_parallel)."""

    ISI = FSM.from_isi(4, 3)   # S = 16, the auto-enable boundary

    @pytest.mark.parametrize(
        "fsm", [FSM4, FSM_INNER,
                pytest.param(ISI, marks=pytest.mark.slow)],
        ids=["fsm4", "msb", "isi16"])
    def test_viterbi_parallel_equals_sequential(self, fsm):
        from grtpu.trellis.algorithms import viterbi as vit
        rng = np.random.default_rng(7)
        for T in (5, 64, 257):
            m = rng.standard_normal((T, fsm.O)).astype(np.float32)
            for ss, es in [(0, -1), (0, 0), (-1, -1)]:
                a = np.asarray(vit(fsm, jnp.asarray(m), ss, es,
                                   parallel=False))
                b = np.asarray(vit(fsm, jnp.asarray(m), ss, es,
                                   parallel=True))
                assert (a == b).all(), (T, ss, es)

    @pytest.mark.parametrize(
        "fsm", [FSM4, FSM_INNER,
                pytest.param(ISI, marks=pytest.mark.slow)],
        ids=["fsm4", "msb", "isi16"])
    @pytest.mark.parametrize("sum_product", [False, True])
    def test_siso_parallel_equals_sequential(self, fsm, sum_product):
        rng = np.random.default_rng(8)
        for T in (5, 64):
            pri = np.abs(rng.standard_normal((T, fsm.I))).astype(np.float32)
            pro = np.abs(rng.standard_normal((T, fsm.O))).astype(np.float32)
            for ss, es in [(0, -1), (-1, -1), (0, 0)]:
                s1 = siso_cost(fsm, pri, pro, ss, es, posti=True, posto=True,
                               sum_product=sum_product, parallel=False)
                s2 = siso_cost(fsm, pri, pro, ss, es, posti=True, posto=True,
                               sum_product=sum_product, parallel=True)
                for x, y in zip(s1, s2):
                    x, y = np.asarray(x), np.asarray(y)
                    finite = (x < 1e8) & (y < 1e8)
                    assert np.allclose(x[finite], y[finite], atol=2e-3)

    def test_turbo_decoders_accept_parallel_flag(self):
        rng = np.random.default_rng(9)
        K = 64
        il = Interleaver.random(K, seed=1)
        bits = rng.integers(0, 2, K)
        mid = FSM4.encode(bits)
        syms = FSM_INNER.encode(np.asarray(mid)[il.INTER])
        m = np.full((K, FSM_INNER.O), 10.0, np.float32)
        m[np.arange(K), syms] = 0.0
        for par in (False, True):
            dec = np.asarray(sccc_decoder(FSM4, FSM_INNER, il, m, 4,
                                          parallel=par))
            assert (dec == bits).all()

    def test_parallel_mode_policy(self):
        """Default is the sequential scan (faster for batched blocks);
        parallel is opt-in and rejects large state counts (S^3 blowup)."""
        from grtpu.trellis.algorithms import _use_parallel
        assert not _use_parallel(4, None)
        assert _use_parallel(16, True)
        with pytest.raises(ValueError):
            _use_parallel(64, True)


class TestTurboEqualization:
    """test_turbo_equalization.py: the ISI trellis as SCCC inner code."""

    K = 64
    CHANNEL = [0.9, 0.4, -0.3]

    def _loopback(self, esn0_db, iterations, seed=0):
        fsm_i = FSM.from_isi(4, len(self.CHANNEL))
        dim, lookup = fsm_utils.make_isi_lookup(
            fsm_utils.pam4, list(self.CHANNEL), True)
        lut = np.asarray(lookup, np.float32)
        il = Interleaver.random(self.K, seed=666)
        rng = np.random.default_rng(seed)
        bits = rng.integers(0, 2, self.K)
        mid = FSM4.encode(bits)
        out = fsm_i.encode(np.asarray(mid)[il.INTER])
        es = float(np.mean(lut ** 2))
        n0 = es / 10 ** (esn0_db / 10)
        rx = (lut[out] + np.sqrt(n0 / 2)
              * rng.standard_normal(self.K)).astype(np.float32)
        m = calc_metric_cost(rx, lut, dim)
        dec = np.asarray(sccc_decoder(FSM4, fsm_i, il, m, iterations))
        return bits, dec

    def test_high_snr_exact(self):
        bits, dec = self._loopback(25.0, iterations=4)
        assert (dec == bits).all()

    @pytest.mark.slow
    def test_iteration_gain(self):
        errs_1 = errs_6 = total = 0
        for seed in range(4):
            bits, d1 = self._loopback(9.0, 1, seed)
            _, d6 = self._loopback(9.0, 6, seed)
            errs_1 += int((d1 != bits).sum())
            errs_6 += int((d6 != bits).sum())
            total += len(bits)
        assert errs_6 <= errs_1
        assert errs_6 / total < 0.05


class TestFsmConstructors:
    def test_isi_viterbi_equalization(self):
        """test_viterbi_equalization.py: FSM(mod_size, ch_length) + the
        make_isi_lookup table equalize a noisy ISI channel via Viterbi."""
        channel = [0.9, 0.3, -0.2]
        mod = fsm_utils.pam4
        fsm = FSM.from_isi(len(mod[1]), len(channel))
        dim, lookup = fsm_utils.make_isi_lookup(mod, channel, normalize=True)
        rng = np.random.default_rng(0)
        K = 256
        data = rng.integers(0, 4, K)
        _, out = fsm_encode(fsm, data)     # output = ISI word index
        rx = np.asarray(lookup, np.float32)[np.asarray(out)]
        rx = rx + 0.05 * rng.standard_normal(K).astype(np.float32)
        m = calc_metric_cost(rx, np.asarray(lookup, np.float32), dim)
        dec = np.asarray(viterbi(fsm, -np.asarray(m), 0, -1))
        assert (dec == data).mean() > 0.99

    def test_cpm_fsm_shapes_and_phase_state(self):
        P, M, L = 4, 2, 2
        fsm = FSM.from_cpm(P, M, L)
        assert (fsm.I, fsm.S, fsm.O) == (M, (M ** (L - 1)) * P, (M ** L) * P)
        # every state reachable: termination table finite everywhere
        assert (fsm.TMl < fsm.S).all()

    def test_product_fsm_tracks_componentwise_run(self):
        f1 = FSM4
        f2 = FSM.from_isi(2, 2)
        fp = FSM.from_product(f1, f2)
        rng = np.random.default_rng(1)
        i1 = rng.integers(0, f1.I, 32)
        i2 = rng.integers(0, f2.I, 32)
        _, o1 = fsm_encode(f1, i1)
        _, o2 = fsm_encode(f2, i2)
        _, op = fsm_encode(fp, i1 * f2.I + i2)
        assert (np.asarray(op) ==
                np.asarray(o1) * f2.O + np.asarray(o2)).all()

    def test_radix_fsm_groups_steps(self):
        n = 2
        fr = FSM4.radix(n)
        rng = np.random.default_rng(2)
        bits = rng.integers(0, 2, 32)
        _, o = fsm_encode(FSM4, bits)
        o = np.asarray(o)
        grouped_in = bits.reshape(-1, n) @ (FSM4.I ** np.arange(n - 1, -1, -1))
        _, og = fsm_encode(fr, grouped_in)
        expect = o.reshape(-1, n) @ (FSM4.O ** np.arange(n - 1, -1, -1))
        assert (np.asarray(og) == expect).all()

    def test_termination_tables_and_inputs(self):
        fsm = FSM4
        assert (fsm.TMl < fsm.S).all()   # fully connected
        for s in range(fsm.S):
            seq = fsm.termination_inputs(s, 0)
            assert len(seq) == fsm.TMl[s, 0]
            st = s
            for i in seq:
                st = int(fsm.NS[st, i])
            assert st == 0

    def test_write_fsm_txt_roundtrip(self, tmp_path):
        p = tmp_path / "f.fsm"
        FSM_INNER.write_fsm_txt(str(p))
        f2 = FSM.from_file(str(p))
        assert (f2.NS == FSM_INNER.NS).all() and (f2.OS == FSM_INNER.OS).all()

    def test_cpm_signal_decomposition(self):
        # MSK: h = 1/2 (K=1, P=2), M=2, L=1, rectangular pulse -> q ramps
        # to 1/2; the decomposition must reconstruct SS from the reduced
        # basis to `frac` accuracy and yield unit-ish energies.
        Q = 32
        q = np.arange(1, Q + 1) / (2 * Q)
        f0, SS, S, F, Sf, Ff, N = fsm_utils.make_cpm_signals(
            1, 2, 2, 1, q, frac=0.9999)
        assert SS.shape == (Q, 4)
        # full basis reconstructs exactly
        assert np.allclose(F @ S, SS, atol=1e-9)
        # reduced basis keeps >= 99.99% of energy
        err = np.linalg.norm(Ff @ Sf - SS) / np.linalg.norm(SS)
        assert err < 0.02
        assert 1 <= N <= S.shape[0]


class TestBlocks:
    def test_permutation_blocks(self):
        il = Interleaver.random(8, seed=2)
        fwd = Permutation(8, il.INTER, syms_per_block=2)
        inv = Permutation(8, il.DEINTER, syms_per_block=2)
        x = np.arange(32, dtype=np.float32)
        y = run_block(fwd, x)
        assert not (y == x).all()
        z = run_block(inv, y)
        assert (z == x).all()

    def test_metrics_then_viterbi_blocks(self):
        rng = np.random.default_rng(12)
        bits = rng.integers(0, 2, 64)
        obs = PAM4[FSM4.encode(bits)].astype(np.float32)
        met = TrellisMetrics(FSM4.O, 1, PAM4)
        m = run_block(met, obs)
        assert m.shape == (64 * FSM4.O,)
        vit = ViterbiDecoder(FSM4, K=64, S0=0, SK=-1)
        out = run_block(vit, m)
        assert (out == bits).all()

    def test_siso_block(self):
        rng = np.random.default_rng(13)
        bits = rng.integers(0, 2, 32)
        obs = PAM4[FSM4.encode(bits)].astype(np.float32)
        m = run_block(TrellisMetrics(FSM4.O, 1, PAM4), obs)
        siso = SisoF(FSM4, K=32)
        post = run_block(siso, m).reshape(32, FSM4.I)
        assert (post.argmin(1) == bits).all()
