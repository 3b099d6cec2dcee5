"""Trellis module tests: FSM construction, Viterbi, SISO."""

import numpy as np
import jax.numpy as jnp
import pytest

from grtpu.trellis.fsm import FSM
from grtpu.trellis.algorithms import (
    calc_metric_euclidean, calc_metric_hard, siso, viterbi, viterbi_combined,
)

RNG = np.random.RandomState(33)


def k3_fsm():
    """Rate-1/2 K=3 (7,5) code: the gr-trellis documentation example."""
    return FSM.from_convolutional(1, 2, [[7, 5]])


class TestFsm:
    def test_structure(self):
        f = k3_fsm()
        assert f.I == 2 and f.S == 4 and f.O == 4
        # every state has exactly 2 predecessors
        assert (f.PS >= 0).all()

    def test_encode_known(self):
        f = k3_fsm()
        out = f.encode([1, 0, 1, 1, 0, 0])
        # (7,5): input 1 from state 0 -> out bits (1,1) = 3
        assert out[0] == 3

    def test_file_roundtrip(self, tmp_path):
        f = k3_fsm()
        p = tmp_path / "code.fsm"
        body = [f"{f.I} {f.S} {f.O}", ""]
        body.append("\n".join(" ".join(str(v) for v in row) for row in f.NS))
        body.append("")
        body.append("\n".join(" ".join(str(v) for v in row) for row in f.OS))
        p.write_text("\n".join(body))
        g = FSM.from_file(str(p))
        np.testing.assert_array_equal(f.NS, g.NS)
        np.testing.assert_array_equal(f.OS, g.OS)


class TestViterbi:
    def test_hard_clean(self):
        f = k3_fsm()
        bits = RNG.randint(0, 2, 200)
        bits[-2:] = 0
        syms = f.encode(bits)
        m = calc_metric_hard(jnp.asarray(syms), f.O)
        dec = np.asarray(viterbi(f, m, 0, 0))
        np.testing.assert_array_equal(dec, bits)

    def test_hard_with_errors(self):
        f = k3_fsm()
        bits = RNG.randint(0, 2, 400)
        bits[-2:] = 0
        syms = f.encode(bits).copy()
        flips = RNG.choice(len(syms), 12, replace=False)
        syms[flips] ^= RNG.randint(1, 4, 12)
        m = calc_metric_hard(jnp.asarray(syms), f.O)
        dec = np.asarray(viterbi(f, m, 0, 0))
        assert (dec != bits).mean() < 0.03

    def test_euclidean_qpsk(self):
        """viterbi_combined over a QPSK-mapped stream with AWGN
        (the test_tcm example flow)."""
        f = k3_fsm()
        pts = np.exp(1j * (np.pi / 4 + np.pi / 2 * np.arange(4))).astype(
            np.complex64)
        bits = RNG.randint(0, 2, 500)
        bits[-2:] = 0
        syms = f.encode(bits)
        tx = pts[syms]
        rx = tx + 0.3 * (RNG.randn(len(tx)) + 1j * RNG.randn(len(tx)))
        dec = np.asarray(viterbi_combined(
            f, jnp.asarray(rx.astype(np.complex64)), jnp.asarray(pts),
            1, 0, 0))
        assert (dec != bits).mean() < 0.01

    def test_ccsds_fsm_matches_dedicated(self):
        """FSM-driven Viterbi decodes the dedicated CCSDS encoder's output."""
        from grtpu.fec.conv import conv_encode_27

        # FSM convention holds the newest bit at the register MSB, i.e.
        # generators are bit-reversed relative to fec.conv's LSB-newest:
        # rev7(0o171) = 0o117, rev7(0o133) = 0o155
        f = FSM.from_convolutional(1, 2, [[0o117, 0o155]])
        assert f.S == 64
        bits = RNG.randint(0, 2, 300).astype(np.uint8)
        bits[-6:] = 0
        enc_bits = np.asarray(conv_encode_27(jnp.asarray(bits)))
        syms = (enc_bits[0::2] << 1) | enc_bits[1::2]
        m = calc_metric_hard(jnp.asarray(syms), 4)
        dec = np.asarray(viterbi(f, m, 0, -1))
        assert (dec != bits).mean() < 0.01


class TestSiso:
    def test_app_signs(self):
        f = k3_fsm()
        bits = RNG.randint(0, 2, 150)
        bits[-2:] = 0
        syms = f.encode(bits)
        m = calc_metric_hard(jnp.asarray(syms), f.O)
        apps = np.asarray(siso(f, m, 0, 0))  # (T, 2)
        hard = apps.argmax(axis=1)
        np.testing.assert_array_equal(hard, bits)

    def test_soft_metrics_improve(self):
        f = k3_fsm()
        pts = np.exp(1j * (np.pi / 4 + np.pi / 2 * np.arange(4))).astype(
            np.complex64)
        bits = RNG.randint(0, 2, 400)
        bits[-2:] = 0
        syms = f.encode(bits)
        rx = pts[syms] + 0.4 * (RNG.randn(len(syms)) + 1j * RNG.randn(len(syms)))
        m = calc_metric_euclidean(jnp.asarray(rx.astype(np.complex64)),
                                  jnp.asarray(pts))
        apps = np.asarray(siso(f, m, 0, 0))
        hard = apps.argmax(axis=1)
        assert (hard != bits).mean() < 0.02
