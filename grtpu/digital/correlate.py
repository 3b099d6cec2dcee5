"""Vectorized stream correlators.

Analogs:
  * digital_correlate_access_code_bb (gr-digital/lib/): bit stream in,
    flag stream out — flag bit set on the bit FOLLOWING a <=threshold-error
    access-code match.
  * gr_correlate_access_code_tag_bb: same detection, emitted as stream tags.
  * gr_pn_correlator_cc, gr_simple_correlator (§2.4 coding/framing group).

TPU-native: the reference shifts one 64-bit register per sample; here the
whole time-block's sliding mismatch counts come from one +-1 correlation
(an MXU/VPU-friendly FIR with the code as taps).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from grtpu.ops.fir import fir_filter
from grtpu.runtime.block import Block, Port


def access_code_detect(bits: jnp.ndarray, code_bits: np.ndarray,
                       threshold: int = 0) -> jnp.ndarray:
    """Sliding access-code match over a bit stream.

    bits: (n + L - 1,) uint8 carrying L-1 history.
    Returns (n,) uint8 flags: flag[i] == 1 iff the L bits ENDING at i (i.e.
    bits[i-L+1..i] in stream coordinates) match within threshold errors —
    the reference's semantics of flagging on the last code bit.
    """
    code = np.asarray(code_bits, np.float32) * 2 - 1
    s = bits.astype(jnp.float32) * 2 - 1
    # correlation with the code as FIR taps (convolution orientation needs
    # the reversed code)
    corr = fir_filter(s, jnp.asarray(code[::-1].copy()), 1)
    L = len(code)
    errs = (L - corr) / 2
    return (errs <= threshold + 0.5).astype(jnp.uint8)


class CorrelateAccessCode(Block):
    """digital_correlate_access_code_bb: bits in (LSB), bits out with flag
    in bit 1 (0x2) on the bit following a match (payload start)."""

    def __init__(self, access_code_bits, threshold: int = 0, name=None):
        self.in_ports = (Port(jnp.uint8),)
        self.out_ports = (Port(jnp.uint8),)
        code = np.asarray(access_code_bits, np.uint8)
        self.history = len(code) + 1
        super().__init__(name)
        self.code = code
        self.threshold = threshold

    def apply(self, state, x):
        n = x.shape[0] - (self.history - 1)
        # flags for windows ending at the PREVIOUS bit -> flag on following
        flags = access_code_detect(x[:-1] & 1, self.code, self.threshold)
        data = (x[self.history - 1:] & 1).astype(jnp.uint8)
        return state, (data | (flags << 1)).astype(jnp.uint8)


class PnCorrelator(Block):
    """gr_pn_correlator_cc: correlate against a +-1 PN sequence, one output
    per full period (decimating by the sequence length)."""

    def __init__(self, degree: int, mask: int = 0, seed: int = 1, name=None):
        from grtpu.digital.lfsr import GLFSR

        length = (1 << degree) - 1
        g = GLFSR(mask if mask else GLFSR.default_mask(degree), seed)
        pn = np.array([2 * g.next_bit() - 1 for _ in range(length)], np.float32)
        self.in_ports = (Port(jnp.complex64),)
        self.out_ports = (Port(jnp.complex64),)
        self.decim = length
        super().__init__(name)
        self.pn = pn
        self.length = length

    def apply(self, state, x):
        g = x.reshape(-1, self.length)
        return state, (g * jnp.asarray(self.pn)[None, :]).sum(axis=1) / self.length
