"""CVSD (continuously variable slope delta) codec as a per-bit lax.scan.

Reference behavior: gr-vocoder/lib/vocoder_cvsd_{encode_sb,decode_bs}.cc —
Bluetooth-flavoured CVSD: 1 bit per input sample, bits packed MSB-first into
bytes (encode is a sync_decimator by 8, decode a sync_interpolator by 8).
Per-bit feedback: sign comparison against an integer accumulator, step-size
adaptation on runs of J equal bits within a K-bit shift register, accumulator
decay and clamping.  Defaults are the Bluetooth parameters.

The reference encoder and decoder state machines are NOT mirror images, and
both quirks are reproduced here for parity:
  * the encoder adapts the step from the runner BEFORE shifting in the
    current bit; the decoder shifts first and adapts including it;
  * the decoder ORs the raw mask value (``byte & 2^(7-k)``, not 0/1) into
    its shift register (vocoder_cvsd_decode_bs.cc work loop), so decoder
    runner contents differ from the encoder's — harmless for the run test
    (all-ones/all-zeros of the low J bits) but faithfully kept.

The recurrence is strictly sequential per stream -> lax.scan over bits;
parallel throughput comes from vmapping independent channels.  Bit packing
(the sync_decimator/interpolator x8) is a reshape outside the scan.  The
step/accum decays are exact in float32 for the default (power-of-two
fraction) parameters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from grtpu.runtime.block import Block, port_b, port_s


def _round_half_up(x):
    """C's cvsd_round: floor(x + 0.5)."""
    return jnp.floor(x + 0.5).astype(jnp.int32)


class _CvsdParams:
    def __init__(self, min_step=10, max_step=1280, step_decay=0.9990234375,
                 accum_decay=0.96875, K=32, J=4,
                 pos_accum_max=32767, neg_accum_max=-32767):
        if K > 32 or J > K:
            raise ValueError("CVSD requires J <= K <= 32")
        self.min_step, self.max_step = min_step, max_step
        self.step_decay, self.accum_decay = step_decay, accum_decay
        self.K, self.J = K, J
        self.pos_accum_max, self.neg_accum_max = pos_accum_max, neg_accum_max
        self.j_mask = np.uint32((1 << J) - 1)


def cvsd_init_state(p: _CvsdParams):
    i32 = lambda v: jnp.asarray(v, jnp.int32)
    return (i32(0), i32(p.min_step), jnp.asarray(0, jnp.uint32), i32(1))


def _update_accum(p, accum, bit_nonzero, stepsize):
    accum = accum + jnp.where(bit_nonzero, stepsize, -stepsize)
    accum = _round_half_up(accum.astype(jnp.float32) * p.accum_decay)
    return jnp.clip(accum, p.neg_accum_max, p.pos_accum_max)


def _adapt_step(p, stepsize, runner, loop_counter):
    """Grow on a run of J equal bits in the low J of runner, else decay."""
    masked = runner & p.j_mask
    run = (masked == p.j_mask) | (masked == 0)
    grown = jnp.minimum(stepsize + p.min_step, p.max_step)
    decayed = jnp.maximum(
        _round_half_up(stepsize.astype(jnp.float32) * p.step_decay),
        p.min_step)
    return jnp.where(loop_counter >= p.J,
                     jnp.where(run, grown, decayed), stepsize)


def cvsd_encode_bits(p: _CvsdParams, state, pcm):
    """int16 samples -> one bit per sample (uint8 0/1)."""

    def step(carry, x):
        accum, stepsize, runner, loop_counter = carry
        bit = jnp.where(x.astype(jnp.int32) >= accum, 1, 0)
        accum = _update_accum(p, accum, bit != 0, stepsize)
        # Encoder order: adapt from the runner EXCLUDING the current bit.
        stepsize = _adapt_step(p, stepsize, runner, loop_counter)
        runner = (runner << 1) | bit.astype(jnp.uint32)
        loop_counter = jnp.where(loop_counter <= p.K,
                                 loop_counter + 1, loop_counter)
        return (accum, stepsize, runner, loop_counter), bit.astype(jnp.uint8)

    return jax.lax.scan(step, state, pcm)


def cvsd_decode_bits(p: _CvsdParams, state, bit_values):
    """Mask-valued bits (byte & 2^(7-k), as the reference decoder sees them)
    -> int16 samples (the post-update accumulator)."""

    def step(carry, bv):
        accum, stepsize, runner, loop_counter = carry
        # Decoder order: shift the (mask-valued) bit in FIRST, then adapt.
        runner = (runner << 1) | bv.astype(jnp.uint32)
        stepsize = _adapt_step(p, stepsize, runner, loop_counter)
        accum = _update_accum(p, accum, bv != 0, stepsize)
        loop_counter = jnp.where(loop_counter <= p.K,
                                 loop_counter + 1, loop_counter)
        return ((accum, stepsize, runner, loop_counter),
                accum.astype(jnp.int16))

    return jax.lax.scan(step, state, bit_values)


class CvsdEncode(Block):
    """vocoder_cvsd_encode_sb: int16 -> packed bits, 8 samples per byte."""

    in_ports = (port_s(),)
    out_ports = (port_b(),)
    decim = 8

    def __init__(self, name=None, **params):
        self.params = _CvsdParams(**params)
        super().__init__(name)

    def init_state(self):
        return cvsd_init_state(self.params)

    def apply(self, state, x):
        state, bits = cvsd_encode_bits(self.params, state, x)
        packed = jnp.sum(bits.reshape(-1, 8).astype(jnp.int32)
                         << np.arange(7, -1, -1), axis=-1)
        return state, packed.astype(jnp.uint8)


class CvsdDecode(Block):
    """vocoder_cvsd_decode_bs: packed bits -> int16, 8 samples per byte."""

    in_ports = (port_b(),)
    out_ports = (port_s(),)
    interp = 8

    def __init__(self, name=None, **params):
        self.params = _CvsdParams(**params)
        super().__init__(name)

    def init_state(self):
        return cvsd_init_state(self.params)

    def apply(self, state, x):
        # The reference pulls bits as byte & 2^(7-k) and feeds that raw mask
        # value into the state machine — reproduce exactly.
        bit_values = (x[:, None].astype(jnp.uint32)
                      & np.uint32(1 << np.arange(7, -1, -1))).reshape(-1)
        return cvsd_decode_bits(self.params, state, bit_values)


# ------------------------------------------------------------- blks2 wrappers
def _cvsd_hier():
    from grtpu.runtime.graph import HierBlock
    from grtpu.runtime.block import Port
    import jax.numpy as jnp

    class CvsdEncodeFB(HierBlock):
        """blks2.cvsd_encode (gr-vocoder/python/cvsd.py cvsd_encode_fb):
        float (+-1) -> x32000 -> interpolate -> float_to_short -> CVSD
        bits."""

        def __init__(self, resample: int = 8, bw: float = 0.5, name=None):
            super().__init__(name)
            from grtpu.blocks.gengen import MultiplyConst
            from grtpu.blocks.convert import FloatToShort
            from grtpu.blocks.filter import InterpFirFilter
            from grtpu.utils import firdes

            g = self.graph
            pin = g.add_input(Port(jnp.float32))
            pout = g.add_output(Port(jnp.uint8))
            taps = firdes.low_pass(resample, resample, bw, 2 * bw)
            g.connect(pin, MultiplyConst(32000.0, dtype=jnp.float32),
                      InterpFirFilter(resample, taps, "fff"),
                      FloatToShort(), CvsdEncode(), pout)

    class CvsdDecodeBF(HierBlock):
        """blks2.cvsd_decode (cvsd_decode_bf): CVSD bits -> shorts ->
        float -> decimating low-pass -> /32000."""

        def __init__(self, resample: int = 8, bw: float = 0.5, name=None):
            super().__init__(name)
            from grtpu.blocks.gengen import MultiplyConst
            from grtpu.blocks.convert import ShortToFloat
            from grtpu.blocks.filter import FirFilter
            from grtpu.utils import firdes

            g = self.graph
            pin = g.add_input(Port(jnp.uint8))
            pout = g.add_output(Port(jnp.float32))
            taps = firdes.low_pass(1, 1, bw, 2 * bw)
            g.connect(pin, CvsdDecode(), ShortToFloat(),
                      FirFilter(resample, taps, "fff"),
                      MultiplyConst(1.0 / 32000.0, dtype=jnp.float32), pout)

    return CvsdEncodeFB, CvsdDecodeBF


CvsdEncodeFB, CvsdDecodeBF = _cvsd_hier()
