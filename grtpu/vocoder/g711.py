"""G.711 A-law / mu-law companding — branchless VPU elementwise ops.

Reference behavior: gr-vocoder/lib/vocoder_{alaw,ulaw}_{encode_sb,decode_bs}.cc
calling the Sun g711 conversions (gr-vocoder/lib/g7xx/g711.c:113-280).  The
reference runs a scalar table search per sample; here each conversion is a
fixed dag of compares/shifts over the whole time-block (no tables, no
branches), which XLA fuses into neighbouring ops.

Conventions (matching the reference exactly, verified bit-for-bit over all
65536 inputs in tests/test_vocoder.py):
  * A-law: 16-bit two's-complement in, segment ends {0xFF..0x7FFF}, negative
    values mapped as ``-x - 8``, result XORed with 0x55 (sign bit SET for
    non-negative).
  * mu-law: bias 0x84 added to magnitude, same segment ends, complemented
    code word out.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from grtpu.runtime.block import Block, port_b, port_s

# Segment upper bounds shared by both laws (g711.c:38-39).
_SEG_END = np.array([0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF],
                    np.int32)
_BIAS = 0x84


def _seg_number(mag):
    """Index of the first segment end >= mag (8 = out of range)."""
    return jnp.sum(mag[..., None] > _SEG_END, axis=-1).astype(jnp.int32)


def linear_to_alaw(pcm):
    """int16 linear PCM -> uint8 A-law (g711.c:113-142 semantics)."""
    x = pcm.astype(jnp.int32)
    neg = x < 0
    mask = jnp.where(neg, 0x55, 0xD5)
    mag = jnp.where(neg, -x - 8, x)
    seg = _seg_number(mag)
    shift = jnp.where(seg < 2, 4, seg + 3)
    aval = (seg << 4) | ((mag >> shift) & 0xF)
    code = jnp.where(seg >= 8, 0x7F, aval) ^ mask
    return code.astype(jnp.uint8)


def alaw_to_linear(code):
    """uint8 A-law -> int16 linear PCM (g711.c:149-173 semantics)."""
    a = code.astype(jnp.int32) ^ 0x55
    t = (a & 0xF) << 4
    seg = (a & 0x70) >> 4
    t = jnp.where(seg == 0, t + 8,
                  (t + 0x108) << jnp.maximum(seg - 1, 0))
    return jnp.where((a & 0x80) != 0, t, -t).astype(jnp.int16)


def linear_to_ulaw(pcm):
    """int16 linear PCM -> uint8 mu-law (g711.c:205-236 semantics)."""
    x = pcm.astype(jnp.int32)
    neg = x < 0
    mask = jnp.where(neg, 0x7F, 0xFF)
    mag = jnp.where(neg, _BIAS - x, x + _BIAS)
    seg = _seg_number(mag)
    uval = (seg << 4) | ((mag >> (seg + 3)) & 0xF)
    code = jnp.where(seg >= 8, 0x7F, uval) ^ mask
    return code.astype(jnp.uint8)


def ulaw_to_linear(code):
    """uint8 mu-law -> int16 linear PCM (g711.c:247-264 semantics)."""
    u = (~code.astype(jnp.int32)) & 0xFF
    t = (((u & 0xF) << 3) + _BIAS) << ((u & 0x70) >> 4)
    return jnp.where((u & 0x80) != 0, _BIAS - t, t - _BIAS).astype(jnp.int16)


def alaw_to_ulaw(code):
    """Direct A-law -> mu-law transcode (composition; g711.c:276-300 analog)."""
    return linear_to_ulaw(alaw_to_linear(code))


def ulaw_to_alaw(code):
    """Direct mu-law -> A-law transcode."""
    return linear_to_alaw(ulaw_to_linear(code))


class _ElementwiseCodec(Block):
    _fn = None

    def apply(self, state, x):
        return state, type(self)._fn(x)


class AlawEncode(_ElementwiseCodec):
    """vocoder_alaw_encode_sb: int16 PCM stream -> A-law byte stream."""
    in_ports = (port_s(),)
    out_ports = (port_b(),)
    _fn = staticmethod(linear_to_alaw)


class AlawDecode(_ElementwiseCodec):
    """vocoder_alaw_decode_bs: A-law byte stream -> int16 PCM stream."""
    in_ports = (port_b(),)
    out_ports = (port_s(),)
    _fn = staticmethod(alaw_to_linear)


class UlawEncode(_ElementwiseCodec):
    """vocoder_ulaw_encode_sb: int16 PCM stream -> mu-law byte stream."""
    in_ports = (port_s(),)
    out_ports = (port_b(),)
    _fn = staticmethod(linear_to_ulaw)


class UlawDecode(_ElementwiseCodec):
    """vocoder_ulaw_decode_bs: mu-law byte stream -> int16 PCM stream."""
    in_ports = (port_b(),)
    out_ports = (port_s(),)
    _fn = staticmethod(ulaw_to_linear)
