"""Type-conversion blocks.

Analogs of gnuradio-core/src/lib/general type converters (SURVEY.md §2.4):
gr_complex_to_{float,real,imag,mag,mag_squared,arg}, gr_float_to_complex,
gr_{char,short,int,float}_to_* scaling converts, and interleaved-short <->
complex used by USRP-format captures.
"""

from __future__ import annotations

import jax.numpy as jnp

from grtpu.runtime.block import Block, Port


class ComplexToFloat(Block):
    """gr_complex_to_float: 1 complex in -> (re, im) float outs."""

    def __init__(self, name=None):
        self.in_ports = (Port(jnp.complex64),)
        self.out_ports = (Port(jnp.float32), Port(jnp.float32))
        super().__init__(name)

    def apply(self, state, x):
        return state, (jnp.real(x), jnp.imag(x))


class _C2F(Block):
    def __init__(self, name=None):
        self.in_ports = (Port(jnp.complex64),)
        self.out_ports = (Port(jnp.float32),)
        super().__init__(name)


class ComplexToReal(_C2F):
    def apply(self, state, x):
        return state, jnp.real(x)


class ComplexToImag(_C2F):
    def apply(self, state, x):
        return state, jnp.imag(x)


class ComplexToMag(_C2F):
    def apply(self, state, x):
        return state, jnp.abs(x)


class ComplexToMagSquared(_C2F):
    def apply(self, state, x):
        return state, jnp.real(x) ** 2 + jnp.imag(x) ** 2


class ComplexToArg(_C2F):
    def apply(self, state, x):
        return state, jnp.arctan2(jnp.imag(x), jnp.real(x))


class FloatToComplex(Block):
    """gr_float_to_complex: (re[, im]) -> complex."""

    def __init__(self, nin: int = 2, name=None):
        self.in_ports = tuple(Port(jnp.float32) for _ in range(nin))
        self.out_ports = (Port(jnp.complex64),)
        super().__init__(name)
        self.nin = nin

    def apply(self, state, re, im=None):
        if im is None:
            im = jnp.zeros_like(re)
        return state, (re + 1j * im).astype(jnp.complex64)


class _Scale(Block):
    def __init__(self, in_dtype, out_dtype, scale: float = 1.0, name=None):
        self.in_ports = (Port(in_dtype),)
        self.out_ports = (Port(out_dtype),)
        super().__init__(name)
        self.scale = scale
        self._out = jnp.dtype(out_dtype)


class FloatToShort(_Scale):
    def __init__(self, scale: float = 1.0, name=None):
        super().__init__(jnp.float32, jnp.int16, scale, name)

    def apply(self, state, x):
        return state, jnp.clip(jnp.round(x * self.scale), -32768, 32767).astype(jnp.int16)


class FloatToChar(_Scale):
    def __init__(self, scale: float = 1.0, name=None):
        super().__init__(jnp.float32, jnp.int8, scale, name)

    def apply(self, state, x):
        return state, jnp.clip(jnp.round(x * self.scale), -128, 127).astype(jnp.int8)


class FloatToUChar(_Scale):
    def __init__(self, name=None):
        super().__init__(jnp.float32, jnp.uint8, 1.0, name)

    def apply(self, state, x):
        return state, jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)


class FloatToInt(_Scale):
    def __init__(self, scale: float = 1.0, name=None):
        super().__init__(jnp.float32, jnp.int32, scale, name)

    def apply(self, state, x):
        return state, jnp.round(x * self.scale).astype(jnp.int32)


class ShortToFloat(_Scale):
    def __init__(self, scale: float = 1.0, name=None):
        super().__init__(jnp.int16, jnp.float32, scale, name)

    def apply(self, state, x):
        return state, x.astype(jnp.float32) * self.scale


class CharToFloat(_Scale):
    def __init__(self, scale: float = 1.0, name=None):
        super().__init__(jnp.int8, jnp.float32, scale, name)

    def apply(self, state, x):
        return state, x.astype(jnp.float32) * self.scale


class UCharToFloat(_Scale):
    def __init__(self, name=None):
        super().__init__(jnp.uint8, jnp.float32, 1.0, name)

    def apply(self, state, x):
        return state, x.astype(jnp.float32)


class IntToFloat(_Scale):
    def __init__(self, scale: float = 1.0, name=None):
        super().__init__(jnp.int32, jnp.float32, scale, name)

    def apply(self, state, x):
        return state, x.astype(jnp.float32) * self.scale


class InterleavedShortToComplex(Block):
    """gr_interleaved_short_to_complex: (I, Q) int16 pairs -> complex."""

    def __init__(self, scale: float = 1.0, name=None):
        self.in_ports = (Port(jnp.int16),)
        self.out_ports = (Port(jnp.complex64),)
        self.decim = 2
        super().__init__(name)
        self.scale = scale

    def apply(self, state, x):
        g = x.reshape(-1, 2).astype(jnp.float32) * self.scale
        return state, (g[:, 0] + 1j * g[:, 1]).astype(jnp.complex64)


class ComplexToInterleavedShort(Block):
    """gr_complex_to_interleaved_short."""

    def __init__(self, scale: float = 1.0, name=None):
        self.in_ports = (Port(jnp.complex64),)
        self.out_ports = (Port(jnp.int16),)
        self.interp = 2
        super().__init__(name)
        self.scale = scale

    def apply(self, state, x):
        iq = jnp.stack([jnp.real(x), jnp.imag(x)], axis=1) * self.scale
        return state, jnp.clip(jnp.round(iq), -32768, 32767).astype(jnp.int16).reshape(-1)


class Conjugate(Block):
    """gr_conjugate_cc."""

    in_ports = (Port(jnp.complex64),)
    out_ports = (Port(jnp.complex64),)

    def apply(self, state, x):
        return state, jnp.conj(x)


class CharToFloatSigned(Block):
    """gr_char_to_float over grtpu's canonical uint8 byte streams: bytes are
    reinterpreted as signed chars (the reference connects char/uchar streams
    interchangeably by itemsize; grtpu ports are dtype-strict, so the GRC
    loader uses this signed view)."""

    in_ports = (Port(jnp.uint8),)
    out_ports = (Port(jnp.float32),)

    def apply(self, state, x):
        v = x.astype(jnp.float32)
        return state, jnp.where(v < 128.0, v, v - 256.0)


class FloatToCharSigned(Block):
    """gr_float_to_char emitting grtpu's canonical uint8 bytes (two's
    complement view of the clipped signed value)."""

    in_ports = (Port(jnp.float32),)
    out_ports = (Port(jnp.uint8),)

    def apply(self, state, x):
        v = jnp.clip(jnp.round(x), -128, 127)
        return state, jnp.where(v < 0, v + 256.0, v).astype(jnp.uint8)


class Cast(Block):
    """Generic dtype cast (no scaling) — glue for GRC flowgraphs whose
    stream types differ from a block's native ports (e.g. the reference's
    short symbol streams feeding int-native trellis blocks)."""

    def __init__(self, in_dtype, out_dtype, name=None):
        self.in_ports = (Port(in_dtype),)
        self.out_ports = (Port(out_dtype),)
        super().__init__(name)

    def apply(self, state, x):
        return state, x.astype(self.out_ports[0].dtype)
