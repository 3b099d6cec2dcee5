"""LFSR machinery + scrambler blocks.

Analogs: gri_lfsr.h / gri_glfsr.h (gnuradio-core/src/lib/general),
gr_scrambler_bb / gr_descrambler_bb (multiplicative self-synchronizing),
gr_additive_scrambler_bb (XOR with free-running LFSR, periodic reset),
gr_glfsr_source_{b,f}.

Additive scrambling is XOR with a data-independent sequence — generated
host-side per chunk and applied vectorized.  Multiplicative scrambling has
bit-level feedback through the data: a lax.scan with an integer shift
register (the inherently sequential part, like all self-synchronizing
scramblers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from grtpu.runtime.block import Block, Port


class GLFSR:
    """Galois LFSR (gri_glfsr): shift right, XOR mask when LSB set."""

    _DEFAULT_MASKS = {
        2: 0x3, 3: 0x5, 4: 0x9, 5: 0x12, 6: 0x21, 7: 0x41, 8: 0x8E,
        9: 0x108, 10: 0x204, 11: 0x402, 12: 0x829, 13: 0x100D, 14: 0x2015,
        15: 0x4001, 16: 0x8016, 17: 0x10004, 18: 0x20013, 19: 0x40013,
        20: 0x80004, 21: 0x100002, 22: 0x200001, 23: 0x400010,
        24: 0x80000D, 25: 0x1000004, 26: 0x2000023, 27: 0x4000013,
        28: 0x8000004, 29: 0x10000002, 30: 0x20000029, 31: 0x40000004,
        32: 0x80000057,
    }

    def __init__(self, mask: int, seed: int = 1):
        self.mask = mask
        self.reg = seed

    @classmethod
    def default_mask(cls, degree: int) -> int:
        return cls._DEFAULT_MASKS[degree]

    def next_bit(self) -> int:
        bit = self.reg & 1
        self.reg >>= 1
        if bit:
            self.reg ^= self.mask
        return bit

    def sequence(self, n: int) -> np.ndarray:
        return np.array([self.next_bit() for _ in range(n)], np.uint8)


class FibonacciLfsr:
    """Fibonacci LFSR (gri_lfsr): feedback = parity(reg & mask)."""

    def __init__(self, mask: int, seed: int, reg_len: int):
        self.mask = mask
        self.reg = seed
        self.len_mask = (1 << reg_len) - 1

    def next_bit(self) -> int:
        out = bin(self.reg & self.mask).count("1") & 1
        self.reg = ((self.reg << 1) | out) & self.len_mask
        return out

    def sequence(self, n: int) -> np.ndarray:
        return np.array([self.next_bit() for _ in range(n)], np.uint8)


class GlfsrSource(Block):
    """gr_glfsr_source_b: PN bit source (or +-1 float via GlfsrSourceF)."""

    def __init__(self, degree: int, repeat: bool = True, mask: int = 0,
                 seed: int = 1, dtype=jnp.uint8, name=None):
        self.out_ports = (Port(dtype),)
        super().__init__(name)
        g = GLFSR(mask if mask else GLFSR.default_mask(degree), seed)
        period = (1 << degree) - 1
        self.seq = g.sequence(period)
        self.period = period
        self._dtype = dtype

    def init_state(self):
        return jnp.zeros((), jnp.int32)

    def apply(self, state, n: int):
        idx = (state + jnp.arange(n)) % self.period
        bits = jnp.asarray(self.seq)[idx]
        if self._dtype == jnp.float32:
            y = bits.astype(jnp.float32) * 2 - 1
        else:
            y = bits.astype(self._dtype)
        return (state + n) % self.period, y


class AdditiveScrambler(Block):
    """gr_additive_scrambler_bb: XOR input bits with an LFSR sequence,
    resetting the register every ``count`` bits (0 = never)."""

    def __init__(self, mask: int, seed: int, length: int, count: int = 0,
                 name=None):
        self.in_ports = (Port(jnp.uint8),)
        self.out_ports = (Port(jnp.uint8),)
        super().__init__(name)
        self.mask, self.seed, self.length, self.count = mask, seed, length, count
        # data-independent sequence: precompute one period (or reset block)
        l = FibonacciLfsr(mask, seed, length)
        period = count if count else (1 << length) - 1
        self.seq = l.sequence(period)
        self.period = period

    def init_state(self):
        return jnp.zeros((), jnp.int32)

    def apply(self, state, x):
        n = x.shape[0]
        idx = (state + jnp.arange(n)) % self.period
        bits = jnp.asarray(self.seq)[idx]
        return (state + n) % self.period, (x ^ bits).astype(jnp.uint8)


class Scrambler(Block):
    """gr_scrambler_bb: multiplicative (self-synchronizing) scrambler.

    out = parity((reg & mask)) ^ in; reg <- (reg << 1) | out.
    Sequential by construction -> lax.scan over bits.
    """

    def __init__(self, mask: int, seed: int, length: int, name=None):
        self.in_ports = (Port(jnp.uint8),)
        self.out_ports = (Port(jnp.uint8),)
        super().__init__(name)
        self.mask, self.seed, self.length = mask, seed, length

    def init_state(self):
        return jnp.asarray(self.seed, jnp.uint32)

    def apply(self, state, x):
        mask = jnp.uint32(self.mask)
        lm = jnp.uint32((1 << self.length) - 1)

        def popcount_parity(v):
            # 32-bit parity via xor-folding
            v = v ^ (v >> 16)
            v = v ^ (v >> 8)
            v = v ^ (v >> 4)
            v = v ^ (v >> 2)
            v = v ^ (v >> 1)
            return v & 1

        def f(reg, xi):
            fb = popcount_parity(reg & mask)
            out = (xi.astype(jnp.uint32) & 1) ^ fb
            reg = ((reg << 1) | out) & lm
            return reg, out.astype(jnp.uint8)

        reg, y = jax.lax.scan(f, state, x)
        return reg, y


class Descrambler(Block):
    """gr_descrambler_bb: inverse of Scrambler (feed input into register)."""

    def __init__(self, mask: int, seed: int, length: int, name=None):
        self.in_ports = (Port(jnp.uint8),)
        self.out_ports = (Port(jnp.uint8),)
        super().__init__(name)
        self.mask, self.seed, self.length = mask, seed, length

    def init_state(self):
        return jnp.asarray(self.seed, jnp.uint32)

    def apply(self, state, x):
        mask = jnp.uint32(self.mask)
        lm = jnp.uint32((1 << self.length) - 1)

        def parity(v):
            v = v ^ (v >> 16)
            v = v ^ (v >> 8)
            v = v ^ (v >> 4)
            v = v ^ (v >> 2)
            v = v ^ (v >> 1)
            return v & 1

        def f(reg, xi):
            xin = xi.astype(jnp.uint32) & 1
            out = parity(reg & mask) ^ xin
            reg = ((reg << 1) | xin) & lm
            return reg, out.astype(jnp.uint8)

        reg, y = jax.lax.scan(f, state, x)
        return reg, y
