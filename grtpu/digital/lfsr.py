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
    """Fibonacci LFSR, bit-exact to gri_lfsr (gri_lfsr.h:113-118):
    the register is reg_len+1 bits wide; each step outputs the LSB,
    right-shifts, and inserts parity(reg & mask) at bit reg_len."""

    def __init__(self, mask: int, seed: int, reg_len: int):
        self.mask = mask
        self.seed = seed
        self.reg = seed
        self.reg_len = reg_len

    def next_bit(self) -> int:
        out = self.reg & 1
        newbit = bin(self.reg & self.mask).count("1") & 1
        self.reg = (self.reg >> 1) | (newbit << self.reg_len)
        return out

    def reset(self):
        self.reg = self.seed

    def period(self) -> int:
        """Length of the state cycle starting from seed (the free-running
        additive-scrambler sequence period)."""
        save, n = self.reg, 0
        self.reg = self.seed
        while True:
            self.next_bit()
            n += 1
            if self.reg == self.seed or n > (1 << (self.reg_len + 1)):
                break
        self.reg = save
        return n

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
        # Data-independent sequence: precompute transient + cycle.  With
        # count>0 the reference resets the register every count bits
        # (gr_additive_scrambler_bb.cc:55-60) -> pure period=count.  Free
        # running, the seed may sit on a tail leading INTO the state cycle
        # (e.g. 0x8A/0x7F/7 has a 1-bit transient then a 63-bit cycle), so
        # model sequence = prefix ++ cycle*.
        l = FibonacciLfsr(mask, seed, length)
        if count:
            prefix_len, cycle_len = 0, count
        else:
            reg, seen = seed, {}
            bits = []
            while reg not in seen:
                seen[reg] = len(bits)
                bits.append(reg & 1)
                newbit = bin(reg & mask).count("1") & 1
                reg = (reg >> 1) | (newbit << length)
            prefix_len = seen[reg]
            cycle_len = len(bits) - prefix_len
        l.reset()
        self.seq = l.sequence(prefix_len + cycle_len)
        self.prefix_len, self.cycle_len = prefix_len, cycle_len

    def init_state(self):
        return jnp.zeros((), jnp.int32)

    def apply(self, state, x):
        n = x.shape[0]
        t, c = self.prefix_len, self.cycle_len
        pos = state + jnp.arange(n)
        idx = jnp.where(pos < t + c, pos, t + (pos - t) % c)
        bits = jnp.asarray(self.seq)[idx]
        # fold the carried position (cycle-equivalent) so it never overflows
        end = state + n
        end = jnp.where(end < t, end, t + (end - t) % c)
        return end.astype(jnp.int32), (x ^ bits).astype(jnp.uint8)


def _parity32(v):
    """32-bit parity via xor-folding (VPU-friendly, no popcount op)."""
    v = v ^ (v >> 16)
    v = v ^ (v >> 8)
    v = v ^ (v >> 4)
    v = v ^ (v >> 2)
    v = v ^ (v >> 1)
    return v & 1


class Scrambler(Block):
    """gr_scrambler_bb, bit-exact (gri_lfsr.h:120-125 next_bit_scramble):
    out = reg & 1;  reg <- (reg >> 1) | ((parity(reg & mask) ^ in) << L).
    Sequential by construction -> lax.scan with an integer register."""

    def __init__(self, mask: int, seed: int, length: int, name=None):
        self.in_ports = (Port(jnp.uint8),)
        self.out_ports = (Port(jnp.uint8),)
        super().__init__(name)
        self.mask, self.seed, self.length = mask, seed, length

    def init_state(self):
        return jnp.asarray(self.seed, jnp.uint32)

    def apply(self, state, x):
        mask = jnp.uint32(self.mask)
        shift = self.length

        def f(reg, xi):
            out = reg & 1
            newbit = _parity32(reg & mask) ^ (xi.astype(jnp.uint32) & 1)
            reg = (reg >> 1) | (newbit << shift)
            return reg, out.astype(jnp.uint8)

        reg, y = jax.lax.scan(f, state, x)
        return reg, y


class Descrambler(Block):
    """gr_descrambler_bb, bit-exact (gri_lfsr.h:127-132
    next_bit_descramble): out = parity(reg & mask) ^ in;
    reg <- (reg >> 1) | (in << L).  Self-synchronizing."""

    def __init__(self, mask: int, seed: int, length: int, name=None):
        self.in_ports = (Port(jnp.uint8),)
        self.out_ports = (Port(jnp.uint8),)
        super().__init__(name)
        self.mask, self.seed, self.length = mask, seed, length

    def init_state(self):
        return jnp.asarray(self.seed, jnp.uint32)

    def apply(self, state, x):
        mask = jnp.uint32(self.mask)
        shift = self.length

        def f(reg, xi):
            xin = xi.astype(jnp.uint32) & 1
            out = _parity32(reg & mask) ^ xin
            reg = (reg >> 1) | (xin << shift)
            return reg, out.astype(jnp.uint8)

        reg, y = jax.lax.scan(f, state, x)
        return reg, y
