"""Channel model: impairment injection for loopback testing.

Analog of blks2impl/channel_model.py (+ hier/gr_channel_model.cc):
AWGN + carrier frequency/phase offset + multipath FIR + timing (epsilon)
offset — the reference's only fault-injection facility (SURVEY.md §5.3).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from grtpu.runtime.block import Block, Port
from grtpu.runtime.graph import HierBlock
from grtpu.blocks.filter import FirFilter
from grtpu.blocks.gengen import Add, NoiseSource
from grtpu.ops import dsp


class _Rotator(Block):
    def __init__(self, phase_inc: float, phase0: float = 0.0, name=None):
        self.in_ports = (Port(jnp.complex64),)
        self.out_ports = (Port(jnp.complex64),)
        super().__init__(name)
        self.inc = phase_inc
        self.phase0 = phase0

    def init_state(self):
        return jnp.asarray(self.phase0, jnp.float32)

    def apply(self, state, x):
        y, ph = dsp.rotate(x, state, self.inc)
        return ph, y


class ChannelModel(HierBlock):
    """AWGN + CFO + multipath channel.

    Args mirror channel_model.py: noise_voltage (std per complex dim),
    frequency_offset (cycles/sample), epsilon (timing skew, approximated by
    a fractional resampler when != 1), taps (multipath FIR, default [1]).
    """

    def __init__(self, noise_voltage: float = 0.0,
                 frequency_offset: float = 0.0, epsilon: float = 1.0,
                 taps=(1.0 + 0.0j,), noise_seed: int = 3021, name=None):
        super().__init__(name)
        taps = np.asarray(taps, np.complex64)
        i = self.graph.add_input(Port(jnp.complex64))
        o = self.graph.add_output(Port(jnp.complex64))

        chain = [FirFilter(1, taps, "ccc")]
        if epsilon != 1.0:
            from grtpu.blocks.filter import FractionalInterpolator

            chain.append(FractionalInterpolator(0.0, epsilon, jnp.complex64))
        chain.append(_Rotator(2 * np.pi * frequency_offset))
        if noise_voltage > 0.0:
            # in-block AWGN (carried PRNG key) — keeps the graph single-rate
            # even when epsilon resamples the signal path
            chain.append(_AwgnAdder(noise_voltage, noise_seed))
        self.graph.connect(i, *chain, o)


class _AwgnAdder(Block):
    """Add complex AWGN with per-dimension std ``voltage`` (the reference's
    noise_voltage convention)."""

    def __init__(self, voltage: float, seed: int = 3021, name=None):
        self.in_ports = (Port(jnp.complex64),)
        self.out_ports = (Port(jnp.complex64),)
        super().__init__(name)
        self.voltage = voltage
        self.seed = seed

    def init_state(self):
        import jax

        return jax.random.PRNGKey(self.seed)

    def apply(self, state, x):
        import jax

        key, sub = jax.random.split(state)
        r = jax.random.normal(sub, (x.shape[0], 2), jnp.float32) * self.voltage
        return key, (x + r[:, 0] + 1j * r[:, 1]).astype(jnp.complex64)
