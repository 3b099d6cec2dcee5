"""How to write a block — the gr-howto-write-a-block analog.

The reference ships an out-of-tree module template (autotools + swig) whose
payload is one example block, howto_square_ff, plus QA.  In grtpu an
out-of-tree block is just a Block subclass in your own package; this file
is the complete equivalent of that whole template.

Run: python examples/howto_write_a_block.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402

from grtpu.runtime.block import Block, Port  # noqa: E402
from grtpu.utils.testing import run_block  # noqa: E402


class SquareFF(Block):
    """howto_square_ff: out = in * in.

    A stateless 1:1 block: declare ports, implement apply.  That's the
    whole extension API (the reference needs a C++ class, an .i swig file,
    autotools glue and a QA harness for the same thing).
    """

    def __init__(self, name=None):
        self.in_ports = (Port(jnp.float32),)
        self.out_ports = (Port(jnp.float32),)
        super().__init__(name)

    def apply(self, state, x):
        return state, x * x


class SquareAccumFF(Block):
    """A *stateful* variant showing carried state: running sum of squares."""

    def __init__(self, name=None):
        self.in_ports = (Port(jnp.float32),)
        self.out_ports = (Port(jnp.float32),)
        super().__init__(name)

    def init_state(self):
        return jnp.zeros((), jnp.float32)

    def apply(self, state, x):
        acc = state + jnp.cumsum(x * x)
        return acc[-1], acc


def qa_square_ff():
    """The template's qa_howto.py, in three lines."""
    src = np.array([-3, 4, -5.5, 2, 3], np.float32)
    out = run_block(SquareFF(), src)
    np.testing.assert_allclose(out, src ** 2, rtol=1e-6)
    print("qa_square_ff: OK", out)


def qa_square_accum_ff():
    src = np.ones(8, np.float32)
    out = run_block(SquareAccumFF(), src, chunk_size=4)  # state crosses chunks
    np.testing.assert_allclose(out, np.arange(1, 9, dtype=np.float32))
    print("qa_square_accum_ff: OK", out)


if __name__ == "__main__":
    qa_square_ff()
    qa_square_accum_ff()
