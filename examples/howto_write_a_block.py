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


class ThresholdTagFF(Block):
    """A tag-EMITTING block: passthrough that tags every upward crossing
    of a threshold (the add_item_tag idiom, gr_burst_tagger-style).

    ``device_tags``: detection runs in-jit — apply_tagged returns a small
    statically-shaped record (chunk-relative offsets, -1 padded) and
    tags_from_device turns it into Tag objects on the host.  This form
    works under step(), run(device_loop=True) and MeshExecutor alike.
    """

    emits_tags = True
    device_tags = True

    def __init__(self, threshold: float = 1.0, name=None):
        self.in_ports = (Port(jnp.float32),)
        self.out_ports = (Port(jnp.float32),)
        super().__init__(name)
        self.threshold = threshold

    def init_state(self):
        return jnp.zeros((), jnp.bool_)          # previous "above" flag

    def apply(self, state, x):
        return (x[-1] > self.threshold), x

    def apply_tagged(self, state, x):
        above = x > self.threshold
        prev = jnp.concatenate([state[None], above[:-1]])
        offs, _ = self._tag_topk(above & ~prev, x.shape[0])
        return above[-1], x, {"offset": offs}

    def tags_from_device(self, rec, start_in, start_out):
        from grtpu.runtime.tags import Tag

        return [Tag(start_out + int(o), "rising", True, self.name)
                for o in rec["offset"] if o >= 0]


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


def qa_threshold_tag_ff():
    from grtpu import Graph, StreamExecutor
    from grtpu.blocks.gengen import VectorSink

    src = np.array([0, 2, 0, 0, 3, 3, 0, 2], np.float32)
    g = Graph()
    pin = g.add_input(Port(jnp.float32))
    s = VectorSink(dtype=jnp.float32)
    g.connect(pin, ThresholdTagFF(1.0), s)
    ex = StreamExecutor(g, chunk_size=4)     # crossings span chunks
    ex.run(src)
    offs = sorted(t.offset for t in ex.sink_tags[s.name])
    assert offs == [1, 4, 7], offs
    print("qa_threshold_tag_ff: OK", offs)


if __name__ == "__main__":
    qa_square_ff()
    qa_square_accum_ff()
    qa_threshold_tag_ff()
