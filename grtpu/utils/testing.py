"""Test helpers — the gr_unittest analog.

Analog of gnuradio-core/src/python/gnuradio/gr_unittest.py: tolerance-based
tuple comparisons (assertComplexTuplesAlmostEqual / assertFloatTuplesAlmost-
Equal) plus the run-a-tiny-graph helper that the reference's QA pattern
uses everywhere (vector_source -> block -> vector_sink -> compare).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def assert_float_tuples_almost_equal(a, b, places: int = 7):
    np.testing.assert_allclose(np.asarray(a, np.float64),
                               np.asarray(b, np.float64),
                               atol=10.0 ** (-places), rtol=0)


def assert_complex_tuples_almost_equal(a, b, places: int = 7):
    np.testing.assert_allclose(np.asarray(a, np.complex128),
                               np.asarray(b, np.complex128),
                               atol=10.0 ** (-places), rtol=0)


def snr_db(reference, estimate) -> float:
    """Output-fidelity metric for 'bit-exact within SNR bound' checks."""
    ref = np.asarray(reference, np.float64)
    err = np.asarray(estimate, np.float64) - ref
    return float(10 * np.log10(
        max((np.abs(ref) ** 2).sum(), 1e-300)
        / max((np.abs(err) ** 2).sum(), 1e-300)))


def run_block(block, *inputs, chunk_size=None):
    """The reference's QA idiom in one call:
    vector_source(s) -> block -> vector_sink(s); returns output array(s)."""
    from grtpu.runtime.block import Port
    from grtpu.runtime.executor import StreamExecutor
    from grtpu.runtime.graph import Graph

    g = Graph()
    n = len(np.asarray(inputs[0]))
    if chunk_size is None:
        chunk_size = n
    pads = []
    for i, port in enumerate(block.in_ports):
        pads.append(g.add_input(Port(port.dtype, port.vlen)))
        g.connect(pads[-1], (block, i))
    outs = []
    for i, port in enumerate(block.out_ports):
        pad = g.add_output(Port(port.dtype, port.vlen))
        g.connect((block, i), pad)
        outs.append(pad)
    ex = StreamExecutor(g, chunk_size=chunk_size)
    res = ex.run(*[jnp.asarray(x) for x in inputs])
    if len(block.out_ports) == 1:
        return np.asarray(res)
    return tuple(np.asarray(r) for r in res)
