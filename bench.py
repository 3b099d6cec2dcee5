"""Headline benchmark: the reference's mp-sched synthetic FIR pipeline on TPU.

Reproduces gnuradio-examples/python/mp-sched/synthetic.py (the only workload
with published numbers, BASELINE.md): npipes parallel pipelines of nstages
serial 256-tap real FIR filters; FLOP = 2*ntaps*npipes*nstages*nsamples
(synthetic.py:76).  Baseline to beat: 74.37 GFLOPS peak (2x quad Xeon E5472,
perf-data/dual-quad-core-3.00-penryn.dat:1).

On TPU the npipes axis is a batch dimension and the nstages chain is a
sequential composition inside one jitted program; each stage is the MXU
Toeplitz-matmul FIR (grtpu.ops.fir).  FLOPs are counted algorithmically
(2*ntaps per output sample) exactly as the reference counts them.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from grtpu.ops.fir import batch_fir_filter

    ntaps = 256
    npipes = 16
    nstages = 16
    nsamples = 1 << 20  # per pipe per iteration

    taps = jnp.asarray(np.random.RandomState(0).randn(ntaps).astype(np.float32))

    @jax.jit
    def pipeline(x):
        # x: (npipes, nsamples + ntaps - 1); each stage consumes its own
        # history from the running buffer, like the reference's chained
        # fir_filter_fff blocks (history supplied by pipeline padding).
        y = x
        for _ in range(nstages):
            y = batch_fir_filter(y, taps, 1)
            # re-pad so every stage filters nsamples outputs (the reference
            # counts full-rate samples through every stage)
            y = jnp.pad(y, ((0, 0), (ntaps - 1, 0)))
        return y[:, ntaps - 1:]

    r = np.random.RandomState(1)
    x = jnp.asarray(r.randn(npipes, nsamples + ntaps - 1).astype(np.float32))

    # compile
    pipeline(x).block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipeline(x)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    flops = 2.0 * ntaps * npipes * nstages * nsamples
    gflops = flops / dt / 1e9
    baseline = 74.37  # GFLOPS, BASELINE.md best published
    print(json.dumps({
        "metric": "synthetic_fir_pipeline_16x16_256taps",
        "value": round(gflops, 2),
        "unit": "GFLOPS",
        "vs_baseline": round(gflops / baseline, 3),
    }))


if __name__ == "__main__":
    main()
