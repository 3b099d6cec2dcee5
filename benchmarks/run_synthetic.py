"""mp-sched sweep harness — the run_synthetic.py analog.

Analog of gnuradio-examples/python/mp-sched/run_synthetic.py: sweeps the
(npipes, nstages) grid of the synthetic 256-tap FIR pipeline and writes
rows in the reference's exact .dat format:

    npipes nstages nsamples real user sys (user+sys)/real flop flop/s

so the output is directly comparable with the published perf-data files
(BASELINE.md).  `real` uses the tunnel-safe slope methodology; user/sys
are host-process times (the TPU does the work, so load ~ 0 by design).

Run: python benchmarks/run_synthetic.py [--max-pipes 8] [--max-stages 8] \
         [--samples 1048576] [-o synthetic.dat]
"""

import argparse
import os
import sys
import time

import numpy as np


def measure(npipes, nstages, nsamples, taps):
    import jax
    # persistent compile cache: tunnel-side compiles dominate cold runs
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from grtpu.ops.pallas_fir import fir_cascade

    x = jnp.asarray(
        np.random.RandomState(1).randn(npipes, nsamples).astype(np.float32))

    def make(m):
        @jax.jit
        def g(a):
            def body(i, c):
                return fir_cascade(c, taps, nstages, tile_rows=512,
                                   precision="bf16x3") * 0.999

            return jnp.sum(jax.lax.fori_loop(0, m, body, a))

        return g

    times = {}
    for m in (1, 4):
        g = make(m)
        float(np.asarray(g(x)))
        t0 = time.perf_counter()
        float(np.asarray(g(x)))
        times[m] = time.perf_counter() - t0
    return max((times[4] - times[1]) / 3, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-pipes", type=int, default=8)
    ap.add_argument("--max-stages", type=int, default=8)
    ap.add_argument("--samples", type=int, default=1 << 20)
    ap.add_argument("--step", type=int, default=4,
                    help="grid stride (sweep 1, step, 2*step, ...)")
    ap.add_argument("-o", "--output", default="synthetic.dat")
    args = ap.parse_args()

    ntaps = 256
    taps = (np.random.RandomState(0).randn(ntaps) * 0.05).astype(np.float32)
    grid = sorted({1, *range(args.step, args.max_pipes + 1, args.step)})
    sgrid = sorted({1, *range(args.step, args.max_stages + 1, args.step)})

    rows = []
    for npipes in grid:
        for nstages in sgrid:
            u0 = os.times()
            real = measure(npipes, nstages, args.samples, taps)
            u1 = os.times()
            user = u1.user - u0.user
            syst = u1.system - u0.system
            load = (user + syst) / real
            flop = 2.0 * ntaps * npipes * nstages * args.samples
            row = (f"{npipes} {nstages} {args.samples} {real:.4f} "
                   f"{user:.3f} {syst:.3f} {load:.2f} {flop:.3e} "
                   f"{flop / real:.3e}")
            print(row)
            rows.append(row)
    with open(args.output, "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
