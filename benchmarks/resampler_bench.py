"""pfb_arb_resampler throughput (BASELINE.json north-star config #2 names
it explicitly; VERDICT round-1 weak item #6: no resampler bench existed
and the large-P path used TPU gathers).

Measures the gather-free strided-view matmul form (grtpu.ops.pfb
.arb_resample) at two rates: a small-P ratio (3/2) and the audio-grade
large-P ratio 160/147 (44.1k -> 48k) that used to fall into the gather
path, batched over 64 channels.

Timing: in-jit fori_loop + scalar-readback slope, median over rounds
(see bench.py).  Run from the repo root on the TPU.
"""

import json
import os
import sys
import time
from fractions import Fraction

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    # persistent compile cache: tunnel-side compiles dominate cold runs
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from grtpu.ops.pfb import arb_resample, design_arb_resampler_taps

    C = 64
    for label, rate, n in (("3_2", Fraction(3, 2), 1 << 17),
                           ("160_147", Fraction(160, 147), 147 * 900)):
        taps = design_arb_resampler_taps(float(rate), 32)
        kp = -(-len(taps) // 32)
        r = np.random.RandomState(0)
        re = jnp.asarray(r.randn(C, n + kp - 1).astype(np.float32))
        im = jnp.asarray(r.randn(C, n + kp - 1).astype(np.float32))

        def make(m):
            @jax.jit
            def g(a, b, s):
                def body(i, acc):
                    x = ((a + acc * 1e-20) + 1j * b).astype(jnp.complex64)
                    y = jax.vmap(lambda row: arb_resample(
                        row, taps, rate, 32))(x)
                    return acc + jnp.sum(jnp.abs(y[:, :4]) ** 2)

                return jax.lax.fori_loop(0, m, body, 0.0)

            return g

        slopes = []
        g1, gb = make(1), make(33)
        float(np.asarray(g1(re, im, 0.0)))
        float(np.asarray(gb(re, im, 0.0)))
        for _ in range(4):
            t0 = time.perf_counter()
            float(np.asarray(g1(re, im, 0.0)))
            t1 = time.perf_counter()
            float(np.asarray(gb(re, im, 0.0)))
            t2 = time.perf_counter()
            s = ((t2 - t1) - (t1 - t0)) / 32
            if s > 0:
                slopes.append(s)
        per = float(np.median(slopes))
        msps = C * n / per / 1e6
        print(json.dumps({
            "metric": f"pfb_arb_resampler_64ch_rate_{label}",
            "value": round(msps, 1),
            "unit": "Msamples/s input",
            "vs_baseline": round(msps / 1000.0, 3),  # target 1 Gsps
        }))


if __name__ == "__main__":
    main()
