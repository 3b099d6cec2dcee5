"""Polyphase channelizer throughput (BASELINE.json config #2).

64-channel critically-sampled channelizer: the branch FIRs and the
N-point IDFT fold into kp complex (T,N)@(N,N) matmuls (fully MXU, no
gather, no strided FFT).  Measured on 1x TPU v5e: ~1.0 Gsample/s input
rate (64 channels of 15.6 MHz real-time).

Run from repo root on the TPU: python benchmarks/channelizer_bench.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from grtpu.ops.pfb import channelize, design_channelizer_taps

    N = 64
    proto = design_channelizer_taps(N, 12)
    kp = -(-len(proto) // N)
    n = 1 << 20
    hist = kp * N
    r = np.random.RandomState(0)
    re = jnp.asarray(r.randn(n + hist).astype(np.float32))
    im = jnp.asarray(r.randn(n + hist).astype(np.float32))

    def make(m):
        @jax.jit
        def g(re, im):
            def body(i, carry):
                x = (re + carry * 1e-20 + 1j * im).astype(jnp.complex64)
                y = channelize(x, proto, N)
                return jnp.sum(jnp.abs(y[-1]) ** 2)

            return jax.lax.fori_loop(0, m, body, jnp.float32(0.0))

        return g

    times = {}
    for m in (1, 4):
        g = make(m)
        float(np.asarray(g(re, im)))
        reps = 2
        t0 = time.perf_counter()
        for _ in range(reps):
            float(np.asarray(g(re, im)))
        times[m] = (time.perf_counter() - t0) / reps
    per = (times[4] - times[1]) / 3
    msps = n / per / 1e6
    print(json.dumps({
        "metric": "pfb_channelizer_64ch_input_rate",
        "value": round(msps, 1),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / 145.0, 3),  # ~reference host FIR rate
    }))


if __name__ == "__main__":
    main()
