"""Polyphase channelizer throughput (BASELINE.json config #2).

64-channel critically-sampled channelizer: the branch FIRs and the
N-point IDFT fold into kp complex (T,N)@(N,N) matmuls (fully MXU, no
gather, no strided FFT), split-word bf16x3 (~4e-6 rel err).  Measured on
1x TPU v5e: ~1.3 Gsample/s input rate (64 channels of 20 MHz real-time);
f32-exact mode ~0.9 Gsample/s.

Run from repo root on the TPU: python benchmarks/channelizer_bench.py
"""

import json
import os
import sys
import time

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

    from grtpu.ops.pfb import channelize, design_channelizer_taps

    N = 64
    proto = design_channelizer_taps(N, 12)
    kp = -(-len(proto) // N)
    n = 1 << 20
    hist = kp * N
    r = np.random.RandomState(0)
    re = jnp.asarray(r.randn(n + hist).astype(np.float32))
    im = jnp.asarray(r.randn(n + hist).astype(np.float32))

    def make(m, prec, oversample=1):
        @jax.jit
        def g(re, im):
            def body(i, carry):
                x = (re + carry * 1e-20 + 1j * im).astype(jnp.complex64)
                y = channelize(x, proto, N, oversample=oversample,
                               precision=prec)
                return jnp.sum(jnp.abs(y[-1]) ** 2)

            return jax.lax.fori_loop(0, m, body, jnp.float32(0.0))

        return g

    # single-pass bf16 accuracy vs the exact path (small one-shot program)
    @jax.jit
    def snr_fn(re, im):
        x = (re[: (1 << 16) + hist] + 1j * im[: (1 << 16) + hist]
             ).astype(jnp.complex64)
        ya = channelize(x, proto, N, precision="f32")
        yb = channelize(x, proto, N, precision="bf16")
        err = jnp.abs(ya - yb) ** 2
        return 10.0 * jnp.log10(jnp.sum(jnp.abs(ya) ** 2)
                                / jnp.maximum(jnp.sum(err), 1e-30))
    bf16_snr = float(np.asarray(snr_fn(re, im)))

    def measure(prec, oversample=1):
        g1, g4 = make(1, prec, oversample), make(65, prec, oversample)
        float(np.asarray(g1(re, im)))
        float(np.asarray(g4(re, im)))
        slopes = []
        fallback = None
        for _ in range(4):
            t0 = time.perf_counter()
            float(np.asarray(g1(re, im)))
            t1 = time.perf_counter()
            float(np.asarray(g4(re, im)))
            t2 = time.perf_counter()
            s = ((t2 - t1) - (t1 - t0)) / 64
            if s > 0:
                slopes.append(s)
            fallback = (t2 - t1) / 64
        # all-jitter rounds (wedgy tunnel): fall back to the amortized
        # m-big time so the bench still prints its JSON line
        return float(np.median(slopes)) if slopes else fallback

    per_b = measure("bf16")
    print(json.dumps({
        "metric": "pfb_channelizer_64ch_input_rate_bf16",
        "value": round(n / per_b / 1e6, 1),
        "unit": "Msamples/s",
        "snr_db_vs_f32": round(bf16_snr, 1),
    }))
    per = measure("bf16x3")
    msps = n / per / 1e6
    print(json.dumps({
        "metric": "pfb_channelizer_64ch_input_rate",
        "value": round(msps, 1),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / 145.0, 3),  # ~reference host FIR rate
    }))
    # oversampled mode (per-channel rate 2*fs/N — the reference's
    # oversample-by-os commutator twist, gr_pfb_channelizer_ccf.cc:44-200)
    per_os = measure("bf16x3", oversample=2)
    print(json.dumps({
        "metric": "pfb_channelizer_64ch_os2_input_rate",
        "value": round(n / per_os / 1e6, 1),
        "unit": "Msamples/s",
        "oversample": 2,
    }))
    # os=2 produces 2x the output rows, so par is half the critically-
    # sampled rate per precision mode; the single-shift loop recorded 468
    # Msps at (silent) HIGHEST, the concat-folded matmul reaches par
    per_osb = measure("bf16", oversample=2)
    print(json.dumps({
        "metric": "pfb_channelizer_64ch_os2_input_rate_bf16",
        "value": round(n / per_osb / 1e6, 1),
        "unit": "Msamples/s",
        "oversample": 2,
    }))


if __name__ == "__main__":
    main()
