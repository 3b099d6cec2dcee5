"""WBFM-chain throughput benchmark (BASELINE.json north-star metric:
Msamples/s/chip through FIR+FFT+demod).

64-channel WBFM bank (quadrature demod -> 155-tap decimating FIR ->
de-emphasis via the parallel linear-recurrence solver) on one chip.
Timing: in-jit fori_loop with carry-fed inputs (no loop-invariant
hoisting) + scalar-readback slope — see bench.py for why.

Run from the repo root on the TPU: python benchmarks/wfm_bench.py
Measured on 1x TPU v5e: ~2.75 Gsamples/s aggregate (target: >1 Gsample/s).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from grtpu.ops.dsp import linear_recurrence
    from grtpu.ops.fir import batch_fir_filter
    from grtpu.utils import firdes

    quad_rate, decim = 256e3, 8
    C, N = 64, 1 << 18
    taps = firdes.low_pass(1.0, quad_rate, 15e3, 4e3)
    K = len(taps)
    gain = np.float32(quad_rate / (2 * np.pi * 75e3))
    kk = float(np.tan(1.0 / (75e-6 * 2.0 * (quad_rate / decim))))
    p1, b0 = np.float32((1 - kk) / (1 + kk)), np.float32(kk / (1 + kk))

    def wfm_bank(iq, st, fir_impl):
        prod = iq[:, 1:] * jnp.conj(iq[:, :-1])
        fm = gain * jnp.arctan2(prod.imag, prod.real)
        if fir_impl == "pallas":
            # VMEM phase-split decimating kernel (ops.pallas_fir.fir_decim):
            # measured ~2.7x over the XLA matmul path on this FIR alone
            from grtpu.ops.pallas_fir import fir_decim
            audio = fir_decim(fm, taps, int(decim))
        else:
            audio = batch_fir_filter(fm, jnp.asarray(taps), decim)
        u = b0 * (audio + jnp.concatenate([st[:, None], audio[:, :-1]], 1))
        a = jnp.full(u.shape, p1, jnp.float32)
        y, last = jax.vmap(
            lambda aa, uu, s: linear_recurrence(aa, uu, s))(a, u, st)
        return y, last

    def make(m, fir_impl):
        @jax.jit
        def g(re, im, st):
            def body(i, s):
                iq = ((re + s[:, None] * 1e-20) + 1j * im).astype(jnp.complex64)
                _, s2 = wfm_bank(iq, s, fir_impl)
                return s2

            return jnp.sum(jax.lax.fori_loop(0, m, body, st))

        return g

    r = np.random.RandomState(0)
    re = jnp.asarray(r.randn(C, N + K).astype(np.float32))
    im = jnp.asarray(r.randn(C, N + K).astype(np.float32))
    st = jnp.zeros((C,), jnp.float32)
    for fir_impl in ("xla", "pallas"):
        times = {}
        for m in (1, 5):
            g = make(m, fir_impl)
            float(np.asarray(g(re, im, st)))
            reps = 3
            vals = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(np.asarray(g(re, im, st)))
                vals.append(time.perf_counter() - t0)
            times[m] = float(np.median(vals))
        per = (times[5] - times[1]) / 4
        msps = C * N / per / 1e6
        suffix = "" if fir_impl == "xla" else "_pallas_fir"
        print(json.dumps({
            "metric": f"wfm_bank_64ch_aggregate{suffix}",
            "value": round(msps, 1),
            "unit": "Msamples/s",
            "vs_baseline": round(msps / 1000.0, 3),  # target: 1 Gsample/s
        }))


if __name__ == "__main__":
    main()
