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
    # persistent compile cache: tunnel-side compiles dominate cold runs
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from grtpu.ops.dsp import linear_recurrence_const
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
            # VMEM phase-split decimating kernel (ops.pallas_fir.fir_decim);
            # its isolated speedup vs the XLA matmul path is RECORDED per
            # round as fir_decim_155tap_64ch_isolated (the chain itself is
            # atan2/recurrence co-dominated, so chain deltas stay small)
            from grtpu.ops.pallas_fir import fir_decim
            audio = fir_decim(fm, taps, int(decim))
        elif fir_impl == "pallas_bf16":
            # bf16-resident single-pass variant (~48-50 dB audio SNR vs
            # the f32 chain; printed in the record)
            from grtpu.ops.pallas_fir import fir_decim
            audio = fir_decim(fm.astype(jnp.bfloat16), taps, int(decim),
                              precision="bf16")
        else:
            audio = batch_fir_filter(fm, jnp.asarray(taps), decim)
        u = b0 * (audio + jnp.concatenate([st[:, None], audio[:, :-1]], 1))
        # constant-pole deemph via the truncated-FIR MXU solver: +47%
        # whole-chain vs the associative scan (exact to 1e-9)
        y, last = linear_recurrence_const(float(p1), u, st)
        return y, last

    def make(fir_impl):
        # m is a traced argument: ONE compile per variant serves both
        # slope points (tunnel-side compiles dominate the bench runtime)
        @jax.jit
        def g(re, im, st, m):
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

    # accuracy of the bf16 single-pass audio FIR: one device pass at small
    # N vs a float64 HOST recomputation of the chain (separate small
    # program — compiling both chains into one jit costs ~270s over the
    # tunnel; measured SNR ~54.6 dB either way)
    def _bf16_snr():
        Ns = 1 << 14
        res, ims = np.asarray(re[:4, : Ns + K]), np.asarray(im[:4, : Ns + K])
        sts = jnp.zeros((4,), jnp.float32)

        @jax.jit
        def one(re_, im_, st_):
            iq = (re_ + 1j * im_).astype(jnp.complex64)
            y, _ = wfm_bank(iq, st_, "pallas_bf16")
            return y
        got = np.asarray(one(jnp.asarray(res), jnp.asarray(ims), sts))
        iq = res.astype(np.float64) + 1j * ims.astype(np.float64)
        prod = iq[:, 1:] * np.conj(iq[:, :-1])
        fm = float(gain) * np.arctan2(prod.imag, prod.real)
        t64 = np.asarray(taps, np.float64)
        ref = np.zeros_like(got, np.float64)
        for c in range(4):
            full = np.convolve(fm[c], t64, "valid")
            ref[c] = full[::decim][: got.shape[1]]
        # de-emphasis recurrence
        for c in range(4):
            s = 0.0
            prev_in = 0.0
            out = ref[c].copy()
            for i in range(len(out)):
                u = float(b0) * (out[i] + prev_in)
                prev_in = out[i]
                s = u + float(p1) * s
                out[i] = s
            ref[c] = out
        err = got - ref
        return 10.0 * np.log10(np.sum(ref * ref)
                               / max(np.sum(err * err), 1e-30))
    print("# measuring bf16 audio SNR...", file=sys.stderr, flush=True)
    bf16_snr = float(_bf16_snr())
    print(f"# bf16 audio SNR = {bf16_snr:.1f} dB", file=sys.stderr,
          flush=True)

    # Isolated decim-FIR A/B (VERDICT r3 weak #6: the "~2.7x" pallas-FIR
    # claim had no standalone artifact; the full chain is atan2/recurrence
    # co-dominated so the chain numbers can't show it either way).
    def _fir_ab():
        from grtpu.ops.pallas_fir import fir_decim
        tj = jnp.asarray(taps)

        def make(impl):
            @jax.jit
            def g(x, m):
                def body(i, s):
                    xx = x + s * 1e-30
                    if impl == "pallas":
                        y = fir_decim(xx, taps, int(decim))
                    else:
                        y = batch_fir_filter(xx, tj, decim)
                    return jnp.sum(y[:, :2])

                return jax.lax.fori_loop(0, m, body, jnp.float32(0.0))

            return g

        # (64, N+K-1) f32 — K-1 halo + N fresh (N % decim == 0), the same
        # shape the chain's FIR sees
        x = re[:, : N + K - 1]
        out = {}
        for impl in ("xla", "pallas"):
            g = make(impl)
            float(np.asarray(g(x, jnp.int32(1))))
            times = {}
            # 64-iteration span (~90 ms at 11.6 Gsps): keeps the slope
            # well above tunnel RTT jitter (timing discipline, CLAUDE.md)
            for m in (1, 65):
                mm = jnp.int32(m)
                float(np.asarray(g(x, mm)))
                vals = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(np.asarray(g(x, mm)))
                    vals.append(time.perf_counter() - t0)
                times[m] = float(np.median(vals))
            slope = (times[65] - times[1]) / 64
            if slope <= 0:            # all-jitter rounds: amortized fallback
                slope = times[65] / 65
            out[impl] = C * N / slope / 1e6
        print(json.dumps({
            "metric": "fir_decim_155tap_64ch_isolated",
            "value": round(out["pallas"], 1),
            "unit": "Msamples/s",
            "xla_msps": round(out["xla"], 1),
            "pallas_vs_xla": round(out["pallas"] / out["xla"], 2),
        }))

    _fir_ab()

    for fir_impl in ("xla", "pallas", "pallas_bf16"):
        print(f"# compiling {fir_impl}", file=sys.stderr, flush=True)
        g = make(fir_impl)
        float(np.asarray(g(re, im, st, jnp.int32(1))))  # the one compile
        times = {}
        for m in (1, 17):
            mm = jnp.int32(m)
            float(np.asarray(g(re, im, st, mm)))
            reps = 3
            vals = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(np.asarray(g(re, im, st, mm)))
                vals.append(time.perf_counter() - t0)
            times[m] = float(np.median(vals))
        per = (times[17] - times[1]) / 16
        msps = C * N / per / 1e6
        suffix = {"xla": "", "pallas": "_pallas_fir",
                  "pallas_bf16": "_pallas_fir_bf16"}[fir_impl]
        rec = {
            "metric": f"wfm_bank_64ch_aggregate{suffix}",
            "value": round(msps, 1),
            "unit": "Msamples/s",
            "vs_baseline": round(msps / 1000.0, 3),  # target: 1 Gsample/s
        }
        if fir_impl == "pallas_bf16":
            rec["audio_snr_db_vs_f32"] = round(bf16_snr, 1)
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
