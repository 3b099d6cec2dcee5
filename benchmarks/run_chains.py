"""Run every chain benchmark and record the results machine-readably.

VERDICT round-1 weak item #8: north-star chain claims (WBFM/DMR > 1 Gsps)
must be machine-recorded artifacts per round, not README prose.  VERDICT
round-3 weak items #1-#3 hardened the harness: per-bench timeouts (wfm's
cold compile brushes 900 s), full failure diagnostics (rc + stderr tail +
elapsed — a failed bench must never be just a name), and a tunnel-health
canary timed before each bench — round-3's channelizer numbers were
captured 7.6x under reality on a degraded tunnel and nothing noticed.

This driver runs each benchmarks/*_bench.py in a fresh process (the TPU
tunnel occasionally wedges; a fresh process recovers), collects every JSON
line each prints, and writes BENCH_CHAINS.json at the repo root:

    {"chains": [ {...one record per printed line, + canary_tflops...} ],
     "failed": [ {"name": ..., "rc": ..., "stderr_tail": ..., ...} ],
     "canary": {"best_tflops": ..., "history": [...]}}

Run from the repo root on the TPU:  python benchmarks/run_chains.py
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

# (name, timeout_s) — wfm compiles 3 big chain variants; everything else
# fits comfortably in 900 s once /tmp/jax_cache is warm.
BENCHES = [
    ("executor_overhead_bench.py", 900),
    ("wfm_bench.py", 2400),
    ("channelizer_bench.py", 900),
    ("dmr_bench.py", 900),
    ("mm_bench.py", 900),
    ("resampler_bench.py", 900),
    ("ofdm_bench.py", 1200),
    ("trellis_bench.py", 900),
    ("stream_service_bench.py", 900),
    ("psk_bench.py", 1800),
    ("atsc_bench.py", 1800),
    ("vocoder_bench.py", 1200),
]

# Fixed-cost health probe: in-jit fori_loop matmul slope (block_until_ready
# does not block on the tunnel — CLAUDE.md), printed as achieved TFLOPS.
# 2048^3 f32 HIGHEST matmul, (m=65 - m=1)/64 slope: the measured span is
# ~0.5-2 s of real device time so tunnel RTT jitter (a few ms) cannot
# swing the reading k-fold (a 1024^3/m=16 probe measured 0-68 TF on a
# healthy chip — useless as a gate).
_CANARY_SRC = r"""
import json, time
import numpy as np
import jax, jax.numpy as jnp
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

@jax.jit
def g(a, b, m):
    def body(i, s):
        c = jnp.dot(a + s * 1e-30, b, precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(c) * 1e-30
    return jax.lax.fori_loop(0, m, body, jnp.float32(0.0))

r = np.random.RandomState(0)
a = jnp.asarray(r.randn(2048, 2048).astype(np.float32))
b = jnp.asarray(r.randn(2048, 2048).astype(np.float32))
float(np.asarray(g(a, b, jnp.int32(1))))   # compile + warm
vals = []
for _ in range(3):
    t0 = time.perf_counter()
    float(np.asarray(g(a, b, jnp.int32(1))))
    t1 = time.perf_counter()
    float(np.asarray(g(a, b, jnp.int32(65))))
    t2 = time.perf_counter()
    s = ((t2 - t1) - (t1 - t0)) / 64
    if s > 0:
        vals.append(s)
per = float(np.median(vals)) if vals else float("inf")
print(json.dumps({"canary_tflops": round(2 * 2048**3 / per / 1e12, 2)}))
"""


def run_canary(timeout: int = 300):
    """Measure the fixed-cost probe in a fresh process; None on failure."""
    try:
        r = subprocess.run([sys.executable, "-c", _CANARY_SRC],
                           capture_output=True, text=True,
                           timeout=timeout, cwd=ROOT)
    except subprocess.TimeoutExpired:
        return None
    for line in r.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)["canary_tflops"]
            except (json.JSONDecodeError, KeyError):
                pass
    return None


def wait_healthy(best, history, retries: int = 6, factor: float = 3.0,
                 floor: float = 8.0):
    """Canary until the tunnel reads both above the absolute ``floor``
    (TFLOPS — a healthy v5e measures ~25-35 on this probe; round-3's
    degraded tunnel was 7.6x under reality) and within ``factor`` of the
    best value seen this run.

    Returns (tflops, best).  A wedged tunnel recovers on its own in
    10-30 min (see CLAUDE.md); sleep between attempts rather than
    recording numbers that are k-fold off reality.
    """
    for attempt in range(retries):
        v = run_canary()
        history.append(v)
        print(f"   canary: {v} TFLOPS (best {best})", flush=True)
        if v is not None:
            best = max(best or 0.0, v)
            if v >= floor and v >= best / factor:
                return v, best
        time.sleep(120 if attempt else 30)
    return None, best


def run_one(name: str, timeout: int):
    """One benchmark in a fresh process.

    Returns (records, None) on success or (None, diagnostic) on failure —
    the diagnostic keeps rc, elapsed and the stderr tail (round-3 weak #2:
    a failure record with only a name cost a round of OFDM evidence).
    """
    diag = {"name": name}
    for attempt in range(2):
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(HERE, name)],
                capture_output=True, text=True, timeout=timeout, cwd=ROOT)
        except subprocess.TimeoutExpired as e:
            diag.update(rc=None, elapsed_s=round(time.time() - t0, 1),
                        stderr_tail=((e.stderr or b"")[-2000:].decode(
                            "utf-8", "replace")
                            if isinstance(e.stderr, bytes)
                            else (e.stderr or "")[-2000:]),
                        error="timeout")
            time.sleep(30)
            continue
        recs = []
        for line in r.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    recs.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
        if r.returncode == 0 and recs:
            return recs, None
        diag.update(rc=r.returncode, elapsed_s=round(time.time() - t0, 1),
                    stderr_tail="\n".join(r.stderr.splitlines()[-10:]),
                    error="nonzero rc" if r.returncode else "no JSON output")
        time.sleep(30)
    return None, diag


def main(only=None):
    chains, failed, canary_hist = [], [], []
    best = None
    for name, timeout in BENCHES:
        if only and name not in only:
            continue
        print(f"== {name}", flush=True)
        canary, best = wait_healthy(best, canary_hist)
        if canary is None:
            failed.append({"name": name, "error": "tunnel unhealthy",
                           "canary_history": canary_hist[-6:]})
            print("   SKIPPED (tunnel unhealthy)", flush=True)
            continue
        recs, diag = run_one(name, timeout)
        if recs is None:
            failed.append(diag)
            print(f"   FAILED: {json.dumps(diag)}", flush=True)
            continue
        for rec in recs:
            rec["bench"] = name
            rec["canary_tflops"] = canary
            chains.append(rec)
            print("  ", json.dumps(rec), flush=True)
    out = {"chains": chains, "failed": failed,
           "canary": {"best_tflops": best, "history": canary_hist}}
    path = os.path.join(ROOT, "BENCH_CHAINS.json")
    if only and os.path.exists(path):
        # partial re-run: merge over the existing artifact by bench name
        with open(path) as f:
            old = json.load(f)
        keep = [r for r in old.get("chains", []) if r.get("bench") not in only]
        out["chains"] = keep + chains
        out["failed"] += [d for d in old.get("failed", [])
                          if (d.get("name") if isinstance(d, dict) else d)
                          not in only]
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: {len(out['chains'])} records, "
          f"{len(out['failed'])} failed")


if __name__ == "__main__":
    main(only=set(sys.argv[1:]) or None)
