"""Run every chain benchmark and record the results machine-readably.

VERDICT round-1 weak item #8: north-star chain claims (WBFM/DMR > 1 Gsps)
must be machine-recorded artifacts per round, not README prose.  This
driver runs each benchmarks/*_bench.py in a fresh process (the TPU tunnel
occasionally wedges; a fresh process recovers), collects every JSON line
each prints, and writes BENCH_CHAINS.json at the repo root:

    {"chains": [ {...one record per printed line...} ],
     "failed": ["name", ...]}

Run from the repo root on the TPU:  python benchmarks/run_chains.py
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

BENCHES = [
    "executor_overhead_bench.py",
    "wfm_bench.py",
    "channelizer_bench.py",
    "dmr_bench.py",
    "mm_bench.py",
    "resampler_bench.py",
    "ofdm_bench.py",
    "trellis_bench.py",
]


def run_one(name: str, timeout: int = 900):
    """One benchmark in a fresh process; returns its JSON records."""
    for attempt in range(2):
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(HERE, name)],
                capture_output=True, text=True, timeout=timeout, cwd=ROOT)
        except subprocess.TimeoutExpired:
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
            return recs
        time.sleep(30)
    return None


def main():
    chains, failed = [], []
    for name in BENCHES:
        print(f"== {name}", flush=True)
        recs = run_one(name)
        if recs is None:
            failed.append(name)
            print(f"   FAILED", flush=True)
            continue
        for rec in recs:
            rec["bench"] = name
            chains.append(rec)
            print("  ", json.dumps(rec), flush=True)
    out = {"chains": chains, "failed": failed}
    path = os.path.join(ROOT, "BENCH_CHAINS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: {len(chains)} records, {len(failed)} failed")


if __name__ == "__main__":
    main()
