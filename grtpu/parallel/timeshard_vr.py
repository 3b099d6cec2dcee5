"""Speculative time-sharding for a SINGLE variable-rate stream.

SURVEY §7 hard part #1 / VERDICT r4 stretch #9: closed-loop clock
recovery is per-stream sequential, so one stream could never use more
than one chip (mesh_executor rejects time-sharding for VR blocks).  This
module prototypes the speculative alternative for M&M clock recovery:

  1. split the stream into D overlapping spans (overlap >> the loop's
     acquisition time);
  2. run the windowed M&M on EVERY span from a cold state — shards are
     independent, so the bank maps onto a ('time',) device mesh exactly
     like a channel bank (one stream's spans instead of many streams);
  3. reconcile at each boundary: by the end of shard i's span and the
     start of shard i+1's kept region both loops have converged to the
     same timing, up to an integer symbol-slot offset from shard i+1's
     cold acquisition.  The offset is recovered by correlating the
     overlap symbols, and the spans splice into one stream.

The splice is APPROXIMATE by design (the reference semantics are a
single continuous loop); the guarantee is convergence-based: symbols
outside each shard's settle region match the continuous loop's symbols
up to loop noise.  ``time_sharded_mm`` returns the spliced symbols plus
per-boundary diagnostics so callers can gate on splice quality.

Cost model (why speculative beats sequential hand-off): a sequential
time-split would serialize D chip-latencies of loop state hand-off per
chunk (each shard waits for its predecessor's final (mu, omega)), so
wall time never beats one chip.  Speculation wastes overlap*D samples of
redundant work (overlap ~ 4k samples vs spans of millions) and one
overlap correlation per boundary, but all D spans run concurrently —
near-linear speedup for spans >> overlap.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from grtpu.digital import loops


def _span_symbols(x_span, sps, gain_omega, gain_mu, omega_relative_limit,
                  W):
    st = loops.mm_windowed_init_state(float(sps), 0.5)
    ys, _ = loops.clock_recovery_mm_ff_windowed(
        x_span, st, sps, gain_omega, gain_mu, omega_relative_limit, W=W)
    return ys


def time_sharded_mm(x: np.ndarray, sps: float, gain_omega: float,
                    gain_mu: float, nshards: int,
                    overlap_syms: int = 512,
                    omega_relative_limit: float = 0.001, W: int = 32,
                    mesh=None) -> Tuple[np.ndarray, dict]:
    """M&M clock recovery of ONE stream across ``nshards`` time shards.

    x: raw samples (no history preload needed; shards self-pad).
    overlap_syms: per-boundary overlap in SYMBOLS; must comfortably cover
      the loop's acquisition (hundreds of symbols at typical gains).
    mesh: optional jax Mesh with a 'time' axis — the span bank is then
      sharded over it (one shard per device); default runs the vmapped
      bank wherever jit places it.

    Returns (symbols, diag) where diag carries per-boundary slot offsets
    and overlap agreement ratios.
    """
    P, Q = loops.rationalize_sps(sps)
    sps_nom = P / Q
    n = len(x)
    span_syms = int(np.ceil(n / sps_nom / nshards))
    L = int(np.ceil(sps_nom)) + 2 * W + loops.NTAPS
    # shard s processes stream symbols
    #   [s*span_syms - overlap, (s+1)*span_syms)
    # — the leading ``overlap`` symbols are cold-acquisition warm-up
    # (discarded), so every KEPT symbol comes from a converged loop
    span_in = int(np.ceil((span_syms + overlap_syms) * sps_nom)) + L

    starts = [int(np.floor(max(s * span_syms - overlap_syms, 0)
                           * sps_nom)) for s in range(nshards)]
    xp = np.concatenate([np.zeros(W, np.float32),
                         np.asarray(x, np.float32),
                         np.zeros(span_in, np.float32)])
    spans = np.stack([xp[st: st + span_in] for st in starts])

    fn = jax.jit(jax.vmap(lambda s: _span_symbols(
        s, sps, gain_omega, gain_mu, omega_relative_limit, W)))
    spans_j = jnp.asarray(spans)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as Pspec

        spans_j = jax.device_put(
            spans_j, NamedSharding(mesh, Pspec("time", None)))
    ys = np.asarray(fn(spans_j))                  # (D, T_span)

    # splice: shard 0 starts at stream symbol 0 with no warm-up (same
    # preload as the continuous loop); shard s >= 1 keeps local
    # [overlap + d_s, overlap + d_s + span_syms), with d_s recovered by
    # correlating its post-settle warm-up against shard s-1's KEPT
    # symbols at the same stream positions
    settle = max(overlap_syms // 2, 64)
    out = [ys[0][:span_syms]]
    diag = {"offsets": [], "agreement": []}
    for s in range(1, nshards):
        cur = ys[s]
        prev = ys[s - 1]
        # stream window [s*span_syms - overlap + settle, s*span_syms):
        # shard s local [settle, overlap); shard s-1 local (add its own
        # warm-up offset for s-1 >= 1)
        poff = 0 if s == 1 else overlap_syms
        a = np.sign(prev[poff + span_syms - overlap_syms + settle:
                         poff + span_syms - 8])
        best_off, best_score = 0, -1.0
        for off in range(-4, 5):
            lo = settle + off
            b = np.sign(cur[lo: lo + len(a)]) if lo >= 0 else None
            if b is None or len(b) != len(a):
                continue
            score = float((a == b).mean())
            if score > best_score:
                best_off, best_score = off, score
        diag["offsets"].append(best_off)
        diag["agreement"].append(best_score)
        keep = cur[overlap_syms + best_off:
                   overlap_syms + best_off + span_syms]
        out.append(keep)
    symbols = np.concatenate(out)
    total = int(np.floor((n - L) / sps_nom))
    return symbols[:total], diag
