"""Generic trellis algorithms: Viterbi and SISO (max-log BCJR).

Analog of gr-trellis core_algorithms (gr-trellis/src/lib/core_algorithms.
{h,cc}:37-126): table-driven Viterbi over any FSM, metric types
(euclidean on constellation points / hard symbol hamming), and the SISO
max* forward-backward used by PCCC/SCCC turbo schemes.

TPU-native: time recursions are lax.scans carrying all S path metrics as a
vector; per-step work is gathers over the predecessor tables + max-reduce
(VPU).  Branch metrics for the whole block are computed up front as one
batched distance matrix (MXU/VPU), not per step.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from grtpu.trellis.fsm import FSM

NEG = -1e9


def calc_metric_euclidean(obs: jnp.ndarray, table: jnp.ndarray,
                          dim: int = 1) -> jnp.ndarray:
    """(T*dim,) observations vs O constellation points of dimension dim ->
    (T, O) NEGATIVE squared distances (higher = better), matching
    calc_metric's TRELLIS_EUCLIDEAN (up to sign; we maximize)."""
    o = obs.reshape(-1, dim)
    t = table.reshape(-1, dim)
    if jnp.iscomplexobj(o) or jnp.iscomplexobj(t):
        d = jnp.abs(o[:, None, :] - t[None, :, :]) ** 2
    else:
        d = (o[:, None, :] - t[None, :, :]) ** 2
    return -d.sum(-1)


def calc_metric_hard(obs_symbols: jnp.ndarray, O: int) -> jnp.ndarray:
    """(T,) hard symbols -> (T, O) 0/-1 match metric (TRELLIS_HARD_SYMBOL)."""
    eye = jnp.where(
        jnp.arange(O)[None, :] == obs_symbols[:, None].astype(jnp.int32),
        0.0, -1.0)
    return eye


def viterbi(fsm: FSM, metrics: jnp.ndarray, start_state: int = 0,
            end_state: int = -1) -> jnp.ndarray:
    """Table-driven Viterbi (core_algorithms viterbi_algorithm).

    metrics: (T, O) per-step per-output-symbol metrics (higher better).
    Returns (T,) decoded input symbols."""
    S, I = fsm.S, fsm.I
    PS = jnp.asarray(fsm.PS)  # (S, deg)
    PI = jnp.asarray(fsm.PI)
    OS = jnp.asarray(fsm.OS)  # (S, I)
    valid = jnp.asarray(fsm.PS >= 0)
    PSc = jnp.maximum(PS, 0)
    PIc = jnp.maximum(PI, 0)
    # output symbol on edge (PS[s,j] --PI[s,j]--> s)
    edge_out = OS[PSc, PIc]  # (S, deg)

    pm0 = jnp.full((S,), NEG, jnp.float32)
    if start_state >= 0:
        pm0 = pm0.at[start_state].set(0.0)
    else:
        pm0 = jnp.zeros((S,), jnp.float32)

    def step(pm, m_t):
        cand = jnp.where(valid, pm[PSc] + m_t[edge_out], NEG)  # (S, deg)
        best = jnp.argmax(cand, axis=1)
        pm_new = jnp.take_along_axis(cand, best[:, None], 1)[:, 0]
        pm_new = pm_new - pm_new.max()
        return pm_new, best.astype(jnp.int32)

    pm_final, choices = jax.lax.scan(step, pm0, metrics)

    s_end = (jnp.argmax(pm_final).astype(jnp.int32)
             if end_state < 0 else jnp.asarray(end_state, jnp.int32))

    def back(s, ch_t):
        j = ch_t[s]
        inp = PIc[s, j]
        prev = PSc[s, j]
        return prev, inp

    _, inputs_rev = jax.lax.scan(back, s_end, choices, reverse=True)
    return inputs_rev.astype(jnp.int32)


def viterbi_combined(fsm: FSM, observations: jnp.ndarray,
                     constellation: jnp.ndarray, dim: int = 1,
                     start_state: int = 0, end_state: int = -1) -> jnp.ndarray:
    """viterbi_combined_XX: metric calculation fused with decoding."""
    m = calc_metric_euclidean(observations, constellation, dim)
    return viterbi(fsm, m, start_state, end_state)


def siso(fsm: FSM, metrics: jnp.ndarray, start_state: int = 0,
         end_state: int = -1,
         prior_in: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Max-log SISO (core_algorithms siso_algorithm with max* ~ max):
    forward/backward recursions -> per-step input-symbol APPs (log domain,
    normalized so max = 0).  Returns (T, I)."""
    S, I = fsm.S, fsm.I
    T = metrics.shape[0]
    NS = jnp.asarray(fsm.NS)  # (S, I)
    OS = jnp.asarray(fsm.OS)
    PS = jnp.maximum(jnp.asarray(fsm.PS), 0)
    PI = jnp.maximum(jnp.asarray(fsm.PI), 0)
    pvalid = jnp.asarray(fsm.PS >= 0)
    edge_out_pred = OS[PS, PI]

    if prior_in is None:
        prior_in = jnp.zeros((T, I), jnp.float32)

    a0 = jnp.full((S,), NEG, jnp.float32).at[max(start_state, 0)].set(0.0) \
        if start_state >= 0 else jnp.zeros((S,), jnp.float32)
    bT = (jnp.full((S,), NEG, jnp.float32).at[end_state].set(0.0)
          if end_state >= 0 else jnp.zeros((S,), jnp.float32))

    def fwd(a, inp):
        m_t, pr = inp
        cand = jnp.where(pvalid, a[PS] + m_t[edge_out_pred] + pr[PI], NEG)
        a_new = cand.max(axis=1)
        return a_new - a_new.max(), a

    _, alphas = jax.lax.scan(fwd, a0, (metrics, prior_in))

    def bwd(b, inp):
        m_t, pr = inp
        # b_prev[s] = max_i b[NS[s,i]] + m_t[OS[s,i]] + pr[i]
        cand = b[NS] + m_t[OS] + pr[None, :]
        b_new = cand.max(axis=1)
        return b_new - b_new.max(), b

    _, betas = jax.lax.scan(bwd, bT, (metrics, prior_in), reverse=True)

    # APP(t, i) = max_s alpha_t[s] + m_t[OS[s,i]] + beta_{t+1}[NS[s,i]]
    def app(carry, inp):
        a_t, b_t1, m_t, pr = inp
        val = a_t[:, None] + m_t[OS] + b_t1[NS] + pr[None, :]
        o = val.max(axis=0)
        return carry, o - o.max()

    _, apps = jax.lax.scan(app, 0, (alphas, betas, metrics, prior_in))
    return apps
