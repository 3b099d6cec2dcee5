"""Pallas TPU kernel: multi-stage FIR cascade resident in VMEM.

The volk/gr_fir SIMD layer analog at its most aggressive: where
grtpu.ops.fir runs each FIR as one XLA matmul (HBM -> MXU -> HBM per
stage), this kernel keeps the stream tile in VMEM across a whole cascade of
stages — the reference's thread-per-block pipeline with its vmcircbuf
handoffs collapses into a single on-chip loop.

Layout trick: the stream lives as a (rows, 128) row-major matrix.  With
taps zero-padded to 257 (halo = 256 samples = 2 rows), a stage's (R, 384)
Toeplitz window matrix is three sublane-shifted VIEWS of the stream
buffer, so each stage is three (R,128)@(128,128) MXU matmuls on shifted
reads — nothing is materialized, and the bf16 split-word decomposition
happens once per stage on the (R,128) buffer rather than on the
3x-redundant window.  Two precision modes: Mosaic HIGHEST (f32-class) or
a manual bf16 split-word 3-pass (~1.6x faster at ~5e-6 rel err).

Alignment rules learned on hardware (Mosaic faults otherwise): every DMA
row count and scratch allocation is a multiple of 8 sublanes; stages run
at a FIXED row count (no shrinking slices) so only sublane-offset *reads*
occur, which are legal.  Stage s corrupts the 2 rows below its consumed
halo; with halo_alloc >= 2*nstages the creep never reaches the output rows.
Tiles overlap by halo_alloc rows of redundant compute so the grid stays
embarrassingly parallel; overlapping input windows are DMA'd manually
(BlockSpecs cannot overlap).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round8(r: int) -> int:
    return -(-r // 8) * 8


def _halo_rows(ntaps: int) -> int:
    """Rows of lookback a stage consumes: taps pad to nh*128 + 1."""
    return max(1, -(-(ntaps - 1) // LANE))


def _pad_taps(taps: np.ndarray) -> np.ndarray:
    k = len(taps)
    kpad = _halo_rows(k) * LANE + 1
    # trailing zeros: keeps y[i] aligned with the nh-row halo exactly
    return np.concatenate([np.asarray(taps, np.float32),
                           np.zeros(kpad - k, np.float32)])


def _tap_matrix_np(taps_padded: np.ndarray) -> np.ndarray:
    """T[j, b] = taps[j - b] for the (R, k+127)@(k+127, 128) stage matmul."""
    k = len(taps_padded)
    ncols = k + LANE - 1
    j = np.arange(ncols)[:, None]
    b = np.arange(LANE)[None, :]
    idx = j - b
    valid = (idx >= 0) & (idx < k)
    t = np.where(valid, taps_padded[np.clip(idx, 0, k - 1)], 0.0)
    return t.astype(np.float32)


def _cascade_kernel(x_hbm, th_ref, tl_ref, o_ref, buf2, buf, bh, bl, sems,
                    *, nstages: int, tile_rows: int, halo_alloc: int,
                    precision: str, nbatch: int, ntiles: int, nh: int):
    i = pl.program_id(0)   # batch row
    t = pl.program_id(1)   # tile
    R = tile_rows + halo_alloc          # DMA'd rows (multiple of 8)

    # Double-buffered input DMA: tile step s fetches into slot s%2 while
    # step s-1 computes (grid steps run sequentially on the core, so the
    # step-s+1 start below overlaps THIS step's 16 stages of matmuls).
    step = i * ntiles + t
    nsteps = nbatch * ntiles

    in_bf16 = x_hbm.dtype == jnp.bfloat16

    def dma_for(s, slot):
        ii = s // ntiles
        tt = s - ii * ntiles
        # bf16 slots carry the overread pad rows too (the window reads
        # them); the DMA fills the first R rows only
        dst = buf2.at[slot, pl.ds(0, R)] if in_bf16 else buf2.at[slot]
        return pltpu.make_async_copy(
            x_hbm.at[ii, pl.ds(tt * tile_rows, R), :],
            dst, sems.at[slot])

    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        dma_for(0, 0).start()

    @pl.when(step + 1 < nsteps)
    def _():
        dma_for(step + 1, jax.lax.rem(step + 1, 2)).start()

    pad = _round8(nh)  # overread rows for the sublane-shifted views
    dma_for(step, slot).wait()

    def mm(a, tt, prec=None):
        return jax.lax.dot_general(
            a, tt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    nshift = nh + 1  # window = (nh+1)*128 columns as sublane-shifted views
    if nstages == 1 and x_hbm.dtype == jnp.bfloat16:
        # bf16-resident stream (precision="bf16" only): the DMA lands
        # bf16 directly, so there is no convert and no work-buffer copy —
        # the stage matmuls read sublane-shifted views of the landing
        # slot itself.  Numerically identical to the f32-input bf16 path
        # (whose first act is rounding the slot to bf16); the halved
        # input DMA and freed VMEM measure 120 -> 153 TF effective on
        # the composed 4097-tap bench config (1x v5e).
        @pl.when(step < 2)
        def _():
            # zero each slot's overread pad rows once (DMA writes [:R])
            buf2[step, R:] = jnp.zeros((pad, LANE), jnp.bfloat16)
        y = jnp.zeros((R, LANE), jnp.float32)
        for d in range(nshift):
            y += mm(buf2[slot, d:R + d], th_ref[0, d * LANE:(d + 1) * LANE])
        pre = halo_alloc - nh
        o_ref[0] = y[pre:pre + tile_rows]
        return

    if nstages == 1 and precision in ("bf16", "bf16x3"):
        # single-stage fast path (composed/long filters): split straight
        # from the DMA landing slot — no f32 work-buffer copy, and the
        # freed VMEM admits larger tiles
        bh[:R] = buf2[slot].astype(jnp.bfloat16)
        bh[R:] = jnp.zeros((pad, LANE), jnp.bfloat16)
        if precision == "bf16x3":
            bl[:R] = (buf2[slot] - bh[:R].astype(jnp.float32)).astype(
                jnp.bfloat16)
            bl[R:] = jnp.zeros((pad, LANE), jnp.bfloat16)
        y = jnp.zeros((R, LANE), jnp.float32)
        for d in range(nshift):
            th_d = th_ref[0, d * LANE:(d + 1) * LANE]
            wh = bh[d:R + d]
            y += mm(wh, th_d)
            if precision == "bf16x3":
                y += mm(wh, tl_ref[0, d * LANE:(d + 1) * LANE])
                y += mm(bl[d:R + d], th_d)
        pre = halo_alloc - nh
        o_ref[0] = y[pre:pre + tile_rows]
        return

    # stage iterations overwrite the buffer, so copy the landed tile into
    # the (statically-indexed) work buffer and zero the overread pad rows
    buf[0:R] = buf2[slot]
    buf[R:] = jnp.zeros((pad, LANE), jnp.float32)

    # The (R, (nh+1)*128) Toeplitz window matrix is nh+1 sublane-shifted
    # views of the stream buffer, so the stage matmul decomposes into nh+1
    # (R,128)@(128,128) products on shifted READS (legal at any sublane
    # offset) — no window materialization, and for the split-word mode the
    # bf16 hi/lo decomposition happens ONCE on the buffer instead of on the
    # redundant window (identical numerics, much less VPU work between MXU
    # ops).
    for _ in range(nstages):
        if precision == "f32":
            y = jnp.zeros((R, LANE), jnp.float32)
            for d in range(nshift):
                y += mm(buf[d:R + d], th_ref[0, d * LANE:(d + 1) * LANE],
                        jax.lax.Precision.HIGHEST)
        elif precision == "bf16":
            # single-pass: data+taps rounded to bf16 (rel err ~4e-3, ~48 dB
            # — use only where the chain SNR bound allows)
            bh[:] = buf[:].astype(jnp.bfloat16)
            y = jnp.zeros((R, LANE), jnp.float32)
            for d in range(nshift):
                y += mm(bh[d:R + d], th_ref[0, d * LANE:(d + 1) * LANE])
        else:  # bf16x3: manual split-word 3-pass (rel err ~3e-5)
            bh[:] = buf[:].astype(jnp.bfloat16)
            bl[:] = (buf[:] - bh[:].astype(jnp.float32)).astype(jnp.bfloat16)
            y = jnp.zeros((R, LANE), jnp.float32)
            for d in range(nshift):
                th_d = th_ref[0, d * LANE:(d + 1) * LANE]
                tl_d = tl_ref[0, d * LANE:(d + 1) * LANE]
                wh = bh[d:R + d]
                y += mm(wh, th_d) + mm(wh, tl_d) + mm(bl[d:R + d], th_d)
        buf[:R] = y
    pre = halo_alloc - nstages * nh
    o_ref[0] = buf[pre:pre + tile_rows]


def fir_cascade(x: jnp.ndarray, taps: np.ndarray, nstages: int,
                tile_rows: int = 256, interpret: bool = False,
                precision: str = "f32") -> jnp.ndarray:
    """Apply ``nstages`` sequential FIRs (same taps) to each row of x.

    Args:
      x: (batch, n) float32, n a multiple of 128.  Zero history assumed
         (flowgraph start); each stage produces full-rate output like the
         reference's chained fir_filter_fff blocks.
      taps: up to 257 taps (convolution orientation).
      nstages: number of chained stages.
      tile_rows: output rows (x128 samples) per grid step (multiple of 8).
      precision: "f32" (Mosaic HIGHEST multi-pass, ~1.6e-7 rel err) or
        "bf16x3" (manual split-word 3-pass, ~5e-6 rel err ~= 105 dB SNR;
        measured 33-53 TFLOPS on v5e depending on machine state, vs 20.7
        f32 — the shifted-view formulation is 15-20% over the materialized
        (R,384) window it replaced, and the double-buffered input DMA
        hides the tile fetch behind the 16-stage compute, +25-40% at
        tile_rows=1024-2048).

    Returns (batch, n) float32.
    """
    if x.ndim == 1:
        return fir_cascade(x[None, :], taps, nstages, tile_rows, interpret,
                           precision)[0]
    in_bf16 = x.dtype == jnp.bfloat16
    if in_bf16 and (nstages != 1 or precision != "bf16"):
        raise ValueError("bf16-resident streams need nstages=1 and "
                         "precision='bf16' (the split-word lo plane needs "
                         "the f32 residual)")
    b, n = x.shape
    assert n % LANE == 0, "stream length must be a multiple of 128"
    nh = _halo_rows(len(taps))
    rows = n // LANE
    tile_rows = min(tile_rows, _round8(rows))
    ntiles = -(-rows // tile_rows)
    halo_alloc = _round8(nstages * nh)
    R = tile_rows + halo_alloc

    # host-side: prepend halo_alloc zero rows, pad tail to the tile grid
    pad_rows = ntiles * tile_rows - rows
    xp = jnp.pad(x, ((0, 0), (halo_alloc * LANE, pad_rows * LANE)))
    x2 = xp.reshape(b, rows + halo_alloc + pad_rows, LANE)

    # reversed taps: the W@T correlation machinery then computes convolution
    tmat_hi, tmat_lo = _tap_group([taps], precision)

    kern = functools.partial(_cascade_kernel, nstages=nstages,
                             tile_rows=tile_rows, halo_alloc=halo_alloc,
                             precision=precision, nbatch=b, ntiles=ntiles,
                             nh=nh)
    y = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, ntiles * tile_rows, LANE),
                                       jnp.float32),
        grid=(b, ntiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # x stays in HBM
            pl.BlockSpec((1, (nh + 1) * LANE, LANE), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, (nh + 1) * LANE, LANE), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_rows, LANE), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=_scratch(R, nh, nstages, precision, in_bf16),
        interpret=interpret,
    )(x2, tmat_hi, tmat_lo)
    return y.reshape(b, -1)[:, :n]


def _scratch(R, nh, nstages, precision, in_bf16):
    """Kernel scratch set; bf16-resident streams land straight into a
    bf16 slot (incl. pad rows) and skip the f32/hi/lo work buffers."""
    pad = _round8(nh)
    if in_bf16:
        return [
            pltpu.VMEM((2, R + pad, LANE), jnp.bfloat16),
            pltpu.VMEM((8, LANE), jnp.float32),
            pltpu.VMEM((8, LANE), jnp.bfloat16),
            pltpu.VMEM((8, LANE), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    return [
        pltpu.VMEM((2, R, LANE), jnp.float32),   # DMA landing slots
        # f32 work buffer unused on the single-stage bf16 fast path
        pltpu.VMEM((8 if (nstages == 1 and precision != "f32")
                    else R + pad, LANE), jnp.float32),
        pltpu.VMEM((R + pad, LANE), jnp.bfloat16),
        pltpu.VMEM((R + pad, LANE), jnp.bfloat16),
        pltpu.SemaphoreType.DMA((2,)),
    ]


def _tap_group(tapsets, precision):
    """Stack per-batch tap matrices: tapsets (G, L) (or list of 1-D arrays
    of equal length) -> (G, (nh+1)*128, 128) hi/lo pair.  Grid batch row i
    uses tap set ``i % G`` (phase-major batch ordering)."""
    mats = [_tap_matrix_np(_pad_taps(np.asarray(tp, np.float32))[::-1].copy())
            for tp in tapsets]
    T = np.stack(mats)
    if precision in ("bf16x3", "bf16"):
        th = jnp.asarray(T).astype(jnp.bfloat16)
        tl = (jnp.asarray(T) - th.astype(jnp.float32)).astype(jnp.bfloat16)
        return th, tl
    return jnp.asarray(T), jnp.asarray(np.zeros_like(T))


def fir_long(x: jnp.ndarray, taps: np.ndarray,
             tile_rows: int = 1024, interpret: bool = False,
             precision: str = "bf16x3") -> jnp.ndarray:
    """History-carrying single-stage Pallas FIR, flowgraph-compatible.

    The grtpu.ops.fir.fir_filter contract (executor halo convention):
    ``x`` carries K-1 leading history samples and the output has
    ``len(x) - K + 1`` samples, ``y[i] = sum_k taps[k] x[i + K-1 - k]``.
    Routes through the VMEM cascade kernel's single-stage fast path — the
    MXU-efficient choice for LONG filters (window efficiency
    K/(K+127): 80% at 513 taps, 97% at 4097) and the target of the
    FIR-chain fusion pass (grtpu.runtime.optimize).

    f32 streams / real taps only (fir_decim handles decimation;
    fir_long_c composes the complex planes).
    """
    taps = np.asarray(taps, np.float32)
    k = len(taps)
    n = x.shape[0] - (k - 1)
    y = _phase_batched(x[None, :], [taps], n, tile_rows, interpret,
                       precision)
    return y[0, :n]


def batch_fir_long(x: jnp.ndarray, taps: np.ndarray,
                   tile_rows: int = 1024, interpret: bool = False,
                   precision: str = "bf16x3") -> jnp.ndarray:
    """fir_long over a channel batch: x (C, n + K - 1) -> (C, n)."""
    taps = np.asarray(taps, np.float32)
    n = x.shape[1] - (len(taps) - 1)
    y = _phase_batched(x, [taps], n, tile_rows, interpret, precision)
    return y[:, :n]


def _phase_split_taps(taps: np.ndarray, d: int) -> np.ndarray:
    """Decompose a decimating FIR into d per-phase full-rate FIRs on the
    d interleaved substreams z_p[e] = x[e*d + p]:

        y[j] = sum_k taps[k] x[j*d + K-1 - k]
             = sum_p sum_i h[p, i] z_p[j + L-1 - i]

    (classic polyphase decimation, cf. the reference's per-phase engine
    loop in gr_fir_filter_XXX decimation).  Returns h (d, L)."""
    taps = np.asarray(taps, np.float32)
    k = len(taps)
    L = (k - 1) // d + 1
    h = np.zeros((d, L), np.float32)
    for kk in range(k):
        p = (k - 1 - kk) % d
        sft = (k - 1 - kk - p) // d
        h[p, L - 1 - sft] = taps[kk]
    return h


def fir_decim(x: jnp.ndarray, taps: np.ndarray, decim: int,
              tile_rows: int = 1024, interpret: bool = False,
              precision: str = "bf16x3") -> jnp.ndarray:
    """Decimating Pallas FIR with the ops.fir.fir_filter contract:
    x carries K-1 leading history, returns n // decim outputs.

    Phase-split on the host (one XLA transpose), then ALL phases of ALL
    channels run as one kernel grid with per-phase tap matrices; the
    d-way phase sum happens in XLA on the (decimated) outputs, so the
    kernel never touches a strided access and the MXU work per input
    sample is exactly 2K/d FLOP.
    """
    if x.ndim == 1:
        return fir_decim(x[None, :], taps, decim, tile_rows=tile_rows,
                         interpret=interpret, precision=precision)[0]
    taps = np.asarray(taps, np.float32)
    d = int(decim)
    if d == 1:
        return batch_fir_long(x, taps, tile_rows, interpret, precision)
    c, total = x.shape
    k = len(taps)
    n = total - (k - 1)
    assert n % d == 0, "fresh input must be a multiple of decim"
    nout = n // d
    h = _phase_split_taps(taps, d)          # (d, L)
    L = h.shape[1]
    need = (nout + L - 1) * d
    xp = (jnp.pad(x, ((0, 0), (0, need - total))) if need > total
          else x[:, :need])
    # z[c, p, e] = x[c, e*d + p]  (one relayout, fused by XLA)
    z = xp.reshape(c, nout + L - 1, d).transpose(0, 2, 1)
    z = z.reshape(c * d, nout + L - 1)
    y = _phase_batched(z, list(h), nout, tile_rows, interpret, precision)
    y = y[:, :nout].reshape(c, d, nout)
    return jnp.sum(y, axis=1)


def fir_decim_c(x: jnp.ndarray, taps: np.ndarray, decim: int = 1,
                tile_rows: int = 1024, interpret: bool = False,
                precision: str = "bf16x3") -> jnp.ndarray:
    """Complex-stream real-taps (ccf) Pallas FIR with optional decimation:
    the two real planes ride the same kernel grid as extra batch rows."""
    if x.ndim == 1:
        return fir_decim_c(x[None, :], taps, decim, tile_rows=tile_rows,
                           interpret=interpret, precision=precision)[0]
    planes = jnp.concatenate([jnp.real(x), jnp.imag(x)], axis=0)
    y = fir_decim(planes, taps, decim, tile_rows, interpret, precision)
    c = x.shape[0]
    return (y[:c] + 1j * y[c:]).astype(jnp.complex64)


def fir_decim_cc(x: jnp.ndarray, taps: np.ndarray, decim: int = 1,
                 tile_rows: int = 1024, interpret: bool = False,
                 precision: str = "bf16x3") -> jnp.ndarray:
    """Complex-stream complex-taps (ccc): four real passes
    (r*tr - i*ti) + j(r*ti + i*tr) batched through one kernel grid each
    per tap plane."""
    if x.ndim == 1:
        return fir_decim_cc(x[None, :], taps, decim, tile_rows=tile_rows,
                            interpret=interpret, precision=precision)[0]
    taps = np.asarray(taps)
    planes = jnp.concatenate([jnp.real(x), jnp.imag(x)], axis=0)
    yr = fir_decim(planes, np.real(taps).astype(np.float32), decim,
                   tile_rows, interpret, precision)
    yi = fir_decim(planes, np.imag(taps).astype(np.float32), decim,
                   tile_rows, interpret, precision)
    c = x.shape[0]
    out_r = yr[:c] - yi[c:]
    out_i = yi[:c] + yr[c:]
    return (out_r + 1j * out_i).astype(jnp.complex64)


def _phase_batched(xb, tapsets, n, tile_rows, interpret, precision):
    """Run the single-stage kernel over batch rows with per-row tap sets
    (row i uses tapsets[i % G]).  Each row of xb carries L-1 leading
    history samples (L = tap set length); returns (B, rows*128) with the
    first n samples per row valid."""
    b = xb.shape[0]
    k = len(tapsets[0])
    nh = _halo_rows(k)
    halo = nh * LANE
    # place the real history where the kernel's zero-halo normally sits:
    # prepend (halo - (k-1)) zeros so sample 0 of the output aligns
    xp = jnp.pad(xb, ((0, 0), (halo - (k - 1), 0)))
    rows = -(-n // LANE)
    need = halo + rows * LANE
    if xp.shape[1] < need:
        xp = jnp.pad(xp, ((0, 0), (0, need - xp.shape[1])))
    else:
        xp = xp[:, :need]
    return _single_stage(xp, tapsets, tile_rows, interpret, precision, nh)


def _single_stage(xp, tapsets, tile_rows, interpret, precision, nh):
    """Run the cascade kernel with pre-supplied halo samples (xp already
    contains nh*LANE leading context per row); grid batch row i uses tap
    set i % len(tapsets)."""
    if xp.dtype == jnp.bfloat16 and precision != "bf16":
        raise ValueError("bf16-resident streams need precision='bf16'")
    b, total = xp.shape
    g = len(tapsets)
    halo = nh * LANE
    rows = (total - halo) // LANE
    tile_rows = min(tile_rows, _round8(rows))
    ntiles = -(-rows // tile_rows)
    halo_alloc = _round8(nh)
    pad_rows = ntiles * tile_rows - rows
    extra = (halo_alloc - nh) * LANE
    x2 = jnp.pad(xp, ((0, 0), (extra, pad_rows * LANE)))
    x2 = x2.reshape(b, rows + halo_alloc + pad_rows, LANE)

    tmat_hi, tmat_lo = _tap_group(tapsets, precision)
    R = tile_rows + halo_alloc
    kern = functools.partial(_cascade_kernel, nstages=1,
                             tile_rows=tile_rows, halo_alloc=halo_alloc,
                             precision=precision, nbatch=b, ntiles=ntiles,
                             nh=nh)
    y = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, ntiles * tile_rows, LANE),
                                       jnp.float32),
        grid=(b, ntiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, (nh + 1) * LANE, LANE),
                         lambda i, t: (i % g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, (nh + 1) * LANE, LANE),
                         lambda i, t: (i % g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_rows, LANE), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=_scratch(R, nh, 1, precision,
                                xp.dtype == jnp.bfloat16),
        interpret=interpret,
    )(x2, tmat_hi, tmat_lo)
    return y.reshape(b, -1)
