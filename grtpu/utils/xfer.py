"""Host<->device transfer helpers that avoid non-f32 PJRT paths.

Some experimental TPU transports (the axon tunnel in this dev rig) only
implement float32 H2D/D2H; complex64/int/uint transfers raise
UNIMPLEMENTED or hang.  Real TPU runtimes support all dtypes — these
helpers are cheap there too (two f32 copies + one fused combine), so the
framework routes host-boundary complex traffic through them everywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


from functools import partial


@partial(jax.jit, static_argnums=(2, 3))
def _combine(re, im, pad_left, pad_right):
    c = jax.lax.complex(re, im)
    if pad_left or pad_right:
        c = jnp.pad(c, (pad_left, pad_right))
    return c


def device_complex(x, pad_left: int = 0, pad_right: int = 0) -> jnp.ndarray:
    """Host complex array -> device complex64 via two f32 transfers.

    Optional zero padding happens inside the jitted combine: eager
    complex64 creation (jnp.zeros/concatenate outside jit) itself hits
    the tunnel's unimplemented-transfer path, so callers needing history
    padding should use these args instead of concatenating."""
    x = np.asarray(x)
    if not np.iscomplexobj(x):
        x = x.astype(np.complex64)
    re = jnp.asarray(np.ascontiguousarray(x.real, np.float32))
    im = jnp.asarray(np.ascontiguousarray(x.imag, np.float32))
    return _combine(re, im, int(pad_left), int(pad_right))


@jax.jit
def _split(x):
    return jnp.real(x).astype(jnp.float32), jnp.imag(x).astype(jnp.float32)


def host_complex(x) -> np.ndarray:
    """Device complex array -> host complex64 via two f32 readbacks."""
    re, im = _split(jnp.asarray(x))
    return (np.asarray(re) + 1j * np.asarray(im)).astype(np.complex64)


def host_int(x, dtype=np.int32) -> np.ndarray:
    """Device integer array -> host via an f32 readback (exact for
    |values| < 2^24; use :func:`host_int32` beyond that)."""
    f = np.asarray(jnp.asarray(x).astype(jnp.float32))
    return f.astype(dtype)


@jax.jit
def _to_bool(f):
    return f > 0.5


@jax.jit
def _split_i32(x):
    xi = x.astype(jnp.int32)
    lo = (xi & 0xFFFF).astype(jnp.float32)
    hi = ((xi >> 16) & 0xFFFF).astype(jnp.float32)
    return hi, lo


def host_int32(x, dtype=np.int32) -> np.ndarray:
    """Device 32-bit integer array -> host EXACTLY via two 16-bit f32
    planes (full int32/uint32 range — absolute sample counters exceed the
    2^24 single-f32 window after ~16M items)."""
    hi, lo = _split_i32(jnp.asarray(x))
    v = ((np.asarray(hi).astype(np.int64) << 16)
         | np.asarray(lo).astype(np.int64)).astype(np.uint32)
    if np.dtype(dtype).kind == "i":
        v = v.view(np.int32)      # two's-complement reinterpretation
    return v.astype(dtype)


def to_numpy(x) -> np.ndarray:
    """np.asarray(x) with automatic fallback through the f32-only paths.

    The universal device->host converter for sink captures: direct copy
    where the backend supports the dtype, otherwise complex via
    :func:`host_complex` (two f32 plane readbacks) or small-int via
    :func:`host_int`."""
    if isinstance(x, np.ndarray):
        return x
    dt = np.dtype(x.dtype)
    if jax.default_backend() not in ("cpu", "gpu"):
        # route by dtype upfront: a *failed* direct complex D2H attempt
        # can wedge fragile transports, and small-int/bool transfers may
        # hang rather than raise — don't even try them there
        if dt.kind == "c":
            return host_complex(x)
        if dt.kind == "b":
            return host_int(x, np.int32).astype(bool)
        if dt.kind in "iu" and dt.itemsize <= 2:
            return host_int(x, dt)
        if dt.kind in "iu" and dt.itemsize == 4:
            return host_int32(x, dt)
    try:
        return np.asarray(x)
    except Exception:
        if dt.kind == "c":
            return host_complex(x)
        if dt.kind in "iub":
            return host_int(x, dt)
        raise


@partial(jax.jit, static_argnums=(1,))
def _narrow(f, dtype_name):
    return f.astype(dtype_name)


def device_int(x) -> jnp.ndarray:
    """Host integer array -> device via an f32 transfer + on-device cast
    (exact for |values| < 2^24, which covers every integer stream type
    the block set uses: bytes, shorts, symbol indices)."""
    x = np.asarray(x)
    if np.abs(x).max(initial=0) >= (1 << 24):
        raise ValueError("device_int is exact only below 2^24; split wider "
                         "integers into two planes")
    f = jnp.asarray(x.astype(np.float32))
    return _narrow(f, np.dtype(x.dtype).name)


def device_array(x) -> jnp.ndarray:
    """Host array -> device with automatic fallback through f32-only
    transports: complex via two f32 planes, integers via f32 widening
    (exact below 2^24)."""
    x = np.asarray(x)
    if x.dtype.kind == "c":
        return device_complex(x)
    if (x.dtype.kind == "b"
            and jax.default_backend() not in ("cpu", "gpu")):
        # bool rides the same unimplemented small-dtype transfer path as
        # uint8 on fragile transports; widen through f32 (exact)
        return _to_bool(jnp.asarray(x.astype(np.float32)))
    if (x.dtype.kind in "iu" and x.dtype.itemsize <= 8
            and jax.default_backend() not in ("cpu", "gpu")):
        try:
            return device_int(x)
        except ValueError:
            pass  # wide values: try the direct path
    return jnp.asarray(x)
