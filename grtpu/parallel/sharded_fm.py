"""Sharded multi-channel WBFM: the flagship multi-chip pipeline.

Maps the reference's concurrency model (SURVEY.md §2.10) onto a 2-D device
mesh:
  * ``chan`` axis — data parallelism over independent channels (the
    reference's manual N-pipeline fan-out, mp-sched/synthetic.py:28-45);
  * ``time`` axis — sequence parallelism over the stream with overlap-save
    halo exchange via ICI collective permute (replacing vmcircbuf handoff,
    SURVEY.md §5.7 / §6.7).

The whole multi-channel receive step is ONE pjit-ed XLA program; scalar
monitoring (total audio power) rides a psum over the full mesh.

IIR boundary note: FIR/demod history crosses time-shard boundaries exactly
via the halo exchange.  The de-emphasis IIR is ALSO exact across shards:
each shard solves its local first-order recurrence from a zero incoming
state, then the true incoming states are recovered with an exclusive prefix
scan over the shards' affine maps (all-gathered (a_total, y_last0) pairs —
nt is tiny) and applied as the closed-form correction
``y += a_cumprod * y_in`` (linearity of the recurrence).  One all_gather of
two scalars per channel per step is the entire cross-shard traffic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from grtpu.ops.fir import batch_fir_filter
from grtpu.parallel.halo import ring_halo_left
from grtpu.utils import firdes


def make_mesh(n_devices: int, devices=None) -> Mesh:
    """2-D ('time', 'chan') mesh; degenerate axes allowed."""
    if devices is None:
        devices = jax.devices()[:n_devices]
    nt = 1
    for cand in (4, 2):
        if n_devices % cand == 0 and n_devices // cand >= 2:
            nt = cand
            break
    nc = n_devices // nt
    dev = np.array(devices).reshape(nt, nc)
    return Mesh(dev, ("time", "chan"))


class ShardedWfmBank:
    """N-channel WBFM receiver bank over a ('time','chan') mesh.

    Channels shard over 'chan'; each channel's sample stream shards over
    'time' with halo exchange for all FIR/demod history.
    """

    def __init__(self, mesh: Mesh, quad_rate: float = 256e3,
                 audio_decim: int = 8, nchannels: int = 64):
        self.mesh = mesh
        self.quad_rate = quad_rate
        self.audio_decim = audio_decim
        self.nchannels = nchannels
        audio_rate = quad_rate / audio_decim
        self.demod_gain = quad_rate / (2 * np.pi * 75e3)
        self.audio_taps = firdes.low_pass(
            1.0, quad_rate, audio_rate / 2 - 1e3, audio_rate / 10)
        kk = float(np.tan(1.0 / (75e-6 * 2.0 * audio_rate)))
        self.deemph_p1 = (1.0 - kk) / (1.0 + kk)
        self.deemph_b0 = kk / (1.0 + kk)
        self.ntaps = int(self.audio_taps.shape[0])
        self.n_time = mesh.shape["time"]

    def init_state(self):
        """Replicated stream state: row 0 = deemph IIR state y, row 1 =
        last audio input sample (the numerator's x[k-1] across the step
        boundary).  Shape (2, C), identical on every shard."""
        return jnp.zeros((2, self.nchannels), jnp.float32)

    def _local_step(self, iq_local, state_local):
        """One shard's work: iq_local (C_l, T_l) complex64, state_local
        (2, C_l).  Returns (audio (C_l, T_l//decim), state', power).

        The de-emphasis IIR is EXACT across time shards: local zero-state
        solves + an exclusive prefix over the shards' affine maps (one tiny
        all_gather) + the closed-form linear correction.
        """
        from grtpu.ops.dsp import linear_recurrence

        halo = self.ntaps  # 1 for quad demod + (ntaps - 1) for the FIR
        x = ring_halo_left(iq_local, "time", halo, axis=1)
        prod = x[:, 1:] * jnp.conj(x[:, :-1])
        fm = self.demod_gain * jnp.arctan2(jnp.imag(prod), jnp.real(prod))
        audio = batch_fir_filter(fm, self.audio_taps, self.audio_decim)
        b0, p1 = self.deemph_b0, self.deemph_p1
        nt = jax.lax.axis_size("time")
        idx_t = jax.lax.axis_index("time")

        # boundary x[k-1]: previous shard's last audio sample (ppermute);
        # shard 0 uses the carried last sample of the previous step
        prev_col = jax.lax.ppermute(
            audio[:, -1], "time", [(i, (i + 1) % nt) for i in range(nt)])
        prev_col = jnp.where(idx_t == 0, state_local[1], prev_col)
        u = b0 * (audio + jnp.concatenate(
            [prev_col[:, None], audio[:, :-1]], axis=1))
        a = jnp.full(u.shape, p1, jnp.float32)
        y0, last0 = jax.vmap(
            lambda aa, uu: linear_recurrence(aa, uu, jnp.float32(0.0)))(a, u)

        # exclusive prefix over per-shard affine maps (A, B): y_out = A*y_in + B
        T_l = audio.shape[1]
        A_total = jnp.full((audio.shape[0],), p1 ** T_l, jnp.float32)
        allA = jax.lax.all_gather(A_total, "time")          # (nt, C_l)
        allB = jax.lax.all_gather(last0, "time")
        all_xlast = jax.lax.all_gather(audio[:, -1], "time")

        def pref(carry, ab):
            Aj, Bj = ab
            return Aj * carry + Bj, carry  # emit each shard's INCOMING y

        carried, incoming = jax.lax.scan(pref, state_local[0], (allA, allB))
        y_in = incoming[idx_t]
        a_pow = p1 ** (1.0 + jnp.arange(T_l, dtype=jnp.float32))
        out = y0 + y_in[:, None] * a_pow[None, :]

        new_state = jnp.stack([carried, all_xlast[nt - 1]], axis=0)
        power = jax.lax.psum(jnp.sum(out ** 2), ("time", "chan"))
        return out, new_state, power

    def step_fn(self):
        @functools.partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(P("chan", "time"), P(None, "chan")),
            out_specs=(P("chan", "time"), P(None, "chan"), P()),
            check_vma=False,
        )
        def step(iq, deemph):
            return self._local_step(iq, deemph)

        return step

    def jitted(self):
        return jax.jit(self.step_fn())

    def example_inputs(self, t_per_shard: int = 1024, key=None):
        nt = self.n_time
        t_total = nt * t_per_shard
        if key is None:
            key = jax.random.PRNGKey(0)
        r = jax.random.normal(key, (self.nchannels, t_total, 2), jnp.float32)
        iq = (r[..., 0] + 1j * r[..., 1]).astype(jnp.complex64)
        return iq, self.init_state()
