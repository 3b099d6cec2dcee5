"""Time-block stream executor: the TPU-native scheduler replacement.

Reference machinery being replaced (not ported):
  * gr_scheduler_tpb / gr_tpb_thread_body — one OS thread per block blocking
    on buffer condvars (gr_scheduler_tpb.cc:53-78, gr_tpb_thread_body.cc:41-106).
  * gr_block_executor::run_one_iteration — per-block demand computation,
    forecast, general_work dispatch (gr_block_executor.cc:181-409).
  * gr_buffer / gr_vmcircbuf — double-mapped circular buffers with reader
    history preload (gr_buffer.cc:110-213, gr_flat_flowgraph.cc:124-152).

TPU-native design: the whole flattened DAG is traced once into a single
jitted ``step(state, ext_inputs) -> (state, outputs)`` over a fixed-size
*time-block* (chunk).  Pipeline parallelism between blocks becomes instruction
-level and fusion parallelism inside one XLA program; buffer handoff becomes
SSA values in VMEM/HBM; history preload becomes explicit carried tail state
(the halo).  Rates are propagated statically at compile time, replacing
``forecast()``: every edge's per-step item count is known before tracing.

The executor state — all block states plus all edge tails — is one pytree:
checkpointable (SURVEY.md §5.4 notes the reference has no checkpointing) and
shardable with jax.sharding for multi-chip execution (grtpu.parallel).
"""

from __future__ import annotations

import math
from fractions import Fraction
from typing import Any, Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from grtpu.runtime.block import Block, Port
from grtpu.runtime.graph import Edge, FlatGraph, Graph, Pad
from grtpu.runtime.tags import Tag, propagate_tags


def _edge_key(e: Edge) -> str:
    s = e.src.block
    sname = s.name if isinstance(s, (Block,)) else s.name
    return f"{sname}.{e.src.port}->{e.dst.block.name}.{e.dst.port}"


def _ingest(x):
    """Host input -> device, routing complex through the f32-plane path
    (complex64 H2D is unimplemented on some transports, see utils.xfer)."""
    if isinstance(x, jax.Array):
        return x
    from grtpu.utils import xfer

    return xfer.device_array(x)


class StreamExecutor:
    """Compile + run a flowgraph over fixed-size time-blocks.

    Args:
      graph: a :class:`Graph` (flattened automatically) or :class:`FlatGraph`.
      chunk_size: items produced per step by each root (input pad or source
        block).  Must be a multiple of every decimation chain; use
        :meth:`required_multiple` to query.
      root_chunks: optional per-root overrides ``{pad_or_block: n}``.
      donate: donate the state buffers to the jitted step (in-place update).
    """

    def __init__(
        self,
        graph: Graph | FlatGraph,
        chunk_size: int = 4096,
        root_chunks: Optional[Dict[Any, int]] = None,
        donate: bool = True,
        debug_taps: bool = False,
    ):
        self.flat = graph.flatten() if isinstance(graph, Graph) else graph
        self.chunk_size = int(chunk_size)
        self.order = self.flat.topological_order()
        self.debug_taps = debug_taps
        self.edge_data: Dict[str, Any] = {}
        self._compute_rates(root_chunks or {})
        self._init_state()
        self._build_step(donate and not debug_taps)
        # host-side stream-tag store per edge key, and absolute item counters
        self._tags: Dict[str, List[Tag]] = {k: [] for k in self._edge_keys}
        self.sink_tags: Dict[str, List[Tag]] = {}
        self.nitems = {b.name: 0 for b in self.order}  # items consumed so far

    # ------------------------------------------------------------------ rates
    def _compute_rates(self, root_chunks):
        """Static rate propagation, replacing gr_block::forecast().

        Every edge gets a per-step item count; every block gets its per-step
        input count n_in.  Mirrors the arithmetic of
        gr_flat_flowgraph.cc:89-122 (buffer sizing vs decimation) but exactly,
        at compile time.
        """
        self.edge_items: Dict[str, int] = {}
        self.block_nin: Dict[int, int] = {}
        pad_chunk = {}
        for pad in self.flat.in_pads:
            pad_chunk[id(pad)] = int(root_chunks.get(pad, self.chunk_size))

        for b in self.order:
            ups = self.flat.upstream_of(b)
            if not ups:  # source block
                n_in = int(root_chunks.get(b, self.chunk_size)) * b.decim // b.interp
            else:
                counts = set()
                for i, e in ups.items():
                    src = e.src.block
                    if isinstance(src, Pad):
                        counts.add(pad_chunk[id(src)])
                    else:
                        counts.add(self.edge_items[_edge_key(e)])
                if len(counts) != 1:
                    raise ValueError(
                        f"{b.name}: input ports receive unequal chunk sizes "
                        f"{sorted(counts)}; insert rate-matching blocks"
                    )
                n_in = counts.pop()
            if n_in % b.decim:
                raise ValueError(
                    f"{b.name}: per-step input {n_in} not divisible by "
                    f"decim={b.decim}; pick chunk_size a multiple of "
                    f"{self.required_multiple()}"
                )
            self.block_nin[b.uid] = n_in
            n_out = n_in // b.decim * b.interp
            for e in self.flat.downstream_of(b):
                self.edge_items[_edge_key(e)] = n_out

        # output pads
        self.out_pad_edges: List[Edge] = []
        for pad in self.flat.out_pads:
            feed = [e for e in self.flat.edges if e.dst.block is pad]
            if len(feed) != 1:
                raise ValueError(f"output pad {pad.name} must have exactly one driver")
            self.out_pad_edges.append(feed[0])

        self._edge_keys = [
            _edge_key(e) for e in self.flat.edges if isinstance(e.dst.block, Block)
        ]

    def required_multiple(self) -> int:
        """LCM of decimation requirements along all paths from the roots."""
        # For each block, chunk at the roots must make n_in divisible by decim.
        # Walk paths accumulating rate fractions.
        mult = 1
        rate_to: Dict[int, Fraction] = {}
        for b in self.order:
            ups = self.flat.upstream_of(b)
            if not ups:
                r = Fraction(1)
            else:
                rs = {
                    rate_to[e.src.block.uid]
                    if isinstance(e.src.block, Block)
                    else Fraction(1)
                    for e in ups.values()
                }
                r = rs.pop()
            # n_in = chunk * r must be divisible by decim: chunk multiple of
            # decim / gcd stuff — conservatively lcm over denominator*decim.
            need = (Fraction(b.decim) / r).limit_denominator()
            mult = math.lcm(mult, max(1, int(math.ceil(need))))
            rate_to[b.uid] = r * Fraction(b.interp, b.decim)
        return mult

    # ------------------------------------------------------------------ state
    def _init_state(self):
        def make():
            block_states = {str(b.uid): b.init_state() for b in self.order}
            tails = {}
            for b in self.order:
                if b.history > 1:
                    for i, e in self.flat.upstream_of(b).items():
                        port = b.in_ports[i]
                        tails[_edge_key(e)] = jnp.zeros(
                            port.chunk_shape(b.history - 1), port.dtype
                        )
            return {"blocks": block_states, "tails": tails}

        # built INSIDE one jit: eagerly-created complex/int zeros take the
        # host-constant transfer path, which some TPU transports (axon)
        # don't implement — jit-produced arrays stay device-native
        self.state = jax.jit(make)()

    # ------------------------------------------------------------------ step
    def _build_step(self, donate: bool):
        flat = self.flat
        order = self.order
        in_pads = flat.in_pads
        out_pad_edges = self.out_pad_edges
        sinks = [b for b in order if not b.out_ports]

        def step(state, ext_inputs):
            block_states = dict(state["blocks"])
            tails = dict(state["tails"])
            edge_vals: Dict[str, Any] = {}

            def value_of(e: Edge):
                src = e.src.block
                if isinstance(src, Pad):
                    return ext_inputs[src.index]
                return edge_vals[_edge_key(e)]

            sink_caps = {}
            for b in order:
                ups = flat.upstream_of(b)
                ins = []
                for i in range(len(b.in_ports)):
                    e = ups[i]
                    v = value_of(e)
                    if b.history > 1:
                        k = _edge_key(e)
                        full = jnp.concatenate([tails[k], v], axis=0)
                        tails[k] = full[full.shape[0] - (b.history - 1):]
                        v = full
                    ins.append(v)
                if not b.in_ports:
                    # Source block: apply(state, n) with static item count.
                    n_out = self.block_nin[b.uid] // b.decim * b.interp
                    new_s, outs = self._apply_source(b, block_states[str(b.uid)], n_out)
                else:
                    new_s, outs = self._apply_block(b, block_states[str(b.uid)], ins)
                block_states[str(b.uid)] = new_s
                if not b.out_ports and ins:
                    sink_caps[b.name] = tuple(ins)
                for e in flat.downstream_of(b):
                    edge_vals.setdefault(_edge_key(e), None)
                for e in [e for e in flat.edges if e.src.block is b]:
                    edge_vals[_edge_key(e)] = outs[e.src.port]

            pad_outs = tuple(value_of(e) for e in out_pad_edges)
            new_state = {"blocks": block_states, "tails": tails}
            if self.debug_taps:
                # §5.1 debug-tap idiom (generic_mod_demod.py:155-169 log=True
                # wires a file sink at every stage): expose every edge value
                sink_caps = dict(sink_caps)
                sink_caps["__edges__"] = dict(edge_vals)
            return new_state, (pad_outs, sink_caps)

        self._step_fn = step
        self._jit_step = jax.jit(step, donate_argnums=(0,) if donate else ())
        self._sinks = sinks

    @staticmethod
    def _apply_source(b: Block, state, n: int):
        res = b.apply(state, n)
        new_s, outs = res
        if not isinstance(outs, (tuple, list)):
            outs = (outs,)
        return new_s, tuple(outs)

    @staticmethod
    def _apply_block(b: Block, state, ins):
        res = b.apply(state, *ins)
        new_s, outs = res
        if not isinstance(outs, (tuple, list)):
            outs = (outs,)
        if len(outs) != len(b.out_ports):
            raise ValueError(
                f"{b.name}: apply returned {len(outs)} outputs, "
                f"declared {len(b.out_ports)} ports"
            )
        return new_s, tuple(outs)

    # ------------------------------------------------------------------ run
    def step(self, *ext_inputs):
        """Run one time-block; returns (pad_outputs, sink_captures)."""
        ext_inputs = tuple(_ingest(x) for x in ext_inputs)
        for pad, x in zip(self.flat.in_pads, ext_inputs):
            want = self.chunk_size
            if x.shape[0] != want:
                raise ValueError(
                    f"input pad {pad.index}: expected {want} items, got {x.shape[0]}"
                )
        self.state, out = self._jit_step(self.state, ext_inputs)
        self._advance_tags()
        return out

    def run(self, *ext_inputs, steps: Optional[int] = None):
        """Feed full arrays, stream them through in chunks, return full outputs.

        The analog of ``tb.run()``: finite-input execution.  Trailing items
        that do not fill a whole chunk are zero-padded and the outputs
        truncated to the exact rational length.
        """
        n_pads = len(self.flat.in_pads)
        if len(ext_inputs) != n_pads:
            raise ValueError(f"graph has {n_pads} input pads, got {len(ext_inputs)}")

        if n_pads == 0:
            assert steps is not None, "source-driven graph needs steps="
            total = steps * self.chunk_size
            nchunks = steps
            chunks_iter = ({} for _ in range(steps))
            outs_accum = [[] for _ in self.flat.out_pads]
            sink_accum: Dict[str, List] = {}
            for _ in range(steps):
                pads, sinks = self.step()
                self._collect(pads, sinks, outs_accum, sink_accum)
            return self._finalize(outs_accum, sink_accum, None)

        xs = [_ingest(x) for x in ext_inputs]  # step() re-checks; cheap no-op
        n = xs[0].shape[0]
        cs = self.chunk_size
        nchunks = -(-n // cs)
        pad_to = nchunks * cs
        xs = [
            jnp.pad(x, [(0, pad_to - n)] + [(0, 0)] * (x.ndim - 1)) if pad_to != n else x
            for x in xs
        ]
        outs_accum = [[] for _ in self.flat.out_pads]
        sink_accum: Dict[str, List] = {}
        for c in range(nchunks):
            chunk = tuple(x[c * cs:(c + 1) * cs] for x in xs)
            pads, sinks = self.step(*chunk)
            self._collect(pads, sinks, outs_accum, sink_accum)
        return self._finalize(outs_accum, sink_accum, n)

    def stream(self, chunk_iter):
        """Generator-driven streaming: pull fixed-size chunks from an
        iterator (native ring buffer, UDP source, ...) and yield each
        step's pad outputs.  The analog of the reference's free-running
        scheduler fed by a hardware source, with backpressure implicit in
        the generator."""
        for chunk in chunk_iter:
            if not isinstance(chunk, (tuple, list)):
                chunk = (chunk,)
            pads, _ = self.step(*[_ingest(c) for c in chunk])
            yield pads if len(pads) != 1 else pads[0]

    def _collect(self, pads, sinks, outs_accum, sink_accum):
        for i, v in enumerate(pads):
            outs_accum[i].append(v)
        for name, vals in sinks.items():
            if name == "__edges__":
                for k, ev in vals.items():
                    self.edge_data.setdefault(k, []).append(ev)
                continue
            sink_accum.setdefault(name, []).append(vals)

    def _finalize(self, outs_accum, sink_accum, n_in):
        pad_outs = []
        for i, parts in enumerate(outs_accum):
            full = jnp.concatenate(parts, axis=0) if parts else None
            if n_in is not None and full is not None:
                # truncate to exact rational output length for this pad
                e = self.out_pad_edges[i]
                r = self._cumulative_rate(e)
                exact = int(n_in * r)
                full = full[:exact]
            pad_outs.append(full)
        byname_rate = {}
        if n_in is not None:
            for b in self.order:
                if not b.out_ports and b.in_ports:
                    ups = self.flat.upstream_of(b)
                    byname_rate[b.name] = self._cumulative_rate(ups[0])
        self.sink_data = {
            name: tuple(
                jnp.concatenate([v[j] for v in vals], axis=0)[
                    : (int(n_in * byname_rate[name])
                       if n_in is not None and name in byname_rate else None)
                ]
                for j in range(len(vals[0]))
            )
            for name, vals in sink_accum.items()
        }
        # Write captures back onto sink blocks for convenient access
        # (the analog of vector_sink_X::data()).
        byname = {b.name: b for b in self.order}
        for name, vals in self.sink_data.items():
            byname[name].captured = vals
        if len(pad_outs) == 1:
            return pad_outs[0]
        return tuple(pad_outs)

    def _cumulative_rate(self, edge: Edge) -> Fraction:
        """Total interp/decim product from roots to this edge's source."""
        rate: Dict[int, Fraction] = {}
        for b in self.order:
            ups = self.flat.upstream_of(b)
            if not ups:
                r = Fraction(1)
            else:
                anc = []
                for e in ups.values():
                    if isinstance(e.src.block, Block):
                        anc.append(rate[e.src.block.uid])
                    else:
                        anc.append(Fraction(1))
                r = anc[0]
            rate[b.uid] = r * Fraction(b.interp, b.decim)
        src = edge.src.block
        if isinstance(src, Pad):
            return Fraction(1)
        return rate[src.uid]

    # ------------------------------------------------------------------ tags
    def add_tags(self, pad_index: int, tags: Sequence[Tag]):
        """Attach stream tags to an input pad's stream (absolute offsets)."""
        for e in self.flat.edges:
            if isinstance(e.src.block, Pad) and e.src.block.index == pad_index:
                self._tags[_edge_key(e)].extend(tags)

    def _advance_tags(self):
        """Host-side per-chunk tag propagation (gr_block_executor.cc:91-156)."""
        for b in self.order:
            if b.tag_propagation == "dont":
                continue
            ups = self.flat.upstream_of(b)
            downs = self.flat.downstream_of(b)
            n_in = self.block_nin[b.uid]
            start = self.nitems[b.name]
            in_tags: List[Tag] = []
            for e in ups.values():
                k = _edge_key(e)
                if k in self._tags:
                    take = [t for t in self._tags[k] if t.offset < start + n_in]
                    self._tags[k] = [t for t in self._tags[k] if t.offset >= start + n_in]
                    in_tags.extend(take)
            out_tags = propagate_tags(in_tags, b.relative_rate)
            if not b.out_ports:
                # terminal blocks retain their received tags for the host
                # (the analog of reading gr_buffer tags at a sink)
                if in_tags:
                    self.sink_tags.setdefault(b.name, []).extend(in_tags)
                continue
            for e in downs:
                k = _edge_key(e)
                if k in self._tags:
                    self._tags[k].extend(out_tags)
        for b in self.order:
            self.nitems[b.name] += self.block_nin[b.uid]

    def dump_debug_taps(self, directory: str):
        """Write every edge's captured stream to <dir>/<edge>.dat (raw
        native items) — the log-every-stage debugging workflow."""
        import os

        os.makedirs(directory, exist_ok=True)
        paths = {}
        for k, parts in self.edge_data.items():
            arr = np.concatenate([np.asarray(p) for p in parts], axis=0)
            safe = k.replace("/", "_").replace(">", "").replace(".", "_")
            path = os.path.join(directory, safe + ".dat")
            arr.tofile(path)
            paths[k] = path
        return paths

    # ------------------------------------------------------------------ ckpt
    def save_checkpoint(self, path: str):
        """Persist full flowgraph state (all block states + halo tails)."""
        leaves, treedef = jax.tree_util.tree_flatten(self.state)
        np.savez(
            path,
            *[np.asarray(l) for l in leaves],
            treedef=np.frombuffer(repr(treedef).encode(), dtype=np.uint8),
        )

    def load_checkpoint(self, path: str):
        data = np.load(path, allow_pickle=False)
        leaves, treedef = jax.tree_util.tree_flatten(self.state)
        new_leaves = [jnp.asarray(data[f"arr_{i}"]) for i in range(len(leaves))]
        self.state = jax.tree_util.tree_unflatten(treedef, new_leaves)
