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
