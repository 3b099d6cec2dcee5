"""IO, FFT blocks, channel model, optfir, eng_notation tests."""

import threading

import numpy as np
import jax.numpy as jnp
import pytest

from grtpu import Graph, StreamExecutor
from grtpu.runtime.block import Port
from grtpu.runtime.msg import Message, MsgQueue
from grtpu.blocks.gengen import VectorSink
from grtpu.io.file import (FileSink, FileSource, load_capture, load_wav,
                           save_capture, save_wav)
from grtpu.io.msgio import MessageSource, MessageStreamSink
from grtpu.io.udp import UdpSink, UdpSource

RNG = np.random.RandomState(5)


class TestFileIO:
    def test_capture_roundtrip(self, tmp_path):
        p = str(tmp_path / "cap.cfile")
        x = (RNG.randn(1000) + 1j * RNG.randn(1000)).astype(np.complex64)
        save_capture(p, x)
        y = load_capture(p, np.complex64)
        np.testing.assert_array_equal(x, y)
        z = load_capture(p, np.complex64, offset_items=100, nitems=50)
        np.testing.assert_array_equal(x[100:150], z)

    def test_file_source_sink_graph(self, tmp_path):
        src_p = str(tmp_path / "in.cfile")
        dst_p = str(tmp_path / "out.cfile")
        x = (RNG.randn(256) + 1j * RNG.randn(256)).astype(np.complex64)
        save_capture(src_p, x)
        g = Graph()
        src = FileSource(src_p, jnp.complex64)
        snk = FileSink(dst_p, jnp.complex64)
        g.connect(src, snk)
        ex = StreamExecutor(g, chunk_size=64)
        ex.run(steps=4)
        snk.flush()
        y = load_capture(dst_p, np.complex64)
        np.testing.assert_array_equal(x, y)

    def test_wav_roundtrip(self, tmp_path):
        p = str(tmp_path / "a.wav")
        x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(8000) / 8000)).astype(
            np.float32)
        save_wav(p, 8000, x)
        rate, y = load_wav(p)
        assert rate == 8000
        np.testing.assert_allclose(y[:, 0], x, atol=1e-3)


class TestUdp:
    def test_loopback(self):
        """UDP source/sink loopback (the reference's network demos,
        gnuradio-examples/python/network)."""
        src = UdpSource("127.0.0.1", 0, np.complex64, timeout=2.0)
        port = src.sock.getsockname()[1]
        snk = UdpSink("127.0.0.1", port, np.complex64)
        x = (RNG.randn(2000) + 1j * RNG.randn(2000)).astype(np.complex64)
        t = threading.Thread(target=lambda: snk.write_items(x))
        t.start()
        got = src.read_items(2000)
        t.join()
        snk.close()
        src.close()
        assert got is not None
        np.testing.assert_array_equal(got, x)


class TestTcp:
    def test_loopback(self):
        """TCP server-source / client-sink loopback with exact item
        reassembly (blks2 tcp_source/tcp_sink semantics)."""
        from grtpu.io.tcp import TcpSink, TcpSource

        results = {}

        def serve():
            src = TcpSource("127.0.0.1", port, np.complex64, server=True,
                            timeout=5.0)
            results["got"] = src.read_items(3000)
            src.close()

        import socket as _socket
        probe = _socket.socket()
        probe.bind(("127.0.0.1", 0))
        port = probe.getsockname()[1]
        probe.close()
        t = threading.Thread(target=serve)
        t.start()
        x = (RNG.randn(3000) + 1j * RNG.randn(3000)).astype(np.complex64)
        deadline = 5.0
        import time as _time
        snk = None
        t0 = _time.monotonic()
        while snk is None and _time.monotonic() - t0 < deadline:
            try:
                snk = TcpSink("127.0.0.1", port, np.complex64, server=False)
            except OSError:
                _time.sleep(0.05)
        # stream in uneven pieces to exercise byte reassembly
        snk.write_items(x[:700])
        snk.write_items(x[700:1701])
        snk.write_items(x[1701:])
        snk.close()
        t.join(timeout=10.0)
        assert results["got"] is not None
        np.testing.assert_array_equal(results["got"], x)

    def test_eof_on_peer_close(self):
        from grtpu.io.tcp import TcpSink, TcpSource

        import socket as _socket
        probe = _socket.socket()
        probe.bind(("127.0.0.1", 0))
        port = probe.getsockname()[1]
        probe.close()
        results = {}

        def serve():
            src = TcpSource("127.0.0.1", port, np.float32, server=True,
                            timeout=5.0)
            results["short"] = src.read_items(100)  # only 10 arrive
            src.close()

        t = threading.Thread(target=serve)
        t.start()
        import time as _time
        snk = None
        t0 = _time.monotonic()
        while snk is None and _time.monotonic() - t0 < 5.0:
            try:
                snk = TcpSink("127.0.0.1", port, np.float32)
            except OSError:
                _time.sleep(0.05)
        snk.write_items(np.arange(10, dtype=np.float32))
        snk.close()
        t.join(timeout=10.0)
        assert results["short"] is None  # EOF before 100 items


class TestXmlrpc:
    def test_remote_variable_control(self):
        """xmlrpc_server/client blocks: remote set_* callbacks reach the
        wrapped instance (grc/blocks/xmlrpc_server.xml contract)."""
        from grtpu.io.xmlrpc_ctl import XmlrpcClient, XmlrpcServer

        class FakeTopBlock:
            def __init__(self):
                self.freq = 0.0
                self.started = False

            def set_freq(self, f):
                self.freq = f

            def get_freq(self):
                return self.freq

            def start(self):
                self.started = True

            def _private(self):  # must not be exported
                raise AssertionError

        tb = FakeTopBlock()
        srv = XmlrpcServer(tb, "127.0.0.1", 0)
        try:
            cli = XmlrpcClient("127.0.0.1", srv.port)
            cli.callback("set_freq", 5000.0)   # the GRC client pattern
            assert tb.freq == 5000.0
            assert cli.get_freq() == 5000.0    # plain proxy access
            cli.start()
            assert tb.started
            import xmlrpc.client
            with pytest.raises(xmlrpc.client.Fault):
                cli.callback("_private")
        finally:
            srv.stop()

    def test_registry_factories(self):
        from grtpu.grc.registry import BLOCK_REGISTRY, UNSUPPORTED_KEYS
        assert not UNSUPPORTED_KEYS
        for k in ("blks2_tcp_source", "blks2_tcp_sink",
                  "xmlrpc_server", "xmlrpc_client"):
            assert k in BLOCK_REGISTRY
        # xmlrpc factories construct without sockets needing a peer
        deferred = BLOCK_REGISTRY["xmlrpc_server"](addr="127.0.0.1",
                                                   port=18080)
        assert hasattr(deferred, "register")
        cli = BLOCK_REGISTRY["xmlrpc_client"](addr="127.0.0.1", port=18080)
        assert hasattr(cli, "callback")


class TestMsgIO:
    def test_message_source_fill(self):
        q = MsgQueue()
        ms = MessageSource(np.uint8, q)
        q.insert_tail(Message(payload=bytes(range(10))))
        q.insert_tail(Message(payload=bytes(range(10, 20))))
        a = ms.fill(15)
        np.testing.assert_array_equal(a, np.arange(15, dtype=np.uint8))
        b = ms.fill(10)
        np.testing.assert_array_equal(b[:5], np.arange(15, 20, dtype=np.uint8))
        np.testing.assert_array_equal(b[5:], 0)

    def test_message_sink_framing(self):
        sink = MessageStreamSink(8, np.uint8)
        sink.push(np.arange(20, dtype=np.uint8))
        msgs = []
        while not sink.msgq.empty_p():
            msgs.append(sink.msgq.delete_head_nowait())
        assert len(msgs) == 2
        np.testing.assert_array_equal(
            np.frombuffer(msgs[0].to_string(), np.uint8), np.arange(8))


class TestFftBlocks:
    def test_fft_vcc_tone(self):
        from grtpu.blocks.fftblk import FftVcc
        from grtpu.blocks.stream import StreamToVector

        n_fft = 64
        f_bin = 5
        x = np.exp(2j * np.pi * f_bin / n_fft * np.arange(256)).astype(
            np.complex64)
        g = Graph()
        pin = g.add_input(Port(jnp.complex64))
        sink = VectorSink(jnp.complex64, vlen=n_fft)
        g.connect(pin, StreamToVector(jnp.complex64, n_fft),
                  FftVcc(n_fft), sink)
        ex = StreamExecutor(g, chunk_size=128)
        ex.run(jnp.asarray(x))
        spec = sink.data()
        assert spec.shape == (4, n_fft)
        assert np.argmax(np.abs(spec[0])) == f_bin

    def test_logpwrfft(self):
        from grtpu.blocks.fftblk import LogPwrFft

        fs, n_fft = 32000.0, 128
        f = 4000.0
        x = np.exp(2j * np.pi * f / fs * np.arange(4096)).astype(np.complex64)
        g = Graph()
        pin = g.add_input(Port(jnp.complex64))
        lp = LogPwrFft(fs, n_fft, frame_rate=fs / n_fft)  # keep every vector
        sink = VectorSink(jnp.float32, vlen=n_fft)
        g.connect(pin, lp, sink)
        ex = StreamExecutor(g, chunk_size=1024)
        ex.run(jnp.asarray(x))
        spec = sink.data()
        # shifted spectrum: bin index for +4kHz = n_fft/2 + f/fs*n_fft
        expect_bin = n_fft // 2 + int(f / fs * n_fft)
        assert np.argmax(spec[2]) == expect_bin


class TestChannelModel:
    def test_cfo_and_noise(self):
        from grtpu.models.channel import ChannelModel

        cfo = 0.01
        ch = ChannelModel(noise_voltage=0.01, frequency_offset=cfo)
        g = Graph()
        pin = g.add_input(Port(jnp.complex64))
        sink = VectorSink(jnp.complex64)
        g.connect(pin, ch, sink)
        ex = StreamExecutor(g, chunk_size=512)
        x = np.ones(2048, np.complex64)
        ex.run(jnp.asarray(x))
        y = sink.data()
        dphi = np.angle(y[1:] * np.conj(y[:-1])).mean() / (2 * np.pi)
        assert abs(dphi - cfo) < 1e-3
        noise_est = np.abs(np.abs(y) - 1.0).std()
        assert 0.001 < noise_est < 0.05

    def test_multipath(self):
        from grtpu.models.channel import ChannelModel

        taps = np.array([1.0, 0.0, 0.4 + 0.2j], np.complex64)
        ch = ChannelModel(taps=taps)
        g = Graph()
        pin = g.add_input(Port(jnp.complex64))
        sink = VectorSink(jnp.complex64)
        g.connect(pin, ch, sink)
        ex = StreamExecutor(g, chunk_size=256)
        x = np.zeros(512, np.complex64)
        x[10] = 1.0  # impulse
        ex.run(jnp.asarray(x))
        y = sink.data()
        np.testing.assert_allclose(y[10], 1.0, atol=1e-5)
        np.testing.assert_allclose(y[12], 0.4 + 0.2j, atol=1e-5)


class TestUtils:
    def test_eng_notation(self):
        from grtpu.utils.eng_notation import num_to_str, str_to_num

        assert num_to_str(2.5e6) == "2.5M"
        assert str_to_num("100k") == 100e3
        assert str_to_num("10u") == pytest.approx(10e-6)
        assert str_to_num("42") == 42.0

    def test_optfir_low_pass(self):
        import scipy.signal as sig
        from grtpu.utils.optfir import low_pass

        taps = low_pass(1.0, 48000, 8000, 10000, 0.5, 60)
        w, h = sig.freqz(taps, fs=48000)
        mag = np.abs(h)
        assert abs(mag[w < 7000].mean() - 1.0) < 0.06
        assert 20 * np.log10(mag[w > 10500].max()) < -55

    def test_optfir_band_pass(self):
        import scipy.signal as sig
        from grtpu.utils.optfir import band_pass

        taps = band_pass(1.0, 48000, 4000, 6000, 10000, 12000, 0.5, 50)
        w, h = sig.freqz(taps, fs=48000)
        mag = np.abs(h)
        assert mag[(w > 6500) & (w < 9500)].min() > 0.9
        assert mag[w < 3500].max() < 0.01 * 4


class TestNativeRing:
    def test_ring_roundtrip(self):
        from grtpu.io.native import RingBuffer, available

        if not available():
            pytest.skip("no native compiler")
        rb = RingBuffer(1 << 16)
        data = bytes(RNG.randint(0, 256, 100000).astype(np.uint8))
        written = 0
        out = bytearray()
        while written < len(data) or rb.readable:
            if written < len(data):
                written += rb.write(data[written:written + 8192])
            out.extend(rb.read(4096))
        assert bytes(out) == data

    def test_wraparound_linearity(self):
        """The double-map property: reads crossing the physical end are
        contiguous (the whole point of the vmcircbuf trick)."""
        from grtpu.io.native import RingBuffer, available

        if not available():
            pytest.skip("no native compiler")
        rb = RingBuffer(4096)
        cap = rb.capacity
        # advance pointers near the end, then write across the boundary
        rb.write(b"x" * (cap - 100))
        rb.read(cap - 100)
        payload = bytes(range(200))
        rb.write(payload)
        assert rb.read(200) == payload

    def test_file_pump(self, tmp_path):
        from grtpu.io.native import FilePump, RingBuffer, available

        if not available():
            pytest.skip("no native compiler")
        import time
        path = str(tmp_path / "cap.bin")
        x = (RNG.randn(65536) + 1j * RNG.randn(65536)).astype(np.complex64)
        x.tofile(path)
        rb = RingBuffer(1 << 20)
        pump = FilePump(rb, path)
        got = []
        deadline = time.time() + 10
        while time.time() < deadline:
            arr = rb.read_items(8192, np.complex64)
            if arr is not None:
                got.append(arr)
            elif rb.eof and rb.readable < 8192 * 8:
                break
            else:
                time.sleep(0.001)
        pump.stop()
        full = np.concatenate(got)
        np.testing.assert_array_equal(full, x[: len(full)])
        assert len(full) == 65536


class TestNativeLoader:
    """The C++ data-loader (loader.cc): UDP pumps, write-behind sink,
    fused format-converting ring reads."""

    def _need(self):
        from grtpu.io import native

        if not native.available():
            pytest.skip("no native compiler")
        return native

    def test_native_file_source_raw(self, tmp_path):
        native = self._need()
        path = str(tmp_path / "cap.f32")
        x = RNG.randn(40000).astype(np.float32)
        x.tofile(path)
        src = native.NativeFileSource(path, np.float32)
        got = list(src.chunks(4096))
        src.close()
        full = np.concatenate(got)
        np.testing.assert_array_equal(full[:40000], x)
        # final chunk zero-padded to the fixed size
        assert len(full) % 4096 == 0
        assert np.all(full[40000:] == 0)

    def test_native_file_source_i16(self, tmp_path):
        native = self._need()
        path = str(tmp_path / "cap.i16")
        x = RNG.randint(-32768, 32768, 10000).astype(np.int16)
        x.tofile(path)
        src = native.NativeFileSource(path, wire="i16", scale=1.0 / 32768)
        full = np.concatenate(list(src.chunks(2500)))
        src.close()
        np.testing.assert_allclose(full, x / 32768.0, atol=1e-7)

    def test_native_file_source_sc16_planar(self, tmp_path):
        native = self._need()
        path = str(tmp_path / "cap.sc16")
        iq = RNG.randint(-32768, 32768, 8192).astype(np.int16)
        iq.tofile(path)
        src = native.NativeFileSource(path, wire="sc16", scale=1.0)
        re, im = next(src.chunks(4096))
        src.close()
        np.testing.assert_array_equal(re, iq[0::2].astype(np.float32))
        np.testing.assert_array_equal(im, iq[1::2].astype(np.float32))

    def test_u8_conversion(self, tmp_path):
        native = self._need()
        path = str(tmp_path / "cap.u8")
        x = RNG.randint(0, 256, 5000).astype(np.uint8)
        x.tofile(path)
        src = native.NativeFileSource(path, wire="u8", scale=1 / 128.0,
                                      offset=-127.0)
        full = np.concatenate(list(src.chunks(1000)))
        src.close()
        np.testing.assert_allclose(
            full, (x.astype(np.float32) - 127.0) / 128.0, atol=1e-7)

    def test_f32_to_i16(self):
        native = self._need()
        x = np.array([0.0, 0.5, -0.5, 1.5, -1.5, 1 / 32767.0], np.float32)
        y = native.f32_to_i16(x, scale=32767.0)
        np.testing.assert_array_equal(
            y, [0, 16384, -16384, 32767, -32768, 1])

    def test_write_pump(self, tmp_path):
        native = self._need()
        path = str(tmp_path / "out.bin")
        rb = native.RingBuffer(1 << 16)
        wp = native.WritePump(rb, path)
        x = RNG.randn(100000).astype(np.float32)
        wp.write(x)
        wp.close()
        np.testing.assert_array_equal(np.fromfile(path, np.float32), x)

    def test_native_udp_source_chunks(self):
        import time

        native = self._need()
        from grtpu.io.udp import UdpSink, native_udp_source

        port = 47655
        src = native_udp_source("127.0.0.1", port, np.complex64)
        snk = UdpSink("127.0.0.1", port, np.complex64)
        x = (RNG.randn(8192) + 1j * RNG.randn(8192)).astype(np.complex64)
        snk.write_items(x)
        snk.close()
        time.sleep(0.05)
        got = np.concatenate(list(src.chunks(2048)))
        src.close()
        np.testing.assert_array_equal(got, x)

    def test_udp_pump_loopback(self):
        """Native UDP sender -> native UDP receiver pump, EOF convention."""
        import time

        native = self._need()
        rb = native.RingBuffer(1 << 20)
        port = 47653
        pump = native.UdpPump(rb, "127.0.0.1", port)
        snd = native.UdpSender("127.0.0.1", port)
        x = RNG.randn(30000).astype(np.float32)
        snd.send(x)
        snd.close()  # sends zero-length EOF datagram
        deadline = time.time() + 10
        while time.time() < deadline and rb.readable < x.nbytes:
            time.sleep(0.002)
        got = rb.read_items(30000, np.float32)
        pump.stop()
        assert got is not None
        np.testing.assert_array_equal(got, x)
        assert rb.eof


class TestGrcCompiler:
    def _spec(self):
        from grtpu.grc import FlowgraphSpec

        return FlowgraphSpec.from_dict({
            "options": {"chunk_size": 1024},
            "blocks": [
                {"id": "src", "key": "gr_sig_source_x",
                 "params": {"sampling_freq": 8000.0, "waveform": "cos",
                            "frequency": 1000.0}},
                {"id": "sq", "key": "gr_multiply_xx",
                 "params": {"dtype": "float32", "nin": 2}},
                {"id": "snk", "key": "gr_vector_sink_x",
                 "params": {"dtype": "float32"}},
            ],
            "connections": [["src", 0, "sq", 0], ["src", 0, "sq", 1],
                            ["sq", 0, "snk", 0]],
        })

    def test_build_and_run(self):
        spec = self._spec()
        g, byid = spec.build()
        ex = StreamExecutor(g, chunk_size=1024)
        ex.run(steps=2)
        y = byid["snk"].data()
        # cos^2 has mean 1/2
        assert abs(y.mean() - 0.5) < 0.01

    def test_generate_script_runs(self, tmp_path):
        from grtpu.grc import generate_script

        src = generate_script(self._spec())
        ns = {}
        exec(compile(src, "<fg>", "exec"), ns)
        ns["ex"].run(steps=2)
        y = ns["blocks"]["snk"].data()
        assert abs(y.mean() - 0.5) < 0.01

    def test_yaml_example(self):
        from grtpu.grc import load_flowgraph

        spec = load_flowgraph("examples/dial_tone.yml")
        g, byid = spec.build()
        ex = StreamExecutor(g, chunk_size=spec.options["chunk_size"])
        ex.run(steps=4)
        y = byid["out"].data()
        spec_f = np.abs(np.fft.rfft(y * np.hanning(len(y))))
        freqs = np.fft.rfftfreq(len(y), 1 / 32000.0)
        peaks = freqs[np.argsort(spec_f)[-6:]]
        assert any(abs(p - 350) < 20 for p in peaks)
        assert any(abs(p - 440) < 20 for p in peaks)


class TestUtilsExtra:
    def test_prefs_env_override(self, monkeypatch):
        from grtpu.utils.prefs import Prefs

        monkeypatch.setenv("GRTPU_RUNTIME_CHUNK_SIZE", "8192")
        p = Prefs(paths=[])
        assert p.get_long("runtime", "chunk_size", 1024) == 8192
        assert p.get_long("runtime", "missing", 7) == 7
        monkeypatch.setenv("GRTPU_RUNTIME_VERBOSE", "true")
        assert p.get_bool("runtime", "verbose") is True

    def test_pref_store_roundtrip(self, tmp_path, monkeypatch):
        import grtpu.utils.prefs as prefs_mod

        monkeypatch.setattr(prefs_mod, "_store_dir",
                            lambda: str(tmp_path))
        prefs_mod.set_pref("vmcircbuf_default_factory", "mmap")
        assert prefs_mod.get_pref("vmcircbuf_default_factory") == "mmap"
        assert prefs_mod.get_pref("nope", "dflt") == "dflt"

    def test_run_block_helper(self):
        from grtpu.blocks.gengen import MultiplyConst
        from grtpu.utils.testing import run_block

        y = run_block(MultiplyConst(3.0), np.arange(32, dtype=np.float32))
        np.testing.assert_allclose(y, np.arange(32) * 3.0)

    def test_plot_cli(self, tmp_path):
        from grtpu.utils import plot as plotmod

        x = (RNG.randn(4096) + 1j * RNG.randn(4096)).astype(np.complex64)
        p = str(tmp_path / "c.cfile")
        x.tofile(p)
        out = str(tmp_path / "psd.png")
        plotmod.main(["psd", p, "--rate", "1e6", "--out", out])
        import os
        assert os.path.getsize(out) > 5000


class TestStreamingIngest:
    def test_ring_to_executor_stream(self, tmp_path):
        """The full ingest story: capture file -> native ring (background
        pump thread) -> executor.stream() -> demodulated output."""
        from grtpu.io.native import FilePump, RingBuffer, available
        from grtpu.blocks.gengen import MultiplyConst

        if not available():
            pytest.skip("no native compiler")
        import time as _t

        path = str(tmp_path / "cap.f32")
        x = RNG.randn(32768).astype(np.float32)
        x.tofile(path)
        rb = RingBuffer(1 << 20)
        pump = FilePump(rb, path)

        g = Graph()
        pin = g.add_input(Port(jnp.float32))
        pout = g.add_output(Port(jnp.float32))
        g.connect(pin, MultiplyConst(2.0), pout)
        ex = StreamExecutor(g, chunk_size=4096)

        def chunks():
            deadline = _t.time() + 10
            while _t.time() < deadline:
                arr = rb.read_items(4096, np.float32)
                if arr is not None:
                    yield arr
                elif rb.eof and rb.readable < 4096 * 4:
                    return
                else:
                    _t.sleep(0.001)

        outs = [np.asarray(o) for o in ex.stream(chunks())]
        pump.stop()
        got = np.concatenate(outs)
        np.testing.assert_allclose(got, x[: len(got)] * 2.0, rtol=1e-6)
        assert len(got) == 32768


class TestFilterDesignCli:
    def test_lowpass_and_plot(self, tmp_path):
        from grtpu.utils import filter_design

        png = str(tmp_path / "lp.png")
        f32 = str(tmp_path / "taps.f32")
        filter_design.main(["lowpass", "--fs", "48000", "--cutoff", "8000",
                            "--transition", "2000", "--plot", png,
                            "--save", f32])
        import os
        assert os.path.getsize(png) > 5000
        taps = np.fromfile(f32, np.float32)
        assert len(taps) % 2 == 1 and abs(taps.sum() - 1.0) < 0.01


class TestImportAll:
    def test_every_module_imports(self):
        """Catch syntax/import regressions anywhere in the package."""
        import importlib
        import pkgutil

        import grtpu

        failures = []
        for mod in pkgutil.walk_packages(grtpu.__path__, "grtpu."):
            if mod.name.endswith("__main__") or "libgrtpu" in mod.name:
                continue  # CLI argv parsers / the raw ctypes .so
            try:
                importlib.import_module(mod.name)
            except Exception as e:  # noqa: BLE001
                failures.append((mod.name, repr(e)))
        assert not failures, failures


class TestTraceAux:
    """§5.1/5.2 aux subsystems: step tracing, block timing, invariants."""

    def _wfm_executor(self):
        import jax.numpy as jnp
        from grtpu import Graph, StreamExecutor
        from grtpu.runtime.block import Port
        from grtpu.models.fm import WfmRcv

        g = Graph()
        pin = g.add_input(Port(jnp.complex64))
        pout = g.add_output(Port(jnp.float32))
        g.connect(pin, WfmRcv(256e3, 8), pout)
        return StreamExecutor(g, chunk_size=2048, donate=False)

    def test_traced_executor_logs(self, tmp_path):
        import io
        import numpy as np
        import jax.numpy as jnp
        from grtpu.utils.trace import TracedExecutor

        ex = self._wfm_executor()
        buf = io.StringIO()
        tx = TracedExecutor(ex, file=buf)
        r = np.random.RandomState(0)
        iq = jnp.asarray((r.randn(2048) + 1j * r.randn(2048))
                         .astype(np.complex64))
        tx.step(iq)
        tx.step(iq)
        lines = buf.getvalue().strip().split("\n")
        assert len(lines) == 2
        assert lines[0].startswith("step=0 wall_ms=")
        assert "items=" in lines[1]

    def test_block_timings(self):
        from grtpu.utils.trace import block_timings

        ex = self._wfm_executor()
        t = block_timings(ex, iters=3)
        assert t, "no blocks timed"
        import math
        assert all(math.isnan(v) or v >= 0 for v in t.values()), t

    def test_validate_state_clean_and_nan(self):
        import jax
        import numpy as np
        import jax.numpy as jnp
        from grtpu.utils.trace import validate_state

        ex = self._wfm_executor()
        ref = jax.tree_util.tree_map(lambda a: a, ex.state)
        r = np.random.RandomState(0)
        iq = jnp.asarray((r.randn(2048) + 1j * r.randn(2048))
                         .astype(np.complex64))
        ex.step(iq)
        assert validate_state(ex, ref) == []
        # poison the first nonempty float leaf anywhere in the state
        done = [False]

        def poison(a):
            if (not done[0] and hasattr(a, "dtype")
                    and jnp.issubdtype(a.dtype, jnp.inexact)
                    and getattr(a, "size", 0)):
                done[0] = True
                return a * jnp.nan
            return a

        ex.state = jax.tree_util.tree_map(poison, ex.state)
        assert done[0], "no float leaf found to poison"
        probs = validate_state(ex)
        assert any("non-finite" in p for p in probs), probs

    def test_profile_smoke(self, tmp_path):
        import jax.numpy as jnp
        from grtpu.utils.trace import profile, high_res_timer_now

        assert high_res_timer_now() > 0
        with profile(str(tmp_path / "tb")):
            jnp.ones(8).sum().block_until_ready()
        assert any((tmp_path / "tb").rglob("*"))


class TestGrcRegistryCoverage:
    def test_every_reference_grc_key_accounted_for(self):
        """grc/blocks/*.xml parity: every one of the reference's 173 GRC
        block descriptions is registered, a structural element the
        flowgraph compiler handles, or explicitly declared unsupported."""
        import os
        from grtpu.grc.registry import (
            BLOCK_REGISTRY, STRUCTURAL_KEYS, UNSUPPORTED_KEYS)
        keys_file = os.path.join(os.path.dirname(__file__), "data",
                                 "grc_reference_keys.txt")
        with open(keys_file) as f:
            ref_keys = [ln.strip() for ln in f if ln.strip()]
        assert len(ref_keys) > 150
        missing = [k for k in ref_keys
                   if k not in BLOCK_REGISTRY
                   and k not in STRUCTURAL_KEYS
                   and k not in UNSUPPORTED_KEYS]
        assert not missing, f"unaccounted GRC keys: {missing}"
        # unsupported list stays short and justified
        assert len(UNSUPPORTED_KEYS) <= 6
        assert all(v for v in UNSUPPORTED_KEYS.values())

    def test_registered_factories_instantiate(self):
        """Spot-instantiate a representative sample through the registry."""
        import numpy as np
        import jax.numpy as jnp
        from grtpu.grc.registry import BLOCK_REGISTRY
        samples = {
            "gr_conjugate_cc": (),
            "gr_vco_f": (48000.0, 1.0),
            "gr_threshold_ff": (-0.5, 0.5),
            "gr_iqcomp_cc": (0.01,),
            "gr_simple_framer": (16,),
            "gr_simple_correlator": (16,),
            "gr_streams_to_vector": (jnp.float32, 4),
            "gr_vector_to_streams": (jnp.float32, 4),
            "gr_encode_ccsds_27_bb": (),
            "gr_decode_ccsds_27_fb": (),
            "blks2_error_rate": (),
            "blks2_selector": (jnp.float32, 2, 1, 0, 0),
            "blks2_valve": (jnp.float32, False),
            "low_pass_filter": (4, 1.0, 48000.0, 5000.0, 1000.0),
            "root_raised_cosine_filter": (1, 1.0, 8.0, 1.0, 0.35, 33),
            "gr_pfb_clock_sync": (4.0, 0.06, np.ones(32, np.float32), 8),
            "blks2_fm_demod_cf": (160e3, 4, 5000.0, 3000.0, 4500.0),
        }
        for key, args in samples.items():
            blk = BLOCK_REGISTRY[key](*args)
            assert blk is not None, key


class TestMigrationDoc:
    def test_every_registry_key_documented(self):
        """docs/MIGRATION.md's block table stays in sync with the GRC
        registry (the user-facing completeness contract)."""
        import os

        from grtpu.grc import registry

        path = os.path.join(os.path.dirname(__file__), "..", "docs",
                            "MIGRATION.md")
        doc = open(path).read()
        missing = [k for k in registry.BLOCK_REGISTRY if f"`{k}`" not in doc]
        assert not missing, f"undocumented registry keys: {missing[:10]}"
