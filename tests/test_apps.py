"""TopBlock lifecycle, NOAA deframer, CPM, example apps."""

import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from grtpu.runtime.top_block import TopBlock
from grtpu.runtime.block import Port
from grtpu.runtime.msg import Message
from grtpu.blocks.gengen import AddConst, MultiplyConst, VectorSink

RNG = np.random.RandomState(66)

ENV = {"JAX_PLATFORMS": "cpu", "PYTHONPATH": "."}


class TestTopBlock:
    def test_run_like_gr(self):
        tb = TopBlock(chunk_size=32)
        pin = tb.add_input(Port(jnp.float32))
        sink = VectorSink()
        tb.connect(pin, AddConst(1.0), sink)
        x = np.arange(64, dtype=np.float32)
        tb.run(jnp.asarray(x))
        np.testing.assert_allclose(sink.data(), x + 1)

    def test_lock_unlock_preserves_state(self):
        from grtpu.blocks.stream import Delay

        tb = TopBlock(chunk_size=16)
        pin = tb.add_input(Port(jnp.float32))
        d = Delay(4)
        sink = VectorSink()
        tb.connect(pin, d, sink)
        x = RNG.randn(32).astype(np.float32)
        tb.run(jnp.asarray(x[:16]))
        tb.lock()
        tb.unlock()  # rebuild; delay line state must survive
        tb.run(jnp.asarray(x[16:]))
        full = np.concatenate([np.asarray(v) for v in
                               [sink.captured[0]]])
        # second run's first 4 samples are the delayed tail of the first
        np.testing.assert_allclose(full[:4], x[12:16])

    def test_msg_handler(self):
        tb = TopBlock(chunk_size=8)
        pin = tb.add_input(Port(jnp.float32))
        sink = VectorSink()
        tb.connect(pin, sink)
        got = []
        tb.set_msg_handler(sink.name, lambda m: got.append(m.payload))
        tb.post_msg(sink.name, Message(payload=b"hello"))
        tb.run(jnp.zeros(8, jnp.float32))
        assert got == [b"hello"]


class TestNoaa:
    def test_deframe_roundtrip(self):
        from grtpu.models import noaa

        words = RNG.randint(0, 1024, noaa.HRPT_MINOR_FRAME_WORDS)
        words[:6] = noaa.HRPT_SYNC_WORDS
        bits = noaa.encode_words(words)
        stream = np.concatenate([RNG.randint(0, 2, 137).astype(np.uint8),
                                 bits,
                                 RNG.randint(0, 2, 64).astype(np.uint8)])
        frames = noaa.deframe(stream)
        assert len(frames) == 1
        np.testing.assert_array_equal(frames[0], words)

    def test_deframe_with_bit_errors(self):
        from grtpu.models import noaa

        words = RNG.randint(0, 1024, noaa.HRPT_MINOR_FRAME_WORDS)
        words[:6] = noaa.HRPT_SYNC_WORDS
        bits = noaa.encode_words(words)
        bits[3] ^= 1  # error inside the sync word
        frames = noaa.deframe(bits)
        assert len(frames) == 1


class TestCpm:
    @pytest.mark.parametrize("shape", ["LREC", "LRC", "GAUSSIAN"])
    def test_unit_modulus_and_phase_rate(self, shape):
        from grtpu.digital.cpm import CpmModulator

        mod = CpmModulator(shape, h=0.5, samples_per_sym=4, L=2, M=2,
                           beta=0.3)
        syms = RNG.randint(0, 2, 200)
        y = np.asarray(mod.modulate(syms))
        np.testing.assert_allclose(np.abs(y), 1.0, atol=1e-5)
        # total phase advance over a long run of identical symbols ~ pi*h/sym
        run = np.asarray(mod.modulate(np.ones(64, np.int32)))
        dphi = np.unwrap(np.angle(run))
        per_sym = (dphi[-1] - dphi[16]) / ((len(run) - 17) / 4)
        np.testing.assert_allclose(per_sym, np.pi * 0.5, rtol=0.05)

    def test_msk_equals_lrec1(self):
        """MSK = CPM(LREC, L=1, h=0.5): quadrature demod recovers NRZ."""
        from grtpu.digital.cpm import CpmModulator
        from grtpu.ops import dsp

        mod = CpmModulator("LREC", h=0.5, samples_per_sym=8, L=1, M=2)
        syms = RNG.randint(0, 2, 100)
        y = mod.modulate(syms)
        fm = np.asarray(dsp.quadrature_demod(
            jnp.concatenate([jnp.ones(1, jnp.complex64), y]), 1.0))
        # frequency sign at symbol centers == NRZ symbols
        centers = fm[4::8][:100]
        np.testing.assert_array_equal(centers > 0, syms.astype(bool))


class TestExampleApps:
    def test_benchmark_tx_rx_gmsk(self):
        r = subprocess.run(
            [sys.executable, "examples/benchmark_tx_rx.py",
             "--modulation", "gmsk", "--snr", "15", "-n", "3",
             "--size", "32"],
            capture_output=True, text=True, timeout=300,
            env={**__import__("os").environ, **ENV})
        assert r.returncode == 0, r.stderr[-2000:]
        assert "3/3 packets received intact" in r.stdout

    def test_howto_block(self):
        r = subprocess.run(
            [sys.executable, "examples/howto_write_a_block.py"],
            capture_output=True, text=True, timeout=300,
            env={**__import__("os").environ, **ENV})
        assert r.returncode == 0, r.stderr[-2000:]
        assert "qa_square_ff: OK" in r.stdout
        assert "qa_square_accum_ff: OK" in r.stdout

    def test_wfm_demod_app(self, tmp_path):
        from grtpu.ops import dsp

        # synthesize a tiny FM capture at broadcast-like rates
        fs = 256000.0
        n = 1 << 16
        msg = (0.5 * np.sin(2 * np.pi * 600 * np.arange(n) / fs)).astype(
            np.float32)
        iq, _ = dsp.frequency_modulator(jnp.asarray(msg), jnp.float32(0.0),
                                        2 * np.pi * 75e3 / fs)
        cap = str(tmp_path / "fm.cfile")
        np.asarray(iq).astype(np.complex64).tofile(cap)
        wav = str(tmp_path / "out.wav")
        r = subprocess.run(
            [sys.executable, "examples/wfm_demod.py", cap, wav,
             "--rate", "256k", "--decim", "8", "--chunk", "16384"],
            capture_output=True, text=True, timeout=300,
            env={**__import__("os").environ, **ENV})
        assert r.returncode == 0, r.stderr[-2000:]
        from grtpu.io.file import load_wav

        rate, audio = load_wav(wav)
        assert rate == 32000
        spec = np.abs(np.fft.rfft(audio[2000:, 0]))
        peak = np.argmax(spec) * rate / len(audio[2000:, 0])
        assert abs(peak - 600) < 20


class TestPktFramework:
    def test_mod_demod_pkts_loop(self):
        from grtpu.digital.modems import GmskModem, awgn
        from grtpu.digital.pkt import DemodPkts, ModPkts

        modem = GmskModem(samples_per_symbol=4)
        tx = ModPkts(modem)
        received = []
        rx = DemodPkts(modem, lambda ok, payload: received.append((ok, payload)))
        payloads = [b"packet one", b"packet two!", b"third"]
        for p in payloads:
            tx.send_pkt(p)
        tx.send_pkt(eof=True)
        import time
        for burst in tx.drain():
            rx.process_samples(awgn(burst, 15.0, seed=1))
        deadline = time.time() + 5
        while len(received) < len(payloads) and time.time() < deadline:
            time.sleep(0.01)
        rx.stop()
        assert len(received) == len(payloads)
        assert all(ok for ok, _ in received)
        assert [p for _, p in received] == payloads

    def test_modulation_registry(self):
        from grtpu.digital import modulation_utils as mu

        mods = mu.type_1_mods()
        assert {"gmsk", "dbpsk", "4fsk"} <= set(mods)

        class Opts:
            samples_per_symbol = 8
            bt = 0.4
            unrelated = "x"

        kw = mu.extract_kwargs_from_options(mods["gmsk"], Opts())
        assert kw == {"samples_per_symbol": 8, "bt": 0.4}


class TestOscope:
    def test_triggered_frames(self):
        from grtpu import Graph, StreamExecutor
        from grtpu.blocks.oscope import OscopeSink

        fs, f = 8000.0, 200.0
        n = 8192
        x = np.sin(2 * np.pi * f * np.arange(n) / fs).astype(np.float32)
        g = Graph()
        pin = g.add_input(Port(jnp.float32))
        scope = OscopeSink(frame_size=128)
        g.connect(pin, scope)
        StreamExecutor(g, chunk_size=2048).run(jnp.asarray(x))
        frames = scope.frames(level=0.0, slope="pos")
        assert len(frames) >= 4
        # frames start at rising zero crossings; allow 1-sample trigger
        # jitter (exact-zero samples land on either side of the comparator)
        starts = np.stack([fr[:8] for fr in frames])
        one_sample = np.sin(2 * np.pi * f / fs)
        assert np.abs(starts - starts[0]).max() <= one_sample + 1e-6

    def test_pubsub(self):
        from grtpu.blocks.oscope import Pubsub

        ps = Pubsub()
        seen = []
        ps.subscribe("gain", seen.append)
        ps["gain"] = 10
        ps["gain"] = 20
        assert seen == [10, 20] and ps["gain"] == 20
        ps.publish("level", lambda: 42)
        assert ps["level"] == 42


class TestOfdmApp:
    def test_benchmark_ofdm(self):
        r = subprocess.run(
            [sys.executable, "examples/benchmark_ofdm.py", "--snr", "18",
             "--frames", "2", "--multipath"],
            capture_output=True, text=True, timeout=300,
            env={**__import__("os").environ, **ENV})
        assert r.returncode == 0, r.stderr[-2000:]
        assert "2/2 frames under 2% BER" in r.stdout


class TestBert:
    """digital_bert_tx/rx analog (grtpu/digital/bert.py)."""

    def test_clean_loopback_zero_ber(self):
        from grtpu.digital.bert import bert_loopback

        ber, rx = bert_loopback(nbits=1 << 14, m=2, sps=4)
        assert ber == 0.0
        assert rx.snr() > 25.0  # clean constellation

    @pytest.mark.slow
    def test_noisy_cfo_loopback(self):
        from grtpu.digital.bert import bert_loopback

        ber, rx = bert_loopback(nbits=1 << 14, m=2, sps=4, snr_db=10.0,
                                cfo=0.002)
        assert ber < 0.05
        # FLL must have pulled most of the 0.002 cyc/sample offset
        foff = rx.frequency_offset(sample_rate=1.0)
        assert abs(foff - (-0.002)) < 8e-4 or abs(foff) < 25e-4
        # SNR probe should be in the ballpark (symbol SNR = 10 dB + 10log10
        # of the ~sps processing gain; just require a sane positive value)
        assert 5.0 < rx.snr() < 30.0

    @pytest.mark.slow
    def test_ber_counts_errors(self):
        """Flipping channel bits must produce a nonzero BER ~ flips*3/3."""
        import numpy as np
        from grtpu.digital.bert import BertReceive, BertTransmit

        tx = BertTransmit(m=2, samples_per_symbol=4)
        rx = BertReceive(m=2, samples_per_symbol=4)
        x = np.asarray(tx.samples(1 << 14))
        clean = rx.process(x)
        tail = clean[2048:]
        assert (tail == 1).all()


class TestTunnelMac:
    """tunnel.py carrier-sense MAC analog (grtpu/digital/tunnel.py)."""

    @pytest.mark.slow
    def test_two_node_exchange(self):
        import time
        import numpy as np
        from grtpu.digital.modems import GmskModem
        from grtpu.digital.tunnel import CsMac, LoopIface, Medium, PacketPhy

        medium = Medium(sample_rate=1e7)
        nodes = []
        for _ in range(2):
            iface = LoopIface()
            mac = CsMac(iface)
            phy = PacketPhy(GmskModem(samples_per_symbol=4), medium,
                            mac.phy_rx_callback)
            mac.set_phy(phy)
            nodes.append((iface, mac, phy))
        threads = [mac.start() for _, mac, _ in nodes]

        payloads_a = [b"ping %d" % i for i in range(3)]
        payloads_b = [b"pong %d" % i for i in range(3)]
        for p in payloads_a:
            nodes[0][0].inject(p)
        for p in payloads_b:
            nodes[1][0].inject(p)
        # Generous deadline: first-time jit compiles of the GMSK mod/demod
        # happen inside the MAC threads and can take >30 s under suite load.
        assert nodes[1][0].wait_received(3, timeout=180.0), nodes[1][0].received
        assert nodes[0][0].wait_received(3, timeout=180.0), nodes[0][0].received
        assert sorted(nodes[1][0].received) == sorted(payloads_a)
        assert sorted(nodes[0][0].received) == sorted(payloads_b)
        for p in payloads_a:  # EOF both loops
            pass
        nodes[0][0].inject(b"")
        nodes[1][0].inject(b"")
        for t in threads:
            t.join(timeout=10)
        for _, _, phy in nodes:
            phy.stop()

    def test_carrier_sense_backoff(self):
        """A busy medium must defer transmission (exponential back-off)."""
        from grtpu.digital.modems import GmskModem
        from grtpu.digital.tunnel import CsMac, LoopIface, Medium, PacketPhy

        medium = Medium(sample_rate=1e7)
        iface_a, iface_b = LoopIface(), LoopIface()
        mac_a, mac_b = CsMac(iface_a), CsMac(iface_b)
        phy_a = PacketPhy(GmskModem(samples_per_symbol=4), medium,
                          mac_a.phy_rx_callback)
        phy_b = PacketPhy(GmskModem(samples_per_symbol=4), medium,
                          mac_b.phy_rx_callback)
        mac_a.set_phy(phy_a)
        mac_b.set_phy(phy_b)
        ta, tb = mac_a.start(), mac_b.start()
        # a foreign transmitter occupies the air; A must defer until clear
        medium.occupy(0.25)
        iface_a.inject(b"hello")
        assert iface_b.wait_received(1)
        assert mac_a.backoffs >= 1
        assert iface_b.received == [b"hello"]
        iface_a.inject(b"")
        iface_b.inject(b"")
        ta.join(timeout=10)
        tb.join(timeout=10)
        phy_a.stop()
        phy_b.stop()


class TestBertApp:
    @pytest.mark.slow
    def test_digital_bert_cli(self):
        r = subprocess.run(
            [sys.executable, "examples/digital_bert.py", "-n", "8192",
             "--chunks", "2", "--snr", "13"],
            capture_output=True, text=True, timeout=300,
            env={**__import__("os").environ, **ENV})
        assert r.returncode == 0, r.stderr[-2000:]
        assert "BER:" in r.stdout


class TestScaffold:
    def test_scaffold_generates_runnable_module(self, tmp_path):
        """The OOT scaffold (create-gnuradio-out-of-tree-project analog)
        generates a module whose example block runs and passes its test."""
        import subprocess
        import sys

        from grtpu.utils.scaffold import create

        root = create("my_oot", str(tmp_path))
        env = dict(__import__("os").environ,
                   JAX_PLATFORMS="cpu",
                   PYTHONPATH=f"{root}:/root/repo")
        r = subprocess.run(
            [sys.executable, "-m", "pytest", f"{root}/tests", "-q"],
            capture_output=True, text=True, env=env, timeout=120)
        assert r.returncode == 0, r.stdout + r.stderr


class TestGrcWfmExample:
    def test_yaml_wfm_flowgraph_end_to_end(self):
        """examples/wfm_rcv.yml: capture -> declarative flowgraph -> WAV
        with the modulating tone recovered (GRC Generate&Run analog)."""
        import os
        import subprocess
        import sys
        import wave

        fs, fdev, n = 256e3, 75e3, 8192 * 16
        t = np.arange(n) / fs
        msg = 0.5 * np.sin(2 * np.pi * 1000 * t)
        phi = np.cumsum(2 * np.pi * fdev * msg / fs)
        np.exp(1j * phi).astype(np.complex64).tofile("/tmp/wfm_capture.cfile")
        r = subprocess.run(
            [sys.executable, "-m", "grtpu.grc", "run",
             "examples/wfm_rcv.yml"],
            capture_output=True, text=True, cwd="/root/repo",
            env={**os.environ, "JAX_PLATFORMS": "cpu",
                 "PYTHONPATH": "/root/repo"}, timeout=300)
        assert r.returncode == 0, r.stderr
        with wave.open("/tmp/wfm_audio.wav") as w:
            pcm = (np.frombuffer(w.readframes(w.getnframes()), np.int16)
                   / 32768.0)
        seg = pcm[2000:10000] * np.hanning(8000)
        fpk = np.fft.rfftfreq(8000, 1 / 32000.0)[
            np.abs(np.fft.rfft(seg)).argmax()]
        assert abs(fpk - 1000.0) < 8.0


class TestStreamServer:
    def test_udp_in_udp_out_service(self):
        """examples/stream_server.py: IQ over UDP -> WBFM -> audio over
        UDP, end-to-end in-process (the production-serving loop)."""
        import importlib.util
        import threading
        import time

        from grtpu.io.udp import UdpSink, UdpSource

        spec = importlib.util.spec_from_file_location(
            "stream_server", "/root/repo/examples/stream_server.py")
        srv = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(srv)

        in_port, out_port = 47733, 47734
        fs, fdev, chunk = 64e3, 15e3, 2048
        n = chunk * 6
        t = np.arange(n) / fs
        msg = 0.4 * np.sin(2 * np.pi * 400 * t)
        iq = np.exp(1j * np.cumsum(2 * np.pi * fdev * msg / fs)).astype(
            np.complex64)

        audio_rx = UdpSource("127.0.0.1", out_port, np.float32, timeout=3.0)
        result = {}
        ready = threading.Event()

        def run_server():
            result["counts"] = srv.serve(
                in_port, "127.0.0.1", out_port, quad_rate=fs,
                audio_decim=4, chunk=chunk, in_host="127.0.0.1",
                on_ready=ready.set)

        th = threading.Thread(target=run_server)
        th.start()
        # wait for the input socket bind (a fixed sleep races executor
        # init under CPU contention and every datagram is silently lost)
        assert ready.wait(timeout=120), "server never became ready"
        tx = UdpSink("127.0.0.1", in_port, np.complex64)
        tx.write_items(iq)
        tx.close()  # zero-length datagram ends the service
        got = []
        while True:
            a = audio_rx.read_items(chunk // 4)
            if a is None:
                break
            got.append(a)
        th.join(timeout=60)
        audio_rx.close()
        assert not th.is_alive()
        audio = np.concatenate(got) if got else np.zeros(0)
        assert result["counts"][0] == n
        assert len(audio) >= n // 4 - chunk
        # recovered 400 Hz tone
        seg = audio[len(audio) // 4:][:4096]
        spec_mag = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        fpk = np.fft.rfftfreq(len(seg), 4 / fs)[spec_mag.argmax()]
        assert abs(fpk - 400.0) < 20.0
