"""WBFM file demodulator app (the uhd_fft/gr_plot workflow's offline half):
IQ capture -> WfmRcv -> WAV.

Run: python examples/wfm_demod.py capture.cfile out.wav --rate 256e3 --decim 8
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402

from grtpu import Graph, StreamExecutor  # noqa: E402
from grtpu.runtime.block import Port  # noqa: E402
from grtpu.blocks.gengen import VectorSink  # noqa: E402
from grtpu.io.file import load_capture, save_wav  # noqa: E402
from grtpu.models.fm import WfmRcv  # noqa: E402
from grtpu.utils.eng_notation import str_to_num  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("capture")
    ap.add_argument("wav_out")
    ap.add_argument("--rate", default="256k", help="IQ sample rate")
    ap.add_argument("--decim", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=65536)
    args = ap.parse_args()

    rate = str_to_num(args.rate)
    iq = load_capture(args.capture, np.complex64)
    print(f"{len(iq)} samples @ {rate:g} Hz")

    g = Graph()
    pin = g.add_input(Port(jnp.complex64))
    sink = VectorSink(jnp.float32)
    g.connect(pin, WfmRcv(rate, args.decim), sink)
    ex = StreamExecutor(g, chunk_size=args.chunk)
    ex.run(jnp.asarray(iq))
    audio = sink.data()
    peak = np.abs(audio).max() or 1.0
    save_wav(args.wav_out, int(rate / args.decim), audio / peak * 0.9)
    print(f"wrote {args.wav_out}: {len(audio)} samples @ {rate/args.decim:g} Hz")


if __name__ == "__main__":
    main()
