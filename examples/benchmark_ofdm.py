"""OFDM loopback benchmark app — the ofdm/benchmark_tx+rx analog.

Analog of gr-digital/examples/ofdm/benchmark_{tx,rx}.py over the grtpu
OFDM stack, including the dmr fork's channel-estimate export
(digital_ofdm_frame_sink.cc:422-423 apurv++ outputs): each received frame
reports BER AND the per-subcarrier channel magnitudes.

Run: python examples/benchmark_ofdm.py --snr 18 --frames 4 --multipath
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from grtpu.digital.ofdm import OfdmModem  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snr", type=float, default=20.0)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--symbols", type=int, default=8, help="data symbols/frame")
    ap.add_argument("--cfo", type=float, default=0.002)
    ap.add_argument("--multipath", action="store_true")
    ap.add_argument("--fft", type=int, default=64)
    args = ap.parse_args()

    m = OfdmModem(fft_len=args.fft, occupied=48)
    rng = np.random.RandomState(0)
    h = (np.array([1.0, 0.0, 0.25 - 0.1j], np.complex64)
         if args.multipath else np.array([1.0], np.complex64))

    total = ok = 0
    for f in range(args.frames):
        bits = rng.randint(0, 2, args.symbols * 48 * 2).astype(np.uint8)
        tx = np.asarray(m.modulate(bits))
        sig = np.convolve(tx, h)[: len(tx)]
        sig = sig * np.exp(1j * args.cfo * np.arange(len(sig)))
        sig = np.concatenate([np.zeros(150, np.complex64), sig,
                              np.zeros(100, np.complex64)])
        p = (np.abs(tx) ** 2).mean()
        n0 = p / 10 ** (args.snr / 10)
        sig = sig + (rng.randn(len(sig)) + 1j * rng.randn(len(sig))) * \
            np.sqrt(n0 / 2)
        got, chan, cfo_est, d = m.demodulate(sig.astype(np.complex64),
                                             args.symbols)
        got = np.asarray(got)[: len(bits)]
        ber = (got != bits).mean()
        total += 1
        ok += ber < 0.02
        cm = np.abs(np.asarray(chan))
        print(f"frame {f}: sync@{int(d):4d} cfo_est={float(cfo_est):+.5f} "
              f"ber={ber:.4f}  |H| mean={cm.mean():.2f} "
              f"min={cm.min():.2f} max={cm.max():.2f}")
    print(f"\n{ok}/{total} frames under 2% BER "
          f"(SNR {args.snr} dB, CFO {args.cfo}, "
          f"{'multipath' if args.multipath else 'flat'} channel)")


if __name__ == "__main__":
    main()
