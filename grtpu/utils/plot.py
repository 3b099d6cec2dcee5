"""Offline capture plotting CLIs — the gr-utils analogs.

Analog of gr-utils/src/python gr_plot_* family (SURVEY.md §2.8):
matplotlib viewers for raw binary captures (time, PSD, spectrogram,
constellation).  Headless-friendly: writes PNGs (the Agg backend) instead
of requiring a GUI.

CLI:  python -m grtpu.utils.plot <time|psd|spec|const> capture.cfile \
          [--dtype complex64] [--rate 1e6] [--out plot.png]
"""

from __future__ import annotations

import argparse

import numpy as np


def _load(path, dtype, start, count):
    dt = np.dtype(dtype)
    return np.fromfile(path, dtype=dt, count=count,
                       offset=start * dt.itemsize)


def plot_time(data, rate, out, title="time"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t = np.arange(len(data)) / rate
    fig, ax = plt.subplots(figsize=(10, 4))
    if np.iscomplexobj(data):
        ax.plot(t, data.real, label="I", lw=0.7)
        ax.plot(t, data.imag, label="Q", lw=0.7)
        ax.legend()
    else:
        ax.plot(t, data, lw=0.7)
    ax.set_xlabel("time [s]")
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    return out


def plot_psd(data, rate, out, nfft=4096, title="PSD"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 4))
    ax.psd(data, NFFT=min(nfft, len(data)), Fs=rate)
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    return out


def plot_spectrogram(data, rate, out, nfft=1024, title="spectrogram"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 5))
    ax.specgram(data, NFFT=nfft, Fs=rate, noverlap=nfft // 2)
    ax.set_xlabel("time [s]")
    ax.set_ylabel("freq [Hz]")
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    return out


def plot_constellation(data, out, title="constellation"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5, 5))
    ax.plot(np.real(data), np.imag(data), ".", ms=1.5, alpha=0.5)
    ax.set_xlabel("I")
    ax.set_ylabel("Q")
    ax.set_title(title)
    ax.set_aspect("equal")
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(prog="grtpu.utils.plot")
    ap.add_argument("kind", choices=["time", "psd", "spec", "const"])
    ap.add_argument("path")
    ap.add_argument("--dtype", default="complex64")
    ap.add_argument("--rate", type=float, default=1.0)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--count", type=int, default=1 << 20)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    data = _load(args.path, args.dtype, args.start, args.count)
    out = args.out or (args.path + f".{args.kind}.png")
    if args.kind == "time":
        plot_time(data, args.rate, out)
    elif args.kind == "psd":
        plot_psd(data, args.rate, out)
    elif args.kind == "spec":
        plot_spectrogram(data, args.rate, out)
    else:
        plot_constellation(data, out)
    print(out)


if __name__ == "__main__":
    main()
