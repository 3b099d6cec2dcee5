"""Codec2: near-exact encode vs reference, spectral-equivalent decode.

The decoder's voiced-phase jitter and unvoiced phases are random in the
reference (rand()), so decoded waveforms can only be compared spectrally.
"""

import os

import numpy as np

from grtpu.vocoder.codec2 import (
    BITS_PER_FRAME,
    Codec2,
    Codec2Decode,
    Codec2Encode,
    _pack_frame,
    _unpack_frame,
)

GOLD = np.load(os.path.join(os.path.dirname(__file__),
                            "data", "vocoder_golden.npz"))


def test_encode_near_bit_exact():
    c2 = Codec2()
    bits = c2.encode(GOLD["input"])
    ref = GOLD["c2_bits"]
    # All quantiser decisions should match except occasional float-boundary
    # index flips (observed: > 95% of packed bytes identical).
    assert np.mean(bits == ref) > 0.90


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(3)
    widths = [7, 4, 4, 4, 4, 4, 4, 4, 3, 3, 2, 5, 1, 1]
    assert sum(widths) == BITS_PER_FRAME
    for _ in range(20):
        fields = [int(rng.integers(0, 2 ** w)) for w in widths]
        assert _unpack_frame(_pack_frame(fields)) == fields


def test_decode_reference_bits_spectral_match():
    dec = Codec2().decode(GOLD["c2_bits"]).astype(np.float64)
    ref = GOLD["c2_dec"].astype(np.float64)
    n = 256
    f1 = dec[: len(dec) // n * n].reshape(-1, n) * np.hanning(n)
    f2 = ref[: len(ref) // n * n].reshape(-1, n) * np.hanning(n)
    S1 = np.abs(np.fft.rfft(f1, axis=1))
    S2 = np.abs(np.fft.rfft(f2, axis=1))
    corr = (np.sum(S1 * S2, axis=1)
            / (np.sqrt(np.sum(S1 ** 2, 1) * np.sum(S2 ** 2, 1)) + 1e-12))
    assert corr.mean() > 0.9 and corr[3:].min() > 0.7
    assert 0.8 < np.std(dec) / np.std(ref) < 1.25


def test_roundtrip_preserves_spectrum_at_least_as_well_as_reference():
    x = GOLD["input"].astype(np.float64)
    c2 = Codec2()
    dec = c2.decode(c2.encode(GOLD["input"])).astype(np.float64)
    ref = GOLD["c2_dec"].astype(np.float64)
    n = 256

    def spec(v):
        f = v[: len(dec) // n * n].reshape(-1, n) * np.hanning(n)
        return np.abs(np.fft.rfft(f, axis=1))

    Sx = spec(x)

    def corr(S):
        return (np.sum(S * Sx, axis=1)
                / (np.sqrt(np.sum(S ** 2, 1) * np.sum(Sx ** 2, 1)) + 1e-12)
                ).mean()

    mine, refq = corr(spec(dec)), corr(spec(ref))
    # vocoder preserves envelope, not waveform; measured: 0.737 vs
    # the reference's own 0.717 on this synthetic signal
    assert mine > refq - 0.03, (mine, refq)


def test_blocks():
    import jax.numpy as jnp
    enc, dec = Codec2Encode(), Codec2Decode()
    x = jnp.asarray(GOLD["input"][:1600].astype(np.int16))
    _, frames = enc.apply(enc.init_state(), x)
    assert frames.shape == (10, 7)
    _, out = dec.apply(dec.init_state(), frames)
    assert out.shape == (1600,)
