"""Codec2: byte-exact encode, sample-level decode match vs the reference.

Encode reproduces the reference's float32 quantiser arithmetic exactly
(100% byte-identical bits).  Decode reproduces the reference's libc rand()
stream (glibc TYPE_3 generator, seed 1) and float32 phase/bin arithmetic,
matching the compiled reference's output samples to within float tolerance
(>= 50 dB; the residual is kiss_fft float32 rounding vs numpy float64).
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


def test_encode_byte_exact():
    c2 = Codec2()
    bits = c2.encode(GOLD["input"])
    ref = GOLD["c2_bits"]
    # float32 quantiser arithmetic mirrored exactly (incl. the pitch
    # refinement grid's float accumulation): every byte identical
    assert np.array_equal(np.asarray(bits, np.uint8),
                          np.asarray(ref, np.uint8))


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(3)
    widths = [7, 4, 4, 4, 4, 4, 4, 4, 3, 3, 2, 5, 1, 1]
    assert sum(widths) == BITS_PER_FRAME
    for _ in range(20):
        fields = [int(rng.integers(0, 2 ** w)) for w in widths]
        assert _unpack_frame(_pack_frame(fields)) == fields


def test_decode_reference_bits_sample_match():
    """Decode of the reference bitstream matches the compiled reference's
    output SAMPLES: the libc rand() stream (glibc TYPE_3, seed 1) is
    reproduced draw-for-draw and the float32 phase/bin arithmetic
    mirrored; the residual is FFT rounding (kiss_fft f32 vs numpy f64)."""
    dec = Codec2().decode(GOLD["c2_bits"]).astype(np.int64)
    ref = GOLD["c2_dec"].astype(np.int64)
    n = min(len(dec), len(ref))
    err = (dec[:n] - ref[:n]).astype(np.float64)
    snr = 10 * np.log10((ref[:n].astype(np.float64) ** 2).mean()
                        / max((err ** 2).mean(), 1e-12))
    assert snr > 50.0, snr
    assert np.abs(err).max() < 64
    assert (np.abs(err) <= 1).mean() > 0.6


def test_glibc_rand_stream():
    """The decoder's RNG is glibc's rand() exactly (first values of the
    seed-1 stream, verified against a compiled libc program)."""
    from grtpu.vocoder.codec2 import GlibcRand

    g = GlibcRand(1)
    assert [g() for _ in range(5)] == [
        1804289383, 846930886, 1681692777, 1714636915, 1957747793]


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
