"""GSM 06.10 full-rate: bit-exact vs golden vectors from the reference C."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from grtpu.vocoder import gsm

GOLD = np.load(os.path.join(os.path.dirname(__file__),
                            "data", "vocoder_golden.npz"))


def test_encode_bit_exact():
    x = jnp.asarray(GOLD["input"].astype(np.int16))
    _, frames = gsm.gsm_fr_encode(gsm.gsm_init_encode_state(), x)
    np.testing.assert_array_equal(np.asarray(frames).reshape(-1),
                                  GOLD["gsm_frames"])


def test_decode_bit_exact():
    frames = jnp.asarray(GOLD["gsm_frames"].reshape(-1, 33))
    _, pcm = gsm.gsm_fr_decode(gsm.gsm_init_decode_state(), frames)
    np.testing.assert_array_equal(np.asarray(pcm), GOLD["gsm_dec"])


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(7)
    widths = gsm._WIDTHS
    params = (rng.integers(0, 2 ** widths, size=(5, 76))).astype(np.int32)
    frames = gsm.gsm_pack(jnp.asarray(params))
    back = gsm.gsm_unpack(frames)
    np.testing.assert_array_equal(np.asarray(back), params)
    assert np.all((np.asarray(frames)[:, 0] >> 4) == 0xD)


def test_blocks_chunked_equals_whole():
    pcm = GOLD["input"][:160 * 20].astype(np.int16)
    enc = gsm.GsmFrEncode()
    _, whole = enc.apply(enc.init_state(), jnp.asarray(pcm))
    st = enc.init_state()
    parts = []
    for chunk in np.split(pcm, 4):
        st, f = enc.apply(st, jnp.asarray(chunk))
        parts.append(np.asarray(f))
    np.testing.assert_array_equal(np.concatenate(parts), np.asarray(whole))


def test_vmap_channels():
    x = GOLD["input"][:160 * 10].astype(np.int16)
    xs = jnp.stack([jnp.asarray(x), jnp.asarray(x[::-1].copy())])
    states = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (2,) + a.shape),
        gsm.gsm_init_encode_state())
    _, frames = jax.vmap(gsm.gsm_fr_encode)(states, xs)
    _, ref = gsm.gsm_fr_encode(gsm.gsm_init_encode_state(), xs[1])
    np.testing.assert_array_equal(np.asarray(frames[1]), np.asarray(ref))


def test_digital_voice_roundtrip():
    """blks2impl/digital_voice analog: audio -> GSM -> GMSK -> back."""
    from grtpu.models.digital_voice import DigitalVoiceRx, DigitalVoiceTx
    t = np.arange(160 * 20)
    audio = (0.5 * np.sin(2 * np.pi * 300 / 8000 * t)
             + 0.2 * np.sin(2 * np.pi * 1100 / 8000 * t)).astype(np.float32)
    tx, rx = DigitalVoiceTx(), DigitalVoiceRx()
    out = rx(np.asarray(tx(audio)))
    n = min(len(out), len(audio))
    a = audio[:n] - audio[:n].mean()
    b = out[:n] - out[:n].mean()
    corr = np.corrcoef(a[320:], b[320:])[0, 1]
    assert corr > 0.9, corr
