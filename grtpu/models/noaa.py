"""NOAA HRPT receive components.

Analogs (gr-noaa, SURVEY.md §2.8): noaa_hrpt_pll_cf (carrier recovery for
the split-phase PM downlink), noaa_hrpt_deframer (frame sync on the 60-bit
sync word + minor-frame extraction), noaa_hrpt_decoder (10-bit word
unpacking).

HRPT: 665.4 kbit/s biphase; frames of 11090 10-bit words starting with the
fixed 6-word sync pattern.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from grtpu.runtime.block import Block, Port
from grtpu.blocks.analog import PllFreqdet, PllCarrierTracking  # reuse

# The 60-bit HRPT minor-frame sync: 6 x 10-bit words (A/B standard pattern)
HRPT_SYNC_WORDS = (0x0284, 0x016F, 0x035C, 0x019D, 0x020F, 0x0095)
HRPT_MINOR_FRAME_WORDS = 11090
HRPT_BITS_PER_WORD = 10


def sync_bits() -> np.ndarray:
    bits = []
    for w in HRPT_SYNC_WORDS:
        bits.extend((w >> (9 - i)) & 1 for i in range(10))
    return np.array(bits, np.uint8)


class HrptPll(Block):
    """noaa_hrpt_pll_cf: PLL carrier tracking emitting the real baseband
    (the PM data rides the phase)."""

    def __init__(self, loop_bw: float = 0.005, max_offset: float = 0.1,
                 name=None):
        self.in_ports = (Port(jnp.complex64),)
        self.out_ports = (Port(jnp.float32),)
        super().__init__(name)
        self._pll = PllCarrierTracking(loop_bw, max_offset, -max_offset)

    def init_state(self):
        return self._pll.init_state()

    def apply(self, state, x):
        st, y = self._pll.apply(state, x)
        return st, jnp.real(y)


def deframe(bits: np.ndarray, max_errors: int = 4
            ) -> List[np.ndarray]:
    """noaa_hrpt_deframer: locate sync patterns, slice minor frames of
    11090 10-bit words.  Returns the list of complete frames (as word
    arrays)."""
    pat = sync_bits()
    b = np.asarray(bits, np.int8)
    if len(b) < len(pat):
        return []
    s = 2 * b.astype(np.int32) - 1
    c = 2 * pat.astype(np.int32) - 1
    corr = np.correlate(s, c, mode="valid")
    errs = (len(pat) - corr) // 2
    starts = np.nonzero(errs <= max_errors)[0]
    frames = []
    frame_bits = HRPT_MINOR_FRAME_WORDS * HRPT_BITS_PER_WORD
    last = -frame_bits
    for st in starts:
        if st < last + frame_bits:
            continue
        if st + frame_bits <= len(b):
            frames.append(decode_words(b[st: st + frame_bits]))
            last = st
    return frames


def decode_words(bits: np.ndarray) -> np.ndarray:
    """noaa_hrpt_decoder: MSB-first 10-bit word unpack."""
    b = np.asarray(bits, np.int64).reshape(-1, HRPT_BITS_PER_WORD)
    shifts = np.arange(9, -1, -1)
    return (b << shifts[None, :]).sum(axis=1).astype(np.int32)


def encode_words(words: np.ndarray) -> np.ndarray:
    w = np.asarray(words, np.int64)
    shifts = np.arange(9, -1, -1)
    return ((w[:, None] >> shifts[None, :]) & 1).reshape(-1).astype(np.uint8)
