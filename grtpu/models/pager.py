"""FLEX pager receiver components.

Analogs (gr-pager, SURVEY.md §2.8): pager_slicer_fb (4-level slicer),
pager_flex_sync (sync-word detection + speed), pager_flex_deinterleave
(8x32-bit block deinterleaver), BCH(31,21) decode, pager_flex_parse
(frame/address/alpha message parsing).

The symbol-rate front end (FM demod + filtering) reuses the analog blocks;
this module covers the bit layer.  Word layout follows the FLEX convention:
32-bit words = 21 info + 10 BCH(31,21) checks + 1 even parity, transmitted
LSB-first, interleaved in blocks of 8 words.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from grtpu.runtime.block import Block, Port

# FLEX 1600 sync "A" word (BS1 + A1 pattern); detection by correlation.
FLEX_SYNC_1600 = 0xA6C6AAAA
# BCH(31,21) generator polynomial x^10+x^9+x^8+x^6+x^5+x^3+1
_BCH_POLY = 0b11101101001


class PagerSlicer(Block):
    """pager_slicer_fb: 4-level FSK baseband -> 2-bit symbols.

    FLEX symbol mapping (freq high->low): 10, 11, 01, 00 — here the
    standard slicing of the filtered discriminator output with an adaptive
    envelope (simplified to fixed thresholds at 0 and +-2/3 of max level).
    """

    def __init__(self, name=None):
        self.in_ports = (Port(jnp.float32),)
        self.out_ports = (Port(jnp.uint8),)
        super().__init__(name)

    def apply(self, state, x):
        hi = jnp.where(x > 0, 1, 0)
        inner = jnp.where(jnp.abs(x) <= 2.0 / 3.0, 1, 0)
        # FLEX dibit: MSB = sign, LSB = inner level
        # (+3 -> 10, +1 -> 11, -1 -> 01, -3 -> 00)
        sym = (hi << 1) | inner
        return state, sym.astype(jnp.uint8)


# ------------------------------------------------------------------ BCH
def _bch_encode_word(info21: int) -> int:
    """21 info bits -> 31-bit codeword (info << 10 | checks)."""
    reg = info21 << 10
    for i in range(30, 9, -1):
        if (reg >> i) & 1:
            reg ^= _BCH_POLY << (i - 10)
    return (info21 << 10) | (reg & 0x3FF)


def flex_encode_word(info21: int) -> int:
    """Full 32-bit FLEX word: BCH codeword + even parity bit."""
    cw = _bch_encode_word(info21)
    parity = bin(cw).count("1") & 1
    return (cw << 1) | parity


def _syndrome(cw31: int) -> int:
    reg = cw31
    for i in range(30, 9, -1):
        if (reg >> i) & 1:
            reg ^= _BCH_POLY << (i - 10)
    return reg & 0x3FF


def _build_syndrome_table():
    """syndrome -> error mask for all 1- and 2-bit error patterns."""
    table = {}
    for i in range(31):
        e = 1 << i
        table[_syndrome(e)] = e
    for i in range(31):
        for j in range(i + 1, 31):
            e = (1 << i) | (1 << j)
            s = _syndrome(e)
            table.setdefault(s, e)
    return table


_SYN_TABLE = _build_syndrome_table()


def bch_decode_word(cw31: int) -> Tuple[Optional[int], int]:
    """Correct up to 2 bit errors; returns (info21 or None, n_corrected)."""
    s = _syndrome(cw31)
    if s == 0:
        return cw31 >> 10, 0
    e = _SYN_TABLE.get(s)
    if e is None:
        return None, -1
    fixed = cw31 ^ e
    if _syndrome(fixed) != 0:
        return None, -1
    return fixed >> 10, bin(e).count("1")


def flex_decode_word(word32: int) -> Tuple[Optional[int], int]:
    """32-bit word (codeword<<1 | parity) -> (info21, n_corrected)."""
    cw = word32 >> 1
    return bch_decode_word(cw)


# ----------------------------------------------------------- interleaving
def flex_interleave(words: np.ndarray) -> np.ndarray:
    """8 x 32-bit words -> 256 bits, bit i of word j at position i*8+j
    (pager_flex_deinterleave's inverse)."""
    w = np.asarray(words, np.uint64)
    assert len(w) == 8
    bits = np.zeros(256, np.uint8)
    for i in range(32):
        for j in range(8):
            bits[i * 8 + j] = (w[j] >> i) & 1
    return bits


def flex_deinterleave(bits: np.ndarray) -> np.ndarray:
    """256 bits -> 8 x 32-bit words (pager_flex_deinterleave)."""
    b = np.asarray(bits, np.uint64)
    words = np.zeros(8, np.uint64)
    for i in range(32):
        for j in range(8):
            words[j] |= b[i * 8 + j] << i
    return words


def find_sync(bits: np.ndarray, sync: int = FLEX_SYNC_1600,
              max_errors: int = 2) -> Optional[int]:
    """Correlate for the 32-bit sync word (pager_flex_sync); returns the
    index just past the sync, or None."""
    pat = np.array([(sync >> (31 - i)) & 1 for i in range(32)], np.int8)
    b = np.asarray(bits, np.int8)
    if len(b) < 32:
        return None
    s = 2 * b - 1
    c = 2 * pat - 1
    corr = np.correlate(s, c, mode="valid")
    errs = (32 - corr) // 2
    hits = np.nonzero(errs <= max_errors)[0]
    if len(hits) == 0:
        return None
    return int(hits[0]) + 32


def parse_alpha(words: List[int]) -> str:
    """Alphanumeric vector payload: 7-bit chars packed 3 per 21-bit word
    (pager_flex_parse alpha handling)."""
    chars = []
    for w in words:
        for k in range(3):
            c = (w >> (7 * k)) & 0x7F
            if c:
                chars.append(chr(c))
    return "".join(chars)


def pack_alpha(msg: str) -> List[int]:
    words = []
    data = [ord(c) & 0x7F for c in msg]
    while data:
        chunk, data = data[:3], data[3:]
        w = 0
        for k, c in enumerate(chunk):
            w |= c << (7 * k)
        words.append(w)
    return words
