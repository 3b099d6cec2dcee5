"""Finite state machine for trellis coding.

Analog of gr-trellis fsm class (gr-trellis/src/lib/fsm.{h,cc}): an FSM is
(I, S, O, NS, OS) — input alphabet size, state count, output alphabet size,
next-state table NS[s*I + i], output table OS[s*I + i].  Construction from
explicit tables, from a rate-k/n convolutional generator matrix (octal
generators), or from the gr-trellis file format.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


class FSM:
    def __init__(self, I: int, S: int, O: int,
                 NS: Sequence[int], OS: Sequence[int]):
        self.I, self.S, self.O = I, S, O
        self.NS = np.asarray(NS, np.int32).reshape(S, I)
        self.OS = np.asarray(OS, np.int32).reshape(S, I)
        self._build_predecessors()

    @classmethod
    def from_file(cls, path: str) -> "FSM":
        """gr-trellis file format: 'I S O' then NS table then OS table."""
        tokens = []
        with open(path) as f:
            for line in f:
                line = line.split("#")[0]
                tokens.extend(int(t) for t in line.split())
        I, S, O = tokens[0], tokens[1], tokens[2]
        body = tokens[3:]
        NS = body[: S * I]
        OS = body[S * I: 2 * S * I]
        return cls(I, S, O, NS, OS)

    @classmethod
    def from_convolutional(cls, k: int, n: int, generators) -> "FSM":
        """Rate k/n feedforward convolutional code from generator
        polynomials G[k][n] given as plain integer bit masks (use 0o...
        literals for the conventional octal notation) — fsm.cc's (k,n,G)
        constructor.  State = shift register contents per input line."""
        G = np.asarray([[int(g) for g in row] for row in
                        np.atleast_2d(generators)])
        assert G.shape == (k, n)
        # memory per input line
        mem = [max(int(g).bit_length() - 1, 0) for g in
               [int(np.max(G[i])) for i in range(k)]]
        S = 1 << sum(mem)
        I = 1 << k
        O = 1 << n
        NS = np.zeros((S, I), np.int32)
        OS = np.zeros((S, I), np.int32)
        for s in range(S):
            # unpack per-line registers
            regs = []
            acc = s
            for m in reversed(mem):
                regs.append(acc & ((1 << m) - 1))
                acc >>= m
            regs = regs[::-1]
            for inp in range(I):
                ibits = [(inp >> (k - 1 - j)) & 1 for j in range(k)]
                full = [(ibits[j] << mem[j]) | regs[j] for j in range(k)]
                out = 0
                for oi in range(n):
                    b = 0
                    for j in range(k):
                        b ^= bin(full[j] & int(G[j, oi])).count("1") & 1
                    out = (out << 1) | b
                ns = 0
                for j in range(k):
                    nr = full[j] >> 1 if mem[j] > 0 else 0
                    # new register drops oldest bit: (ibit<<(mem-1)) | reg>>1
                    nr = ((ibits[j] << max(mem[j] - 1, 0)) | (regs[j] >> 1)) \
                        & ((1 << mem[j]) - 1) if mem[j] > 0 else 0
                    ns = (ns << mem[j]) | nr
                NS[s, inp] = ns
                OS[s, inp] = out
        return cls(I, S, O, NS.reshape(-1), OS.reshape(-1))

    def _build_predecessors(self):
        """PS[s] = list of (prev_state, input) reaching s."""
        preds = [[] for _ in range(self.S)]
        for s in range(self.S):
            for i in range(self.I):
                preds[self.NS[s, i]].append((s, i))
        # uniform in-degree for vectorized Viterbi (true for shift-register
        # FSMs); ragged FSMs fall back to padding with -1
        deg = max(len(p) for p in preds)
        PS = np.full((self.S, deg), -1, np.int32)
        PI = np.full((self.S, deg), -1, np.int32)
        for s, plist in enumerate(preds):
            for j, (ps, pi) in enumerate(plist):
                PS[s, j] = ps
                PI[s, j] = pi
        self.PS, self.PI = PS, PI

    def encode(self, inputs: np.ndarray, start_state: int = 0) -> np.ndarray:
        """Run the FSM (trellis_encoder_XX semantics)."""
        s = start_state
        out = np.zeros(len(inputs), np.int32)
        for t, i in enumerate(np.asarray(inputs, np.int32)):
            out[t] = self.OS[s, i]
            s = self.NS[s, i]
        return out
