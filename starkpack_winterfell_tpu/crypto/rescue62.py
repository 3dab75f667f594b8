"""Rp62_248 — Rescue-Prime over the f62 field
(crypto/src/hash/rescue/rp62_248/mod.rs): state 12, rate 8, capacity 4,
digest 4 f62 elements bit-packed into 248 bits (digest.rs:34-45), 7 rounds
with S-box x^3 / x^{1/3} (ALPHA=3, INV_ALPHA=3074416663688030891).

Host implementation (python ints); full protocol use awaits the f62 field
integration (see CLAUDE.md roadmap)."""

from __future__ import annotations

from ..ops.limb_field import F62
from .rescue62_constants import ARK1_62, ARK2_62, MDS62

P62 = F62.P
STATE_WIDTH = 12
RATE = 8
CAPACITY = 4
DIGEST_SIZE = 4
NUM_ROUNDS = 7
ALPHA = 3
INV_ALPHA = 3074416663688030891


def apply_permutation_ints(state):
    for r in range(NUM_ROUNDS):
        state = [pow(x, ALPHA, P62) for x in state]
        state = _mds(state)
        state = [(x + c) % P62 for x, c in zip(state, ARK1_62[r])]
        state = [pow(x, INV_ALPHA, P62) for x in state]
        state = _mds(state)
        state = [(x + c) % P62 for x, c in zip(state, ARK2_62[r])]
    return state


def _mds(state):
    return [
        sum(MDS62[i][j] * state[j] for j in range(STATE_WIDTH)) % P62
        for i in range(STATE_WIDTH)
    ]


def digest_to_bytes(elements) -> bytes:
    """Bit-pack 4 x 62-bit canonical values into 32 bytes (digest.rs:34-45)."""
    v1, v2, v3, v4 = elements
    out = b""
    out += ((v1 | (v2 << 62)) & ((1 << 64) - 1)).to_bytes(8, "little")
    out += (((v2 >> 2) | (v3 << 60)) & ((1 << 64) - 1)).to_bytes(8, "little")
    out += (((v3 >> 4) | (v4 << 58)) & ((1 << 64) - 1)).to_bytes(8, "little")
    out += (v4 >> 6).to_bytes(8, "little")
    return out


class Rp62_248:
    NAME = "rp62_248"
    DIGEST_BYTES = 32  # 248 bits of content, bit-packed, zero-padded
    COLLISION_RESISTANCE = 124

    @classmethod
    def hash_elements(cls, elements, elem_bytes: int = 8) -> bytes:
        assert elem_bytes == 8, "Rp62_248 is native to f62 (8-byte elements)" 
        flat = list(elements)
        state = [0] * STATE_WIDTH
        state[0] = len(flat) % P62
        i = 0
        for e in flat:
            state[CAPACITY + i] = (state[CAPACITY + i] + e) % P62
            i += 1
            if i % RATE == 0:
                state = apply_permutation_ints(state)
                i = 0
        if i > 0:
            state = apply_permutation_ints(state)
        return digest_to_bytes(state[CAPACITY : CAPACITY + DIGEST_SIZE])
