"""Rp62_248 — Rescue-Prime over the f62 field
(crypto/src/hash/rescue/rp62_248/mod.rs): state 12, **rate = state[0..8]**,
digest = state[0..4], element-count tag in state[11] (the legacy layout —
unlike Rp64_256's capacity-first layout), 7 rounds with S-box x^3 / x^{1/3}
(ALPHA=3, INV_ALPHA=3074416663688030891).  Digests serialize as 31 bytes of
bit-packed 62-bit values (digest.rs:34-60).

Full Hasher API (transcript + Merkle) on the host path; the device words
API converts rows to ints and reuses it (f62 configs are correctness
targets, not the benchmark north star — see CLAUDE.md).
"""

from __future__ import annotations

import numpy as np

from ..ops.limb_field import F62
from .rescue62_constants import ARK1_62, ARK2_62, MDS62

P62 = F62.P
STATE_WIDTH = 12
RATE = 8
DIGEST_SIZE = 4
NUM_ROUNDS = 7
ALPHA = 3
INV_ALPHA = 3074416663688030891
MASK62 = (1 << 62) - 1
MASK64 = (1 << 64) - 1


_NATIVE = None
_NATIVE_TRIED = False


def apply_permutation_ints(state):
    global _NATIVE, _NATIVE_TRIED
    if not _NATIVE_TRIED:
        _NATIVE_TRIED = True
        from ._native_perm import make_native_permute

        _NATIVE = make_native_permute(
            "rp62_248", P62, STATE_WIDTH, NUM_ROUNDS, ALPHA, INV_ALPHA,
            MDS62, ARK1_62, ARK2_62,
        )
    if _NATIVE is not None:
        return _NATIVE(state)
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


def digest_to_bytes31(elements) -> bytes:
    """Bit-pack 4 x 62-bit canonical values into the 31-byte serialized form
    (digest.rs:34-47: 32-byte as_bytes whose final byte is always zero,
    written as 31 bytes)."""
    v1, v2, v3, v4 = elements
    out = b""
    out += ((v1 | (v2 << 62)) & MASK64).to_bytes(8, "little")
    out += (((v2 >> 2) | (v3 << 60)) & MASK64).to_bytes(8, "little")
    out += (((v3 >> 4) | (v4 << 58)) & MASK64).to_bytes(8, "little")
    out += (v4 >> 6).to_bytes(8, "little")
    return out[:31]


def digest_from_bytes31(b: bytes):
    """Inverse of the packing (digest.rs:63-79)."""
    assert len(b) == 31
    w = int.from_bytes(b, "little")
    return [
        (w >> (62 * i)) & MASK62
        for i in range(DIGEST_SIZE)
    ]


_NATIVE_SPONGE = None
_NATIVE_SPONGE_TRIED = False


def _native_sponge():
    global _NATIVE_SPONGE, _NATIVE_SPONGE_TRIED
    if not _NATIVE_SPONGE_TRIED:
        _NATIVE_SPONGE_TRIED = True
        from ._native_perm import make_native_sponge

        # legacy rate-first layout: absorb at state[0..8), count tag in
        # state[11], digest = state[0..4)
        _NATIVE_SPONGE = make_native_sponge(
            "rp62_248", P62, STATE_WIDTH, NUM_ROUNDS, ALPHA, INV_ALPHA,
            MDS62, ARK1_62, ARK2_62, 0, RATE, STATE_WIDTH - 1, 0, DIGEST_SIZE,
        )
    return _NATIVE_SPONGE


def _pack_digests_words(dig):
    """(n, 4) u64 digest elements -> (n, 8) u32 packed 31-byte digest words
    (vectorized digest_to_bytes31 + zero pad byte)."""
    v1, v2, v3, v4 = (dig[:, i] for i in range(4))
    s = np.uint64
    w0 = v1 | (v2 << s(62))
    w1 = (v2 >> s(2)) | (v3 << s(60))
    w2 = (v3 >> s(4)) | (v4 << s(58))
    w3 = v4 >> s(6)  # < 2^56: byte 31 of the packed form is always zero
    packed = np.stack([w0, w1, w2, w3], axis=-1)
    from ._native_perm import u64_to_words

    return u64_to_words(packed)


def _unpack_digests_words(words):
    """(n, 8) u32 packed digest words -> (n, 4) u64 digest elements
    (vectorized digest_from_bytes31)."""
    u = words.astype(np.uint64)
    w = u[:, 0::2] | (u[:, 1::2] << np.uint64(32))  # (n, 4) packed u64
    s = np.uint64
    M = s(MASK62)
    v1 = w[:, 0] & M
    v2 = ((w[:, 0] >> s(62)) | (w[:, 1] << s(2))) & M
    v3 = ((w[:, 1] >> s(60)) | (w[:, 2] << s(4))) & M
    v4 = ((w[:, 2] >> s(58)) | (w[:, 3] << s(6))) & M
    return np.stack([v1, v2, v3, v4], axis=-1)


class Rp62_248:
    NAME = "rp62_248"
    DIGEST_BYTES = 31
    COLLISION_RESISTANCE = 124

    # -- host byte api ------------------------------------------------------

    @staticmethod
    def hash(data: bytes) -> bytes:
        """7-byte chunks -> elements, last chunk padded with a 1 byte,
        element count in state[11] (mod.rs:97-153)."""
        num_elements = (len(data) + 6) // 7 if len(data) % 7 else len(data) // 7
        if len(data) % 7 != 0:
            num_elements = len(data) // 7 + 1
        state = [0] * STATE_WIDTH
        state[STATE_WIDTH - 1] = num_elements % P62
        i = 0
        chunks = [data[k : k + 7] for k in range(0, len(data), 7)] or [b""]
        for idx, chunk in enumerate(chunks):
            if idx < num_elements - 1:
                buf = chunk + b"\x00"
            else:
                buf = chunk + b"\x01" + b"\x00" * (7 - len(chunk))
            state[i] = (state[i] + int.from_bytes(buf, "little")) % P62
            i += 1
            if i % RATE == 0:
                state = apply_permutation_ints(state)
                i = 0
        if i > 0:
            state = apply_permutation_ints(state)
        return digest_to_bytes31(state[:DIGEST_SIZE])

    @classmethod
    def merge(cls, a: bytes, b: bytes) -> bytes:
        """Digest elements fill the whole rate, tag = 8 (mod.rs:155-166)."""
        state = digest_from_bytes31(a[:31]) + digest_from_bytes31(b[:31])
        state += [0] * (STATE_WIDTH - RATE)
        state[STATE_WIDTH - 1] = RATE
        state = apply_permutation_ints(state)
        return digest_to_bytes31(state[:DIGEST_SIZE])

    @classmethod
    def merge_with_int(cls, seed: bytes, value: int) -> bytes:
        """mod.rs:168-190 — value (and its overflow) after the seed."""
        value &= MASK64
        state = digest_from_bytes31(seed[:31]) + [0] * (STATE_WIDTH - DIGEST_SIZE)
        state[DIGEST_SIZE] = value % P62
        if value < P62:
            state[STATE_WIDTH - 1] = DIGEST_SIZE + 1
        else:
            state[DIGEST_SIZE + 1] = value // P62
            state[STATE_WIDTH - 1] = DIGEST_SIZE + 2
        state = apply_permutation_ints(state)
        return digest_to_bytes31(state[:DIGEST_SIZE])

    @classmethod
    def merge_many(cls, pairs):
        """Batched 2-to-1 merges in one native call (Merkle verification)."""
        sponge = _native_sponge()
        if sponge is None or not pairs:
            return [cls.merge(a, b) for a, b in pairs]
        l = np.frombuffer(
            b"".join(a[:31] + b"\x00" for a, _ in pairs), dtype="<u4"
        ).reshape(-1, 8)
        r = np.frombuffer(
            b"".join(b[:31] + b"\x00" for _, b in pairs), dtype="<u4"
        ).reshape(-1, 8)
        out = _pack_digests_words(
            sponge[1](_unpack_digests_words(l), _unpack_digests_words(r))
        )
        ob = out.tobytes()
        return [ob[i * 32 : i * 32 + 31] for i in range(len(pairs))]

    @classmethod
    def hash_elements(cls, elements, elem_bytes: int = 8) -> bytes:
        """mod.rs:195-230 — rate-first absorption, count tag in state[11]."""
        assert elem_bytes == 8, "Rp62_248 is native to f62 (8-byte elements)"
        flat = []
        for e in elements:
            if isinstance(e, tuple):
                flat.extend(e)
            else:
                flat.append(e)
        state = [0] * STATE_WIDTH
        state[STATE_WIDTH - 1] = len(flat) % P62
        i = 0
        for e in flat:
            state[i] = (state[i] + e) % P62
            i += 1
            if i % RATE == 0:
                state = apply_permutation_ints(state)
                i = 0
        if i > 0:
            state = apply_permutation_ints(state)
        return digest_to_bytes31(state[:DIGEST_SIZE])

    JITTABLE = False  # host-backed words API: device pipelines must fall
    # back to the host prover for configs using this transcript hasher

    # -- device words api (host-backed) -------------------------------------

    @classmethod
    def hash_words(cls, words, byte_len: int):
        """words: (..., W*2) u32 limb words of f62 elements."""
        arr = np.asarray(words).reshape(-1, np.asarray(words).shape[-1])
        n, w2 = arr.shape
        assert byte_len == w2 * 4
        u64 = arr.astype(np.uint64)
        vals = u64[:, 0::2] | (u64[:, 1::2] << np.uint64(32))
        sponge = _native_sponge()
        if sponge is not None:
            dig = sponge[0](vals)
            out = _pack_digests_words(dig)
        else:
            out = np.zeros((n, 8), dtype=np.uint32)
            for i in range(n):
                d = cls.hash_elements([int(v) for v in vals[i]])
                out[i] = np.frombuffer(d + b"\x00", dtype="<u4")
        return out.reshape(np.asarray(words).shape[:-1] + (8,))

    @classmethod
    def merge_words(cls, l, r):
        la = np.asarray(l).reshape(-1, 8)
        ra = np.asarray(r).reshape(-1, 8)
        sponge = _native_sponge()
        if sponge is not None:
            out = _pack_digests_words(
                sponge[1](_unpack_digests_words(la), _unpack_digests_words(ra))
            )
        else:
            out = np.zeros_like(la)
            for i in range(la.shape[0]):
                d = cls.merge(
                    cls.digest_to_bytes(la[i]), cls.digest_to_bytes(ra[i])
                )
                out[i] = np.frombuffer(d + b"\x00", dtype="<u4")
        return out.reshape(np.asarray(l).shape)

    @staticmethod
    def digest_to_bytes(d) -> bytes:
        return np.asarray(d, dtype=np.uint32).tobytes()[:31]

    @staticmethod
    def digest_from_bytes(b: bytes):
        assert len(b) == 31
        return np.frombuffer(b + b"\x00", dtype="<u4").astype(np.uint32)
