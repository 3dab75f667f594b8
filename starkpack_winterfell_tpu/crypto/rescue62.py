"""Rp62_248 — Rescue-Prime over the f62 field
(crypto/src/hash/rescue/rp62_248/mod.rs): state 12, **rate = state[0..8]**,
digest = state[0..4], element-count tag in state[11] (the legacy layout —
unlike Rp64_256's capacity-first layout), 7 rounds with S-box x^3 / x^{1/3}
(ALPHA=3, INV_ALPHA=3074416663688030891).  Digests serialize as 31 bytes of
bit-packed 62-bit values (digest.rs:34-60).

Full Hasher API (transcript + Merkle) on the host path; the device words
API is traceable — numpy input takes the native C sponge, traced input runs
a vectorized limb-plane permutation so f62 device/mesh commits hash with
their native transcript hasher inside jit.
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


# ---------------------------------------------------------------------------
# vectorized permutation on f62 limb tuples (the jit/device words path)
# ---------------------------------------------------------------------------

_LIMB_CONSTS = None


def _limb_consts():
    """Host numpy constant tables: MDS as (12, 12) limb planes, ARKs as
    per-round (12,) limb planes (broadcast against (12, *batch) states)."""
    global _LIMB_CONSTS
    if _LIMB_CONSTS is None:
        mds = F62.from_ints([MDS62[i][j] for i in range(STATE_WIDTH)
                             for j in range(STATE_WIDTH)])
        mds = tuple(p.reshape(STATE_WIDTH, STATE_WIDTH) for p in mds)
        # ARKs stacked over rounds: limb planes of shape (NUM_ROUNDS, 12)
        ark1 = F62.from_ints([c for row in ARK1_62 for c in row])
        ark1 = tuple(p.reshape(NUM_ROUNDS, STATE_WIDTH) for p in ark1)
        ark2 = F62.from_ints([c for row in ARK2_62 for c in row])
        ark2 = tuple(p.reshape(NUM_ROUNDS, STATE_WIDTH) for p in ark2)
        _LIMB_CONSTS = (mds, ark1, ark2)
    return _LIMB_CONSTS


def _bcast(c, shape, xp):
    return tuple(xp.broadcast_to(xp.asarray(p), shape) for p in c)


def _mds_stacked(s, mds, xp):
    """s: limb planes (12, *batch) -> MDS62 @ s, one broadcast multiply
    (12, 12, *batch) + a fold over the contraction axis."""
    nb = len(s[0].shape) - 1
    m = tuple(p.reshape((STATE_WIDTH, STATE_WIDTH) + (1,) * nb) for p in mds)
    prod = F62.mul(m, tuple(p[None] for p in s))  # (12, 12, *batch)
    acc = tuple(p[:, 0] for p in prod)
    for j in range(1, STATE_WIDTH):
        acc = F62.add(acc, tuple(p[:, j] for p in prod))
    return acc


def apply_permutation_limbs(state, xp):
    """state: list of 12 limb tuples (each (lo, hi) with a common batch
    shape).  Vectorized over the batch AND the 12 state elements (stacked
    leading axis), so one round is ~3 field ops regardless of batch."""
    mds_np, ark1_np, ark2_np = _limb_consts()
    batch = state[0][0].shape
    s = tuple(
        xp.stack([e[li] for e in state]) for li in range(F62.n)
    )  # (12, *batch)
    nb = len(batch)
    mds = tuple(xp.asarray(p) for p in mds_np)
    ashape = (STATE_WIDTH,) + (1,) * nb

    def round_fn(s, a1, a2):
        s = F62.mul(F62.square(s), s)  # x^3
        s = _mds_stacked(s, mds, xp)
        s = F62.add(s, tuple(xp.broadcast_to(p, s[0].shape) for p in a1))
        s = F62.exp_int(s, INV_ALPHA)  # x^{1/3}
        s = _mds_stacked(s, mds, xp)
        s = F62.add(s, tuple(xp.broadcast_to(p, s[0].shape) for p in a2))
        return s

    if xp is np:
        for r in range(NUM_ROUNDS):
            a1 = tuple(p[r].reshape(ashape) for p in ark1_np)
            a2 = tuple(p[r].reshape(ashape) for p in ark2_np)
            s = round_fn(s, a1, a2)
    else:
        # roll the rounds: unrolling 7 rounds of limb-chain graphs is the
        # known XLA compile blowup (CLAUDE.md) — one round body + a fori_loop
        # indexing the stacked (NUM_ROUNDS, 12) ARK planes compiles ~7x less
        import jax

        ark1 = tuple(xp.asarray(p) for p in ark1_np)
        ark2 = tuple(xp.asarray(p) for p in ark2_np)

        def body(r, s):
            a1 = tuple(p[r].reshape(ashape) for p in ark1)
            a2 = tuple(p[r].reshape(ashape) for p in ark2)
            return round_fn(s, a1, a2)

        s = jax.lax.fori_loop(0, NUM_ROUNDS, body, s)
    return [tuple(p[i] for p in s) for i in range(STATE_WIDTH)]


# 64-bit shift/or emulation on (lo, hi) u32 plane pairs (digest packing)


def _shl64(v, s: int, xp):
    lo, hi = v
    if s == 0:
        return v
    if s >= 32:
        return xp.zeros_like(lo), (lo << np.uint32(s - 32))
    return (lo << np.uint32(s)), (hi << np.uint32(s)) | (lo >> np.uint32(32 - s))


def _shr64(v, s: int, xp):
    lo, hi = v
    if s == 0:
        return v
    if s >= 32:
        return (hi >> np.uint32(s - 32)), xp.zeros_like(hi)
    return (lo >> np.uint32(s)) | (hi << np.uint32(32 - s)), (hi >> np.uint32(s))


def _or64(a, b):
    return a[0] | b[0], a[1] | b[1]


def _pack_digest_limbs(dig, xp):
    """4 digest elements as limb pairs (each (batch,)) -> (batch, 8) u32
    packed 31-byte digest words (jit-capable digest_to_bytes31)."""
    v1, v2, v3, v4 = dig
    w0 = _or64(v1, _shl64(v2, 62, xp))
    w1 = _or64(_shr64(v2, 2, xp), _shl64(v3, 60, xp))
    w2 = _or64(_shr64(v3, 4, xp), _shl64(v4, 58, xp))
    w3 = _shr64(v4, 6, xp)
    return xp.stack(
        [w0[0], w0[1], w1[0], w1[1], w2[0], w2[1], w3[0], w3[1]], axis=-1
    )


def _unpack_digest_limbs(words, xp):
    """(batch, 8) u32 packed digest words -> 4 limb-pair digest elements."""
    w = [(words[..., 2 * i], words[..., 2 * i + 1]) for i in range(4)]
    top = np.uint32(0x3FFFFFFF)  # mask62 on the hi plane

    def m62(v):
        return v[0], v[1] & top

    v1 = m62(w[0])
    v2 = m62(_or64(_shr64(w[0], 62, xp), _shl64(w[1], 2, xp)))
    v3 = m62(_or64(_shr64(w[1], 60, xp), _shl64(w[2], 4, xp)))
    v4 = m62(_or64(_shr64(w[2], 58, xp), _shl64(w[3], 6, xp)))
    return v1, v2, v3, v4


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

    JITTABLE = True  # the words API below is traceable (limb permutation)

    # -- device words api ----------------------------------------------------

    @classmethod
    def hash_words(cls, words, byte_len: int):
        """words: (..., W*2) u32 limb words of f62 elements.  numpy input
        takes the native C sponge; traced/jax input runs the vectorized
        limb permutation (device commits, mod.rs:195-230 semantics)."""
        from ..ops.limb_field import _xp

        xp = _xp(words)
        if xp is np:
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
        n_elems = byte_len // 8
        assert words.shape[-1] == 2 * n_elems
        lo = words[..., 0::2]
        hi = words[..., 1::2]
        batch = words.shape[:-1]
        state = [F62.zeros(batch, xp) for _ in range(STATE_WIDTH)]
        state[STATE_WIDTH - 1] = _bcast(
            F62.from_int(n_elems % P62), batch, xp
        )
        i = 0
        for k in range(n_elems):
            state[i] = F62.add(state[i], (lo[..., k], hi[..., k]))
            i += 1
            if i % RATE == 0:
                state = apply_permutation_limbs(state, xp)
                i = 0
        if i > 0:
            state = apply_permutation_limbs(state, xp)
        return _pack_digest_limbs(state[:DIGEST_SIZE], xp)

    @classmethod
    def merge_words(cls, l, r):
        from ..ops.limb_field import _xp

        xp = _xp(l)
        if xp is np:
            la = np.asarray(l).reshape(-1, 8)
            ra = np.asarray(r).reshape(-1, 8)
            sponge = _native_sponge()
            if sponge is not None:
                out = _pack_digests_words(
                    sponge[1](
                        _unpack_digests_words(la), _unpack_digests_words(ra)
                    )
                )
            else:
                out = np.zeros_like(la)
                for i in range(la.shape[0]):
                    d = cls.merge(
                        cls.digest_to_bytes(la[i]), cls.digest_to_bytes(ra[i])
                    )
                    out[i] = np.frombuffer(d + b"\x00", dtype="<u4")
            return out.reshape(np.asarray(l).shape)
        batch = l.shape[:-1]
        state = list(_unpack_digest_limbs(l, xp)) + list(
            _unpack_digest_limbs(r, xp)
        )
        state += [F62.zeros(batch, xp) for _ in range(STATE_WIDTH - RATE)]
        state[STATE_WIDTH - 1] = _bcast(F62.from_int(RATE), batch, xp)
        state = apply_permutation_limbs(state, xp)
        return _pack_digest_limbs(state[:DIGEST_SIZE], xp)

    @staticmethod
    def digest_to_bytes(d) -> bytes:
        return np.asarray(d, dtype=np.uint32).tobytes()[:31]

    @staticmethod
    def digest_from_bytes(b: bytes):
        assert len(b) == 31
        return np.frombuffer(b + b"\x00", dtype="<u4").astype(np.uint32)
