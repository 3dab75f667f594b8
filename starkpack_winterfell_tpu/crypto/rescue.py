"""Rescue-Prime Rp64_256 — equivalent of crypto/src/hash/rescue/rp64_256/.

Field-native arithmetization-friendly sponge over Goldilocks: state 12,
rate 8, capacity 4, digest 4 elements, 7 rounds of
(x^7 -> MDS -> ARK1 -> x^{1/7} -> MDS -> ARK2)  [rp64_256/mod.rs:296-360].

Digests are 32 bytes = 4 canonical LE u64 (digest.rs:27-38), so they slot
into the same byte/word digest interfaces as BLAKE3.  The device path is
vectorized over rows with the u32-limb field ops; the host path runs on
python ints (transcript use only).
"""

from __future__ import annotations

import numpy as np

from ..math import scalar as fs
from ..ops import gl64 as gl
from .rescue_constants import ARK1, ARK2, INV_MDS, MDS

P = fs.P
STATE_WIDTH = 12
RATE = 8
CAPACITY = 4
DIGEST_SIZE = 4
NUM_ROUNDS = 7
ALPHA = 7
INV_ALPHA = 10540996611094048183


# ---------------------------------------------------------------------------
# host scalar permutation
# ---------------------------------------------------------------------------


_NATIVE = None
_NATIVE_TRIED = False


def apply_permutation_ints(state):
    global _NATIVE, _NATIVE_TRIED
    if not _NATIVE_TRIED:
        _NATIVE_TRIED = True
        from ._native_perm import make_native_permute

        _NATIVE = make_native_permute(
            "rp64_256", P, STATE_WIDTH, NUM_ROUNDS, ALPHA, INV_ALPHA,
            MDS, ARK1, ARK2,
        )
    if _NATIVE is not None:
        return _NATIVE(state)
    for r in range(NUM_ROUNDS):
        state = [pow(x, ALPHA, P) for x in state]
        state = _mds_ints(state)
        state = [(x + c) % P for x, c in zip(state, ARK1[r])]
        state = [pow(x, INV_ALPHA, P) for x in state]
        state = _mds_ints(state)
        state = [(x + c) % P for x, c in zip(state, ARK2[r])]
    return state


def _mds_ints(state):
    return [sum(MDS[i][j] * state[j] for j in range(STATE_WIDTH)) % P for i in range(STATE_WIDTH)]


# ---------------------------------------------------------------------------
# vectorized permutation on limb pairs
# ---------------------------------------------------------------------------

_MDS_PAIRS = None
_ARK1_PAIRS = None
_ARK2_PAIRS = None


def _consts():
    global _MDS_PAIRS, _ARK1_PAIRS, _ARK2_PAIRS
    if _MDS_PAIRS is None:
        _MDS_PAIRS = [[gl.from_int(MDS[i][j], (1,)) for j in range(STATE_WIDTH)] for i in range(STATE_WIDTH)]
        _ARK1_PAIRS = [[gl.from_int(c, (1,)) for c in row] for row in ARK1]
        _ARK2_PAIRS = [[gl.from_int(c, (1,)) for c in row] for row in ARK2]
    return _MDS_PAIRS, _ARK1_PAIRS, _ARK2_PAIRS


def _exp_inv_alpha(x):
    """x^{1/7} = x^INV_ALPHA (rp64_256/mod.rs:54), static square-and-multiply."""
    return gl.exp_int(x, INV_ALPHA)


MDS_ROW0 = tuple(MDS[0])


def apply_permutation_limbs(state, xp):
    """state: list of 12 (lo, hi) pairs (any batch shape)."""
    _, ark1, ark2 = _consts()

    def add_const(s, c):
        cc = (xp.asarray(c[0]), xp.asarray(c[1]))
        return gl.add(s, (xp.broadcast_to(cc[0], s[0].shape), xp.broadcast_to(cc[1], s[1].shape)))

    def apply_mds(s):
        # circulant small-constant MDS (see gl64.mds_circulant)
        return gl.mds_circulant(s, MDS_ROW0)

    for r in range(NUM_ROUNDS):
        state = [gl.exp7(x) for x in state]
        state = apply_mds(state)
        state = [add_const(x, ark1[r][i]) for i, x in enumerate(state)]
        state = [_exp_inv_alpha(x) for x in state]
        state = apply_mds(state)
        state = [add_const(x, ark2[r][i]) for i, x in enumerate(state)]
    return state


# ---------------------------------------------------------------------------
# hasher interface
# ---------------------------------------------------------------------------


class Rp64_256:
    NAME = "rp64_256"
    DIGEST_BYTES = 32
    COLLISION_RESISTANCE = 128

    # -- host byte/element api ----------------------------------------------

    @staticmethod
    def hash(data: bytes) -> bytes:
        """7-byte-chunk absorption (rp64_256/mod.rs:125-180)."""
        n = len(data)
        num_elements = n // 7 if n % 7 == 0 else n // 7 + 1
        state = [0] * STATE_WIDTH
        state[0] = num_elements % P
        i = 0
        for k in range(num_elements):
            chunk = data[k * 7 : (k + 1) * 7]
            if k < num_elements - 1:
                buf = chunk + b"\x00"
            else:
                buf = chunk + b"\x01" + b"\x00" * (7 - len(chunk))
            state[CAPACITY + i] = (state[CAPACITY + i] + int.from_bytes(buf, "little")) % P
            i += 1
            if i % RATE == 0:
                state = apply_permutation_ints(state)
                i = 0
        if i > 0:
            state = apply_permutation_ints(state)
        return _digest_bytes(state)

    @classmethod
    def hash_elements(cls, elements, elem_bytes: int = 8) -> bytes:
        assert elem_bytes == 8, "algebraic hashers are native to f64" 
        """rp64_256/mod.rs:222-259 — capacity[0] = element count, absorb 8
        base elements per permutation."""
        flat = []
        for e in elements:
            flat.extend(fs.components(e))
        state = [0] * STATE_WIDTH
        state[0] = len(flat) % P
        i = 0
        for e in flat:
            state[CAPACITY + i] = (state[CAPACITY + i] + e) % P
            i += 1
            if i % RATE == 0:
                state = apply_permutation_ints(state)
                i = 0
        if i > 0:
            state = apply_permutation_ints(state)
        return _digest_bytes(state)

    @staticmethod
    def merge(a: bytes, b: bytes) -> bytes:
        """rp64_256/mod.rs:182-193."""
        state = [0] * STATE_WIDTH
        state[0] = RATE
        elems = _bytes_to_elems(a) + _bytes_to_elems(b)
        for i, e in enumerate(elems):
            state[CAPACITY + i] = e
        state = apply_permutation_ints(state)
        return _digest_bytes(state)

    @staticmethod
    def merge_with_int(seed: bytes, value: int) -> bytes:
        """rp64_256/mod.rs:195-219."""
        state = [0] * STATE_WIDTH
        for i, e in enumerate(_bytes_to_elems(seed)):
            state[CAPACITY + i] = e
        state[CAPACITY + DIGEST_SIZE] = value % P
        if value < P:
            state[0] = DIGEST_SIZE + 1
        else:
            state[CAPACITY + DIGEST_SIZE + 1] = value // P
            state[0] = DIGEST_SIZE + 2
        state = apply_permutation_ints(state)
        return _digest_bytes(state)

    @classmethod
    def merge_many(cls, pairs):
        """Batched 2-to-1 merges in one native call (Merkle verification)."""
        sponge = _native_sponge()
        if sponge is None or not pairs:
            return [cls.merge(a, b) for a, b in pairs]
        l = np.frombuffer(b"".join(a for a, _ in pairs), dtype="<u8")
        r = np.frombuffer(b"".join(b for _, b in pairs), dtype="<u8")
        out = sponge[1](l.reshape(-1, 4), r.reshape(-1, 4))
        ob = out.astype("<u8").tobytes()
        return [ob[i * 32 : (i + 1) * 32] for i in range(len(pairs))]

    # -- device words api ---------------------------------------------------

    @staticmethod
    def hash_words(words, byte_len: int):
        """Rows of field elements in canonical LE word layout ->
        hash_elements digests as (..., 8) u32 words."""
        xp = gl._xp(words)
        assert byte_len % 8 == 0
        n_elems = byte_len // 8
        if xp is np:
            out = _native_hash_words(np.asarray(words), n_elems)
            if out is not None:
                return out
        lo = words[..., 0 : 2 * n_elems : 2]
        hi = words[..., 1 : 2 * n_elems : 2]
        batch = words.shape[:-1]
        state = [gl.zeros(batch, xp) for _ in range(STATE_WIDTH)]
        count = gl.from_int(n_elems)
        state[0] = (
            xp.broadcast_to(xp.asarray(count[0]), batch).astype(np.uint32),
            xp.broadcast_to(xp.asarray(count[1]), batch).astype(np.uint32),
        )
        i = 0
        for k in range(n_elems):
            e = (lo[..., k], hi[..., k])
            state[CAPACITY + i] = gl.add(state[CAPACITY + i], e)
            i += 1
            if i % RATE == 0:
                state = apply_permutation_limbs(state, xp)
                i = 0
        if i > 0:
            state = apply_permutation_limbs(state, xp)
        return _digest_words(state, xp)

    @staticmethod
    def merge_words(l, r):
        xp = gl._xp(l)
        if xp is np:
            out = _native_merge_words(np.asarray(l), np.asarray(r))
            if out is not None:
                return out
        batch = l.shape[:-1]
        state = [gl.zeros(batch, xp) for _ in range(STATE_WIDTH)]
        eight = gl.from_int(RATE)
        state[0] = (
            xp.broadcast_to(xp.asarray(eight[0]), batch).astype(np.uint32),
            xp.broadcast_to(xp.asarray(eight[1]), batch).astype(np.uint32),
        )
        for k in range(DIGEST_SIZE):
            state[CAPACITY + k] = (l[..., 2 * k], l[..., 2 * k + 1])
            state[CAPACITY + DIGEST_SIZE + k] = (r[..., 2 * k], r[..., 2 * k + 1])
        state = apply_permutation_limbs(state, xp)
        return _digest_words(state, xp)

    @staticmethod
    def digest_to_bytes(d) -> bytes:
        arr = np.asarray(d, dtype=np.uint32)
        return b"".join(int(w).to_bytes(4, "little") for w in arr.reshape(-1))

    @staticmethod
    def digest_from_bytes(b: bytes):
        assert len(b) == 32
        return np.frombuffer(b, dtype="<u4").astype(np.uint32)


def _digest_bytes(state) -> bytes:
    out = b""
    for i in range(CAPACITY, CAPACITY + DIGEST_SIZE):
        out += int(state[i]).to_bytes(8, "little")
    return out


_NATIVE_SPONGE = None
_NATIVE_SPONGE_TRIED = False


def _native_sponge():
    global _NATIVE_SPONGE, _NATIVE_SPONGE_TRIED
    if not _NATIVE_SPONGE_TRIED:
        _NATIVE_SPONGE_TRIED = True
        from ._native_perm import make_native_sponge

        _NATIVE_SPONGE = make_native_sponge(
            "rp64_256", P, STATE_WIDTH, NUM_ROUNDS, ALPHA, INV_ALPHA,
            MDS, ARK1, ARK2, CAPACITY, RATE, 0, CAPACITY, DIGEST_SIZE,
        )
    return _NATIVE_SPONGE


def _native_hash_words(words, n_elems):
    sponge = _native_sponge()
    if sponge is None:
        return None
    from ._native_perm import u64_to_words, words_to_u64

    shape = words.shape[:-1]
    vals = words_to_u64(words.reshape(-1, words.shape[-1]), n_elems)
    return u64_to_words(sponge[0](vals)).reshape(shape + (2 * DIGEST_SIZE,))


def _native_merge_words(l, r):
    sponge = _native_sponge()
    if sponge is None:
        return None
    from ._native_perm import u64_to_words, words_to_u64

    shape = l.shape
    lv = words_to_u64(l.reshape(-1, l.shape[-1]), DIGEST_SIZE)
    rv = words_to_u64(r.reshape(-1, r.shape[-1]), DIGEST_SIZE)
    return u64_to_words(sponge[1](lv, rv)).reshape(shape)


def _digest_words(state, xp):
    parts = []
    for i in range(CAPACITY, CAPACITY + DIGEST_SIZE):
        parts.append(state[i][0])
        parts.append(state[i][1])
    return xp.stack(parts, axis=-1)


def _bytes_to_elems(b: bytes):
    assert len(b) == 32
    return [int.from_bytes(b[i * 8 : (i + 1) * 8], "little") for i in range(4)]
