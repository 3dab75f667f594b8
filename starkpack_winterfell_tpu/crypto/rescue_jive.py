"""RpJive64_256 — Rescue-Prime in Jive 2-to-1 compression mode
(crypto/src/hash/rescue/rp64_256_jive/mod.rs): state width 8, rate 4,
digest 4 elements; merge/merge_with_int apply the permutation to the raw
8-element input and output the Jive summation
  digest_i = init_i + init_{4+i} + final_i + final_{4+i}.
"""

from __future__ import annotations

import numpy as np

from ..math import scalar as fs
from ..ops import gl64 as gl
from .rescue import INV_ALPHA, _bytes_to_elems, _digest_bytes
from .rescue_jive_constants import ARK1_8, ARK2_8, MDS8

P = fs.P
STATE_WIDTH = 8
RATE = 4
DIGEST_SIZE = 4
NUM_ROUNDS = 7


_NATIVE = None
_NATIVE_TRIED = False


def apply_permutation_ints(state):
    global _NATIVE, _NATIVE_TRIED
    if not _NATIVE_TRIED:
        _NATIVE_TRIED = True
        from ._native_perm import make_native_permute

        _NATIVE = make_native_permute(
            "rp_jive64_256", P, STATE_WIDTH, NUM_ROUNDS, 7, INV_ALPHA,
            MDS8, ARK1_8, ARK2_8,
        )
    if _NATIVE is not None:
        return _NATIVE(state)
    for r in range(NUM_ROUNDS):
        state = [pow(x, 7, P) for x in state]
        state = _mds_ints(state)
        state = [(x + c) % P for x, c in zip(state, ARK1_8[r])]
        state = [pow(x, INV_ALPHA, P) for x in state]
        state = _mds_ints(state)
        state = [(x + c) % P for x, c in zip(state, ARK2_8[r])]
    return state


def _mds_ints(state):
    return [
        sum(MDS8[i][j] * state[j] for j in range(STATE_WIDTH)) % P
        for i in range(STATE_WIDTH)
    ]


def _jive_sum(initial, final):
    return [
        (initial[i] + initial[DIGEST_SIZE + i] + final[i] + final[DIGEST_SIZE + i]) % P
        for i in range(DIGEST_SIZE)
    ]


MDS8_ROW0 = tuple(MDS8[0])


def apply_permutation_limbs(state, xp):
    consts = _limb_consts()
    mds, ark1, ark2 = consts

    def add_const(s, c):
        cc = (xp.asarray(c[0]), xp.asarray(c[1]))
        return gl.add(s, (xp.broadcast_to(cc[0], s[0].shape), xp.broadcast_to(cc[1], s[1].shape)))

    def apply_mds(s):
        return gl.mds_circulant(s, MDS8_ROW0)

    for r in range(NUM_ROUNDS):
        state = [gl.exp7(x) for x in state]
        state = apply_mds(state)
        state = [add_const(x, ark1[r][i]) for i, x in enumerate(state)]
        state = [gl.exp_int(x, INV_ALPHA) for x in state]
        state = apply_mds(state)
        state = [add_const(x, ark2[r][i]) for i, x in enumerate(state)]
    return state


_CONSTS = None


def _limb_consts():
    global _CONSTS
    if _CONSTS is None:
        mds = [[gl.from_int(MDS8[i][j], (1,)) for j in range(STATE_WIDTH)] for i in range(STATE_WIDTH)]
        ark1 = [[gl.from_int(c, (1,)) for c in row] for row in ARK1_8]
        ark2 = [[gl.from_int(c, (1,)) for c in row] for row in ARK2_8]
        _CONSTS = (mds, ark1, ark2)
    return _CONSTS


class RpJive64_256:
    NAME = "rp_jive64_256"
    DIGEST_BYTES = 32
    COLLISION_RESISTANCE = 128

    @staticmethod
    def hash(data: bytes) -> bytes:
        """7-byte-chunk absorption; capacity[0]=1 iff element count not a
        multiple of the rate (rp64_256_jive/mod.rs:119-180)."""
        n = len(data)
        num_elements = n // 7 if n % 7 == 0 else n // 7 + 1
        state = [0] * STATE_WIDTH
        if num_elements % RATE != 0:
            state[0] = 1
        i = 0
        for k in range(num_elements):
            chunk = data[k * 7 : (k + 1) * 7]
            if k < num_elements - 1:
                buf = chunk + b"\x00"
            else:
                buf = chunk + b"\x01" + b"\x00" * (7 - len(chunk))
            state[RATE + i] = (state[RATE + i] + int.from_bytes(buf, "little")) % P
            i += 1
            if i % RATE == 0:
                state = apply_permutation_ints(state)
                i = 0
        if i > 0:
            # pad with [1, 0, ...] in the remaining rate positions
            state[RATE + i] = 1
            i += 1
            while i != RATE:
                state[RATE + i] = 0
                i += 1
            state = apply_permutation_ints(state)
        return _digest_bytes_jive(state)

    @classmethod
    def hash_elements(cls, elements, elem_bytes: int = 8) -> bytes:
        assert elem_bytes == 8, "algebraic hashers are native to f64" 
        """rp64_256_jive/mod.rs:227-264: capacity[0]=1 iff count % rate != 0,
        [1,0..] padding of the final partial rate block."""
        flat = []
        for e in elements:
            flat.extend(fs.components(e))
        state = [0] * STATE_WIDTH
        if len(flat) % RATE != 0:
            state[0] = 1
        i = 0
        for e in flat:
            state[RATE + i] = (state[RATE + i] + e) % P
            i += 1
            if i % RATE == 0:
                state = apply_permutation_ints(state)
                i = 0
        if i > 0:
            state[RATE + i] = 1
            i += 1
            while i != RATE:
                state[RATE + i] = 0
                i += 1
            state = apply_permutation_ints(state)
        return _digest_bytes_jive(state)

    @staticmethod
    def merge(a: bytes, b: bytes) -> bytes:
        initial = _bytes_to_elems(a) + _bytes_to_elems(b)
        final = apply_permutation_ints(list(initial))
        return _elems_bytes(_jive_sum(initial, final))

    @staticmethod
    def merge_with_int(seed: bytes, value: int) -> bytes:
        state = [0] * STATE_WIDTH
        for i, e in enumerate(_bytes_to_elems(seed)):
            state[i] = e
        state[RATE] = value % P
        if value < P:
            state[STATE_WIDTH - 1] = DIGEST_SIZE + 1
        else:
            state[RATE + 1] = value // P
            state[STATE_WIDTH - 1] = DIGEST_SIZE + 2
        initial = list(state)
        final = apply_permutation_ints(state)
        return _elems_bytes(_jive_sum(initial, final))

    # -- device words api ---------------------------------------------------

    @staticmethod
    def hash_words(words, byte_len: int):
        xp = gl._xp(words)
        assert byte_len % 8 == 0
        n_elems = byte_len // 8
        lo = words[..., 0 : 2 * n_elems : 2]
        hi = words[..., 1 : 2 * n_elems : 2]
        batch = words.shape[:-1]
        state = [gl.zeros(batch, xp) for _ in range(STATE_WIDTH)]
        if n_elems % RATE != 0:
            one = gl.from_int(1)
            state[0] = (
                xp.broadcast_to(xp.asarray(one[0]), batch).astype(np.uint32),
                xp.broadcast_to(xp.asarray(one[1]), batch).astype(np.uint32),
            )
        i = 0
        for k in range(n_elems):
            e = (lo[..., k], hi[..., k])
            state[RATE + i] = gl.add(state[RATE + i], e)
            i += 1
            if i % RATE == 0:
                state = apply_permutation_limbs(state, xp)
                i = 0
        if i > 0:
            one = gl.from_int(1)
            state[RATE + i] = (
                xp.broadcast_to(xp.asarray(one[0]), batch).astype(np.uint32),
                xp.broadcast_to(xp.asarray(one[1]), batch).astype(np.uint32),
            )
            i += 1
            while i != RATE:
                state[RATE + i] = gl.zeros(batch, xp)
                i += 1
            state = apply_permutation_limbs(state, xp)
        return _digest_words_jive(state, xp, jive=False)

    @staticmethod
    def merge_words(l, r):
        xp = gl._xp(l)
        initial = [
            (l[..., 2 * k], l[..., 2 * k + 1]) for k in range(DIGEST_SIZE)
        ] + [(r[..., 2 * k], r[..., 2 * k + 1]) for k in range(DIGEST_SIZE)]
        final = apply_permutation_limbs(list(initial), xp)
        parts = []
        for i in range(DIGEST_SIZE):
            s = gl.add(
                gl.add(initial[i], initial[DIGEST_SIZE + i]),
                gl.add(final[i], final[DIGEST_SIZE + i]),
            )
            parts.append(s[0])
            parts.append(s[1])
        return xp.stack(parts, axis=-1)

    @staticmethod
    def digest_to_bytes(d) -> bytes:
        arr = np.asarray(d, dtype=np.uint32)
        return b"".join(int(w).to_bytes(4, "little") for w in arr.reshape(-1))

    @staticmethod
    def digest_from_bytes(b: bytes):
        assert len(b) == 32
        return np.frombuffer(b, dtype="<u4").astype(np.uint32)


def _digest_bytes_jive(state) -> bytes:
    """Sponge-mode digest = state[4..8] (DIGEST_RANGE)."""
    out = b""
    for i in range(RATE, RATE + DIGEST_SIZE):
        out += int(state[i]).to_bytes(8, "little")
    return out


def _digest_words_jive(state, xp, jive: bool):
    parts = []
    for i in range(RATE, RATE + DIGEST_SIZE):
        parts.append(state[i][0])
        parts.append(state[i][1])
    return xp.stack(parts, axis=-1)


def _elems_bytes(elems) -> bytes:
    return b"".join(int(e).to_bytes(8, "little") for e in elems)
