"""GriffinJive64_256 — the Griffin permutation in Jive compression mode
(crypto/src/hash/griffin/griffin64_256_jive/mod.rs): state width 8, rate
0..4, capacity 4..8, digest = state[0..4]; 7 "rounds" = 6 rounds with
constants + a final non-linear+linear pass.

Non-linear layer: s0 <- s0^{1/7}, s1 <- s1^7, then for i = 2..7:
  l_i = (i-1)*s0 + s1 + s_{i-1}   (s_{i-1} already updated)
  s_i <- s_i * (l_i^2 + ALPHA[i-2]*l_i + BETA[i-2])
"""

from __future__ import annotations

import numpy as np

from ..math import scalar as fs
from ..ops import gl64 as gl
from .rescue import INV_ALPHA, _bytes_to_elems
from .griffin_constants import ALPHA_G, ARK_G, BETA_G, MDS_G

P = fs.P
STATE_WIDTH = 8
RATE = 4  # rate occupies positions 0..4; capacity 4..8
DIGEST_SIZE = 4
NUM_ROUNDS = 7


def apply_permutation_ints(state):
    for r in range(NUM_ROUNDS - 1):
        state = _non_linear_ints(state)
        state = _mds_ints(state)
        state = [(x + c) % P for x, c in zip(state, ARK_G[r])]
    state = _non_linear_ints(state)
    state = _mds_ints(state)
    return state


def _non_linear_ints(state):
    s = list(state)
    s[0] = pow(s[0], INV_ALPHA, P)
    s[1] = pow(s[1], 7, P)
    for i in range(2, STATE_WIDTH):
        prev = 0 if i == 2 else s[i - 1]
        l = ((i - 1) * s[0] + s[1] + prev) % P
        s[i] = s[i] * ((l * l + ALPHA_G[i - 2] * l + BETA_G[i - 2]) % P) % P
    return s


def _mds_ints(state):
    return [
        sum(MDS_G[i][j] * state[j] for j in range(STATE_WIDTH)) % P
        for i in range(STATE_WIDTH)
    ]


def _jive_sum(initial, final):
    return [
        (initial[i] + initial[DIGEST_SIZE + i] + final[i] + final[DIGEST_SIZE + i]) % P
        for i in range(DIGEST_SIZE)
    ]


# -- vectorized limb permutation --------------------------------------------

_CONSTS = None


def _limb_consts():
    global _CONSTS
    if _CONSTS is None:
        mds = [[gl.from_int(MDS_G[i][j], (1,)) for j in range(STATE_WIDTH)] for i in range(STATE_WIDTH)]
        ark = [[gl.from_int(c, (1,)) for c in row] for row in ARK_G]
        alpha = [gl.from_int(c, (1,)) for c in ALPHA_G]
        beta = [gl.from_int(c, (1,)) for c in BETA_G]
        _CONSTS = (mds, ark, alpha, beta)
    return _CONSTS


def apply_permutation_limbs(state, xp):
    mds, ark, alpha, beta = _limb_consts()

    def bc(c, like):
        return (
            xp.broadcast_to(xp.asarray(c[0]), like[0].shape),
            xp.broadcast_to(xp.asarray(c[1]), like[1].shape),
        )

    def non_linear(s):
        s = list(s)
        s[0] = gl.exp_int(s[0], INV_ALPHA)
        s[1] = gl.exp7(s[1])
        for i in range(2, STATE_WIDTH):
            prev = gl.zeros(s[0][0].shape, xp) if i == 2 else s[i - 1]
            l = gl.add(gl.add(gl.mul_small(s[0], i - 1), s[1]), prev)
            quad = gl.add(
                gl.add(gl.square(l), gl.mul(bc(alpha[i - 2], l), l)), bc(beta[i - 2], l)
            )
            s[i] = gl.mul(s[i], quad)
        return s

    def apply_mds(s):
        return gl.mds_circulant(s, tuple(MDS_G[0]))

    for r in range(NUM_ROUNDS - 1):
        state = non_linear(state)
        state = apply_mds(state)
        state = [gl.add(x, bc(ark[r][i], x)) for i, x in enumerate(state)]
    state = non_linear(state)
    state = apply_mds(state)
    return state


class GriffinJive64_256:
    NAME = "griffin_jive64_256"
    DIGEST_BYTES = 32
    COLLISION_RESISTANCE = 128

    @staticmethod
    def hash(data: bytes) -> bytes:
        n = len(data)
        num_elements = n // 7 if n % 7 == 0 else n // 7 + 1
        state = [0] * STATE_WIDTH
        if num_elements % RATE != 0:
            state[4] = 1  # CAPACITY_RANGE.start
        i = 0
        for k in range(num_elements):
            chunk = data[k * 7 : (k + 1) * 7]
            if k < num_elements - 1:
                buf = chunk + b"\x00"
            else:
                buf = chunk + b"\x01" + b"\x00" * (7 - len(chunk))
            state[i] = (state[i] + int.from_bytes(buf, "little")) % P
            i += 1
            if i % RATE == 0:
                state = apply_permutation_ints(state)
                i = 0
        if i > 0:
            state[i] = 1
            i += 1
            while i != RATE:
                state[i] = 0
                i += 1
            state = apply_permutation_ints(state)
        return _elems_bytes(state[:DIGEST_SIZE])

    @classmethod
    def hash_elements(cls, elements, elem_bytes: int = 8) -> bytes:
        assert elem_bytes == 8, "algebraic hashers are native to f64" 
        flat = []
        for e in elements:
            flat.extend(fs.components(e))
        state = [0] * STATE_WIDTH
        if len(flat) % RATE != 0:
            state[4] = 1
        i = 0
        for e in flat:
            state[i] = (state[i] + e) % P
            i += 1
            if i % RATE == 0:
                state = apply_permutation_ints(state)
                i = 0
        if i > 0:
            state[i] = 1
            i += 1
            while i != RATE:
                state[i] = 0
                i += 1
            state = apply_permutation_ints(state)
        return _elems_bytes(state[:DIGEST_SIZE])

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
        state[4] = value % P
        if value < P:
            state[7] = DIGEST_SIZE + 1
        else:
            state[5] = value // P
            state[7] = DIGEST_SIZE + 2
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
            state[4] = (
                xp.broadcast_to(xp.asarray(one[0]), batch).astype(np.uint32),
                xp.broadcast_to(xp.asarray(one[1]), batch).astype(np.uint32),
            )
        i = 0
        for k in range(n_elems):
            state[i] = gl.add(state[i], (lo[..., k], hi[..., k]))
            i += 1
            if i % RATE == 0:
                state = apply_permutation_limbs(state, xp)
                i = 0
        if i > 0:
            one = gl.from_int(1)
            state[i] = (
                xp.broadcast_to(xp.asarray(one[0]), batch).astype(np.uint32),
                xp.broadcast_to(xp.asarray(one[1]), batch).astype(np.uint32),
            )
            i += 1
            while i != RATE:
                state[i] = gl.zeros(batch, xp)
                i += 1
            state = apply_permutation_limbs(state, xp)
        parts = []
        for i in range(DIGEST_SIZE):
            parts.append(state[i][0])
            parts.append(state[i][1])
        return xp.stack(parts, axis=-1)

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


def _elems_bytes(elems) -> bytes:
    return b"".join(int(e).to_bytes(8, "little") for e in elems)
