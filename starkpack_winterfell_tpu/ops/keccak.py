"""Keccak-f[1600] / SHA3-256 vectorized on u32 lane pairs.

Device path for the reference's Sha3_256 hasher (crypto/src/hash/sha/mod.rs):
64-bit lanes are (lo, hi) uint32 pairs, rounds are pure XOR/AND/NOT/rotate —
identical under numpy and jax.numpy.
"""

from __future__ import annotations

import numpy as np

from . import gl64 as gl

_U32 = np.uint32

RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

# rotation offsets r[x][y]
ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]

RATE_BYTES = 136  # SHA3-256
RATE_LANES = RATE_BYTES // 8


def _rotl(lane, r):
    lo, hi = lane
    r = r % 64
    if r == 0:
        return lane
    if r < 32:
        return (
            (lo << r) | (hi >> (32 - r)),
            (hi << r) | (lo >> (32 - r)),
        )
    if r == 32:
        return hi, lo
    r -= 32
    return (
        (hi << r) | (lo >> (32 - r)),
        (lo << r) | (hi >> (32 - r)),
    )


def _xor(a, b):
    return a[0] ^ b[0], a[1] ^ b[1]


def _keccak_round(A, rc_lo, rc_hi):
    """One keccak-f round on a 5x5 list of (lo, hi) pairs; rc as u32 values."""
    # theta
    C = [A[x][0] for x in range(5)]
    for x in range(5):
        for y in range(1, 5):
            C[x] = _xor(C[x], A[x][y])
    D = [_xor(C[(x - 1) % 5], _rotl(C[(x + 1) % 5], 1)) for x in range(5)]
    for x in range(5):
        for y in range(5):
            A[x][y] = _xor(A[x][y], D[x])
    # rho + pi
    B = [[None] * 5 for _ in range(5)]
    for x in range(5):
        for y in range(5):
            B[y][(2 * x + 3 * y) % 5] = _rotl(A[x][y], ROT[x][y])
    # chi
    for x in range(5):
        for y in range(5):
            nx = B[(x + 1) % 5][y]
            nnx = B[(x + 2) % 5][y]
            A[x][y] = (
                B[x][y][0] ^ ((~nx[0]) & nnx[0]),
                B[x][y][1] ^ ((~nx[1]) & nnx[1]),
            )
    # iota
    A[0][0] = (A[0][0][0] ^ rc_lo, A[0][0][1] ^ rc_hi)
    return A


def keccak_f(lanes):
    """lanes: 5x5 list of (lo, hi) pairs; returns new 5x5 list.

    Under jax the 24 rounds roll into a fori_loop (unrolled keccak makes
    XLA:CPU compilation pathological, same as long exponentiation chains)."""
    A = [[lanes[x][y] for y in range(5)] for x in range(5)]
    xp = gl._xp(A[0][0][0])
    if xp is np:
        for rnd in range(24):
            rc = RC[rnd]
            A = _keccak_round(A, _U32(rc & 0xFFFFFFFF), _U32(rc >> 32))
        return A

    import jax
    import jax.numpy as jnp

    rc_lo = jnp.asarray(np.array([rc & 0xFFFFFFFF for rc in RC], dtype=np.uint32))
    rc_hi = jnp.asarray(np.array([rc >> 32 for rc in RC], dtype=np.uint32))

    def body(rnd, flat):
        A = [[flat[5 * x + y] for y in range(5)] for x in range(5)]
        A = _keccak_round(A, rc_lo[rnd], rc_hi[rnd])
        return tuple(A[x][y] for x in range(5) for y in range(5))

    flat = tuple(A[x][y] for x in range(5) for y in range(5))
    flat = jax.lax.fori_loop(0, 24, body, flat)
    return [[flat[5 * x + y] for y in range(5)] for x in range(5)]


def sha3_256_words(words, byte_len: int):
    """SHA3-256 of rows of little-endian u32 words (byte_len must be a
    multiple of 8 — field-element rows always are).  Returns (..., 8) u32."""
    # host fast path: hash_words semantics == SHA3 of the LE byte
    # serialization, so hashlib's C keccak does each row in one shot (the
    # vectorized lane-pair kernel below pays ~10k tiny numpy calls per
    # absorb chain — seconds for wide aggregated-proof leaf rows)
    if isinstance(words, np.ndarray):
        import hashlib

        flat = np.ascontiguousarray(
            words.reshape(-1, words.shape[-1]).astype("<u4")
        )
        n_words = byte_len // 4
        out = np.empty((flat.shape[0], 8), dtype=_U32)
        for i in range(flat.shape[0]):
            d = hashlib.sha3_256(flat[i, :n_words].tobytes()).digest()
            out[i] = np.frombuffer(d, dtype="<u4")
        return out.reshape(words.shape[:-1] + (8,))
    xp = gl._xp(words)
    batch = words.shape[:-1]
    assert byte_len % 8 == 0
    n_lanes_msg = byte_len // 8

    z = xp.zeros(batch, dtype=_U32)
    lanes = [[(z, z) for _ in range(5)] for _ in range(5)]

    # build padded message lanes: message || 0x06 .. 0x80 per keccak padding
    n_blocks = n_lanes_msg // RATE_LANES + 1
    msg_lanes = []
    for i in range(n_lanes_msg):
        msg_lanes.append((words[..., 2 * i], words[..., 2 * i + 1]))
    # pad lane: 0x06 at position n_lanes_msg (byte 0 of that lane)
    total_lanes = n_blocks * RATE_LANES
    pad = []
    for i in range(n_lanes_msg, total_lanes):
        lo = _U32(0)
        hi = _U32(0)
        if i == n_lanes_msg:
            lo = _U32(0x06)
        if i == total_lanes - 1:
            hi = hi | _U32(0x80000000)
        pad.append((z + lo, z + hi))
    msg_lanes += pad

    for b in range(n_blocks):
        blk = msg_lanes[b * RATE_LANES : (b + 1) * RATE_LANES]
        for i, lane in enumerate(blk):
            x, y = i % 5, i // 5
            lanes[x][y] = _xor(lanes[x][y], lane)
        lanes = keccak_f(lanes)

    out = []
    for i in range(4):  # 4 lanes = 32 bytes
        x, y = i % 5, i // 5
        out.append(lanes[x][y][0])
        out.append(lanes[x][y][1])
    return xp.stack(out, axis=-1)


def sha3_merge_words(l, r):
    """SHA3-256 of two concatenated 32-byte digests (8 lanes)."""
    xp = gl._xp(l)
    cat = xp.concatenate([l, r], axis=-1)
    return sha3_256_words(cat, 64)
