"""BLAKE3 implemented from the public spec, in two forms:

1. ``hash_bytes``: host-side, arbitrary-length input (used by the Fiat-Shamir
   channel, which is inherently sequential and byte-oriented — reference
   crypto/src/hash/blake/mod.rs wraps the upstream blake3 crate).
2. ``hash_rows_words`` / ``merge_rows`` / ``merge_with_int_rows``: vectorized
   over rows of u32 words, pure uint32 add/xor/rotate — runs identically under
   numpy (host) and jax.numpy (TPU VPU), used for Merkle leaf/node hashing
   (reference row_matrix.rs:183-238, merkle/mod.rs:350-374).

The compression function is written against the BLAKE3 paper/spec (the
reference consumes the upstream `blake3` crate; there is no code to port).
All digests are 8 u32 words (= 32 bytes, little-endian words).
"""

from __future__ import annotations

import numpy as np

from . import gl64 as gl

IV = (
    0x6A09E667,
    0xBB67AE85,
    0x3C6EF372,
    0xA54FF53A,
    0x510E527F,
    0x9B05688C,
    0x1F83D9AB,
    0x5BE0CD19,
)

MSG_PERMUTATION = (2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8)

CHUNK_START = 1
CHUNK_END = 2
PARENT = 4
ROOT = 8

CHUNK_LEN = 1024
BLOCK_LEN = 64

_U32 = np.uint32


def _rotr(x, r, xp):
    return (x >> r) | (x << (32 - r))


def _g(state, a, b, c, d, mx, my, xp):
    state[a] = state[a] + state[b] + mx
    state[d] = _rotr(state[d] ^ state[a], 16, xp)
    state[c] = state[c] + state[d]
    state[b] = _rotr(state[b] ^ state[c], 12, xp)
    state[a] = state[a] + state[b] + my
    state[d] = _rotr(state[d] ^ state[a], 8, xp)
    state[c] = state[c] + state[d]
    state[b] = _rotr(state[b] ^ state[c], 7, xp)


def compress(cv, block_words, counter: int, block_len: int, flags: int, xp=np):
    """One BLAKE3 compression.  ``cv`` is a list/tuple of 8 u32 arrays,
    ``block_words`` of 16; all arrays share a (possibly empty) batch shape.
    Returns the 8-word output CV (truncated output)."""
    if xp is np:
        lib = _native_lib()
        if lib is not None:
            return _compress_native(lib, cv, block_words, counter, block_len, flags)
        # numpy warns on *scalar* uint32 wraparound (arrays don't); wrapping
        # is exactly what we want here
        with np.errstate(over="ignore"):
            return _compress_impl(cv, block_words, counter, block_len, flags, xp)
    return _compress_impl(cv, block_words, counter, block_len, flags, xp)


def _native_lib():
    from ..native import get_blake3

    return get_blake3()


def _compress_native(lib, cv, block_words, counter, block_len, flags):
    """Route one batched compression through the C kernel (native/)."""
    import ctypes

    shape = np.broadcast_shapes(*(np.shape(a) for a in cv), *(np.shape(a) for a in block_words))
    k = int(np.prod(shape)) if shape else 1
    cvb = np.empty(shape + (8,), dtype=_U32)
    for i in range(8):
        cvb[..., i] = cv[i]
    blk = np.empty(shape + (16,), dtype=_U32)
    for i in range(16):
        blk[..., i] = block_words[i]
    out = np.empty((k, 8), dtype=_U32)
    lib.b3_compress_batch(
        cvb.ctypes.data_as(ctypes.c_void_p),
        blk.ctypes.data_as(ctypes.c_void_p),
        counter & 0xFFFFFFFFFFFFFFFF,
        block_len,
        flags,
        k,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    out = out.reshape(shape + (8,))
    return [out[..., i] for i in range(8)]


# PERM_TABLE[r][i] = index in the ORIGINAL message of word i at round r
_PERM_TABLE = np.zeros((7, 16), dtype=np.int32)
_PERM_TABLE[0] = np.arange(16)
for _r in range(1, 7):
    _PERM_TABLE[_r] = _PERM_TABLE[_r - 1][list(MSG_PERMUTATION)]


def _round(state, m, xp):
    _g(state, 0, 4, 8, 12, m[0], m[1], xp)
    _g(state, 1, 5, 9, 13, m[2], m[3], xp)
    _g(state, 2, 6, 10, 14, m[4], m[5], xp)
    _g(state, 3, 7, 11, 15, m[6], m[7], xp)
    _g(state, 0, 5, 10, 15, m[8], m[9], xp)
    _g(state, 1, 6, 11, 12, m[10], m[11], xp)
    _g(state, 2, 7, 8, 13, m[12], m[13], xp)
    _g(state, 3, 4, 9, 14, m[14], m[15], xp)


def _compress_impl(cv, block_words, counter: int, block_len: int, flags: int, xp):
    z = xp.zeros_like(cv[0])
    state = [
        cv[0] + z, cv[1] + z, cv[2] + z, cv[3] + z,
        cv[4] + z, cv[5] + z, cv[6] + z, cv[7] + z,
        z + _U32(IV[0]), z + _U32(IV[1]), z + _U32(IV[2]), z + _U32(IV[3]),
        z + _U32(counter & 0xFFFFFFFF), z + _U32((counter >> 32) & 0xFFFFFFFF),
        z + _U32(block_len), z + _U32(flags),
    ]
    m = [bw + z for bw in block_words]
    if xp is np:
        for rnd in range(7):
            _round(state, m, xp)
            if rnd < 6:
                m = [m[MSG_PERMUTATION[i]] for i in range(16)]
    else:
        # jax: roll the 7 rounds into a fori_loop with a gathered per-round
        # message permutation — ~7x smaller trace/compile graph
        import jax
        import jax.numpy as jnp

        m_stack = xp.stack(m, axis=0)  # (16, ...)
        perm = jnp.asarray(_PERM_TABLE)

        def body(r, st):
            st = list(st)
            mr = jnp.take(m_stack, perm[r], axis=0)
            ml = [mr[i] for i in range(16)]
            _round(st, ml, xp)
            return tuple(st)

        state = list(jax.lax.fori_loop(0, 7, body, tuple(state)))
    return [state[i] ^ state[i + 8] for i in range(8)]


# ---------------------------------------------------------------------------
# vectorized row hashing (device path)
# ---------------------------------------------------------------------------


def hash_words(words, byte_len: int, xp=None):
    # host numpy fast path: one native one-shot hash per row (the verifier
    # hashes a few hundred short rows; per-row C calls beat the vectorized
    # numpy compress orchestration below for host-sized batches)
    if isinstance(words, np.ndarray) and words.ndim == 2 and xp is None:
        lib = _native_lib()
        if lib is not None and hasattr(lib, "b3_hash_rows_strided"):
            import ctypes

            k = words.shape[0]
            raw = np.ascontiguousarray(words.astype("<u4"))
            row_bytes = raw.shape[1] * 4
            out = np.zeros((k, 8), dtype=np.uint32)
            # strided kernel hashes byte_len of each row_bytes-wide row in
            # place — no packed copy of the (possibly GB-scale) row matrix
            lib.b3_hash_rows_strided(
                raw.ctypes.data_as(ctypes.c_void_p), row_bytes, byte_len,
                k, out.ctypes.data_as(ctypes.c_void_p),
            )
            return out.astype(_U32)
    """Hash rows given as a (..., W) u32 array holding ``byte_len`` bytes of
    little-endian words (W = ceil(byte_len/4), zero-padded).  Vectorized over
    leading axes.  Returns (..., 8) u32 digests.

    Handles multi-chunk inputs (byte_len > 1024) with the static BLAKE3 chunk
    tree — shapes are static so the tree unrolls at trace time.
    """
    if xp is None:
        xp = gl._xp(words)
    assert words.shape[-1] == (byte_len + 3) // 4 or words.shape[-1] >= (byte_len + 3) // 4
    n_chunks = max(1, (byte_len + CHUNK_LEN - 1) // CHUNK_LEN)
    if n_chunks == 1:
        cv = _chunk_cv(words, 0, byte_len, 0, xp, root=True)
        return xp.stack(cv, axis=-1)
    # multi-chunk: compute per-chunk CVs then fold the parent tree
    cvs = []
    for ci in range(n_chunks):
        start = ci * CHUNK_LEN
        clen = min(CHUNK_LEN, byte_len - start)
        cvs.append(_chunk_cv(words, start, clen, ci, xp, root=False))
    root_cv = _parent_tree(cvs, xp)
    return xp.stack(root_cv, axis=-1)


def _chunk_cv(words, start_byte: int, chunk_len: int, counter: int, xp, root: bool):
    n_blocks = max(1, (chunk_len + BLOCK_LEN - 1) // BLOCK_LEN)
    z = xp.zeros(words.shape[:-1], dtype=_U32)
    cv = [z + _U32(v) for v in IV]
    w0 = start_byte // 4
    total_words = words.shape[-1]
    for b in range(n_blocks):
        blk_start = w0 + b * 16
        blen = min(BLOCK_LEN, chunk_len - b * BLOCK_LEN)
        blk = []
        # caller contract: words beyond byte_len are zero, so any available
        # word may be used verbatim and missing words are zero
        for i in range(16):
            wi = blk_start + i
            if wi < total_words:
                blk.append(words[..., wi])
            else:
                blk.append(z)
        flags = 0
        if b == 0:
            flags |= CHUNK_START
        if b == n_blocks - 1:
            flags |= CHUNK_END
            if root:
                flags |= ROOT
        cv = compress(cv, blk, counter, blen, flags, xp)
    return cv


def _parent_tree(cvs, xp):
    """Fold chunk CVs with the spec's left-largest-power-of-two tree."""

    def build(nodes, root):
        if len(nodes) == 1:
            return nodes[0]
        # left subtree = largest power of two strictly less than len
        left_n = 1 << (len(nodes) - 1).bit_length() - 1
        if left_n == len(nodes):
            left_n //= 2
        left = build(nodes[:left_n], False)
        right = build(nodes[left_n:], False)
        return _parent_cv(left, right, root, xp)

    return build(cvs, True)


def _parent_cv(l, r, root: bool, xp):
    z = xp.zeros_like(l[0])
    cv = [z + _U32(v) for v in IV]
    blk = list(l) + list(r)
    return compress(cv, blk, 0, BLOCK_LEN, PARENT | (ROOT if root else 0), xp)


def merge(l, r, xp=None):
    """Merkle 2-to-1 merge = blake3 of the 64 concatenated digest bytes
    (reference blake/mod.rs:32-34 — plain hash, NOT a parent node).
    l, r: (..., 8) u32 arrays.  Returns (..., 8)."""
    if xp is None:
        xp = gl._xp(l)
    z = xp.zeros(l.shape[:-1], dtype=_U32)
    cv = [z + _U32(v) for v in IV]
    blk = [l[..., i] for i in range(8)] + [r[..., i] for i in range(8)]
    out = compress(cv, blk, 0, BLOCK_LEN, CHUNK_START | CHUNK_END | ROOT, xp)
    return xp.stack(out, axis=-1)


def merge_with_int(seed, value: int, xp=None):
    """hash(seed_32_bytes || value_u64_le) — 40-byte single block
    (blake/mod.rs:36-41)."""
    if xp is None:
        xp = gl._xp(seed)
    z = xp.zeros(seed.shape[:-1], dtype=_U32)
    cv = [z + _U32(v) for v in IV]
    blk = [seed[..., i] for i in range(8)]
    blk.append(z + _U32(value & 0xFFFFFFFF))
    blk.append(z + _U32((value >> 32) & 0xFFFFFFFF))
    blk += [z] * 6
    out = compress(cv, blk, 0, 40, CHUNK_START | CHUNK_END | ROOT, xp)
    return xp.stack(out, axis=-1)


# ---------------------------------------------------------------------------
# host byte-oriented API
# ---------------------------------------------------------------------------


def hash_bytes(data: bytes, out_len: int = 32) -> bytes:
    """Full BLAKE3 of arbitrary-length input (host; one native call when a
    C compiler is available — the transcript issues thousands of tiny
    hashes and per-call numpy orchestration dominated verify time)."""
    lib = _native_lib()
    if lib is not None and hasattr(lib, "b3_hash_bytes"):
        out = np.zeros(8, dtype=np.uint32)
        import ctypes

        lib.b3_hash_bytes(data, len(data), out.ctypes.data_as(ctypes.c_void_p))
        return out.astype("<u4").tobytes()[:out_len]
    n = len(data)
    padded = data + b"\x00" * ((-n) % 4 if n % 4 else 0)
    words = np.frombuffer(padded, dtype="<u4").astype(_U32) if padded else np.zeros(0, _U32)
    # ensure at least one full block of words for indexing
    need = max(16, ((max(n, 1) + 3) // 4 + 15) // 16 * 16)
    if words.shape[0] < need:
        words = np.concatenate([words, np.zeros(need - words.shape[0], _U32)])
    digest = hash_words(words, n, np)
    return b"".join(int(w).to_bytes(4, "little") for w in digest)[:out_len]


def hash_bytes_many(datas, out_len: int = 32):
    """BLAKE3 of many EQUAL-LENGTH byte strings in one vectorized call.

    The host transcript/Merkle verification paths issue thousands of tiny
    (<= 64 byte) hashes; one numpy call over k rows costs the same as one
    scalar call (~0.3 ms), so batching is the entire win."""
    k = len(datas)
    n = len(datas[0])
    lib = _native_lib()
    if lib is not None and hasattr(lib, "b3_hash_bytes_many"):
        out = np.zeros((k, 8), dtype=np.uint32)
        import ctypes

        lib.b3_hash_bytes_many(b"".join(datas), n, k,
                               out.ctypes.data_as(ctypes.c_void_p))
        raw = out.astype("<u4").tobytes()
        return [raw[i * 32 : i * 32 + out_len] for i in range(k)]
    pad = (-n) % 4
    need = max(16, ((n + 3) // 4 + 15) // 16 * 16)
    tail = b"\x00" * (pad + 4 * (need - (n + pad) // 4))
    buf = b"".join(d + tail for d in datas)
    words = np.frombuffer(buf, dtype="<u4").astype(_U32).reshape(k, need)
    digests = hash_words(words, n, np)  # (k, 8)
    raw = digests.astype("<u4").tobytes()
    return [raw[i * 32 : i * 32 + out_len] for i in range(k)]


def digest_to_bytes(d) -> bytes:
    return np.asarray(d, dtype=np.uint32).astype("<u4").tobytes()


def digest_from_bytes(b: bytes) -> np.ndarray:
    assert len(b) == 32
    return np.frombuffer(b, dtype="<u4").astype(_U32)
