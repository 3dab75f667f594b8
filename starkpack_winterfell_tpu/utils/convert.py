"""Conversions between host scalar elements (ints/tuples), u32-limb arrays,
and hash-word layouts."""

from __future__ import annotations

import numpy as np

from ..math import scalar as fs
from ..ops import gl64 as gl


def elems_to_limbs(elements, deg: int):
    """List of ints/tuples -> tuple of `deg` (lo, hi) numpy pairs, shape (n,)."""
    comps = []
    for c in range(deg):
        arr = np.array(
            [fs.components(fs.embed(e, deg))[c] for e in elements], dtype=np.uint64
        )
        comps.append(gl.from_u64(arr))
    return tuple(comps)


def limbs_to_elems(comps, deg: int):
    """Tuple of `deg` (lo, hi) pairs with shape (n,) -> list of ints/tuples."""
    u64s = [gl.to_u64(c) for c in comps]
    n = u64s[0].shape[0]
    if deg == 1:
        return [int(v) for v in u64s[0]]
    return [tuple(int(u64s[c][i]) for c in range(deg)) for i in range(n)]


def rows_to_words(comps, deg: int):
    """Row data -> BLAKE3 word layout.

    comps: tuple of `deg` (lo, hi) pairs, each shaped (..., W) where W is the
    number of elements per row.  Elements serialize as canonical LE u64 per
    component in order, i.e. words [c0.lo, c0.hi, c1.lo, c1.hi, ...] per
    element.  Returns (..., W * deg * 2) uint32 word array.
    """
    xp = gl._xp(comps[0][0])
    parts = []
    for c in range(deg):
        lo, hi = comps[c]
        parts.append(xp.stack([lo, hi], axis=-1))  # (..., W, 2)
    stacked = xp.stack(parts, axis=-2)  # (..., W, deg, 2)
    shape = stacked.shape[:-3] + (stacked.shape[-3] * deg * 2,)
    return stacked.reshape(shape)


def hash_element_rows(hasher, rows, deg: int, spec=None):
    """Vectorized hash_elements over uniform rows of elements — one
    hash_words call instead of a per-row host loop (hash_words implements
    hash_elements semantics byte-for-byte for every registered hasher).
    ``spec`` selects the base field (default Goldilocks)."""
    n = len(rows)
    width = len(rows[0])
    if spec is not None and spec.name != "f64":
        from ..ops.backend import get_backend

        B = get_backend(spec.name)
        flat = [e for row in rows for e in row]
        comps = B.elems_to_limbs(flat, deg)
        comps = tuple(B.cmap(lambda l: l.reshape(n, width), c) for c in comps)
        words = B.rows_to_words(comps, deg)
        digests = hasher.hash_words(words, width * deg * spec.ELEMENT_BYTES)
        return [hasher.digest_to_bytes(digests[i]) for i in range(n)]
    if deg == 1:
        arr = np.array(rows, dtype=np.uint64)[None]
    else:
        arr = np.zeros((deg, n, width), dtype=np.uint64)
        for i, row in enumerate(rows):
            for j, e in enumerate(row):
                comps = fs.components(fs.embed(e, deg))
                for c in range(deg):
                    arr[c, i, j] = comps[c]
    comps = tuple(gl.from_u64(arr[c]) for c in range(deg))
    words = rows_to_words(comps, deg)
    digests = hasher.hash_words(words, width * deg * 8)
    return [hasher.digest_to_bytes(digests[i]) for i in range(n)]


def scalar_to_limbs(v, deg: int, shape=(1,)):
    """Single element -> tuple of `deg` (lo, hi) pairs broadcast to shape."""
    comps = fs.components(fs.embed(v, deg))
    return tuple(gl.from_int(c, shape) for c in comps)
