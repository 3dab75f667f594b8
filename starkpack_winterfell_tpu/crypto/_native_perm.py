"""Lazy native-permutation dispatch shared by the Rescue-family host
hashers (Rp64_256, Rp62_248, RpJive64_256).  The C kernel
(native/rescue_perm.c) runs the identical round function ~100x faster than
python-int modexp; callers fall back to their python permutation when no
compiler is available."""

from __future__ import annotations

import ctypes

import numpy as np


def words_to_u64(arr, n_elems):
    """(n, >=2*n_elems) u32 LE word rows -> (n, n_elems) u64 values."""
    a = arr.astype(np.uint64)
    return np.ascontiguousarray(
        a[:, 0 : 2 * n_elems : 2] | (a[:, 1 : 2 * n_elems : 2] << np.uint64(32))
    )


def u64_to_words(vals):
    """(n, d) u64 -> (n, 2d) u32 LE words."""
    n, d = vals.shape
    out = np.empty((n, 2 * d), dtype=np.uint32)
    out[:, 0::2] = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    out[:, 1::2] = (vals >> np.uint64(32)).astype(np.uint32)
    return out


def make_native_sponge(name, P, width, rounds, alpha, inv_alpha, mds, ark1,
                       ark2, rate_start, rate, tag_index, digest_start,
                       digest_size):
    """(hash_rows, merge_rows) operating on u64 element arrays via the C
    sponge, or None.  hash_rows: (n, row_len) -> (n, digest_size);
    merge_rows: two (n, digest_size) -> (n, digest_size)."""
    try:
        from ..native import get_rescue_perm

        nat = get_rescue_perm(name, P, width, rounds, alpha, inv_alpha, mds,
                              ark1, ark2)
    except Exception:
        nat = None
    if nat is None:
        return None
    lib, slot = nat
    vp = ctypes.c_void_p

    def hash_rows(vals):
        vals = np.ascontiguousarray(vals, dtype=np.uint64)
        n, row_len = vals.shape
        out = np.empty((n, digest_size), dtype=np.uint64)
        lib.rp_hash_elements_batch(
            slot, vals.ctypes.data_as(vp), n, row_len, rate_start, rate,
            tag_index, digest_start, digest_size, out.ctypes.data_as(vp),
        )
        return out

    def merge_rows(l, r):
        l = np.ascontiguousarray(l, dtype=np.uint64)
        r = np.ascontiguousarray(r, dtype=np.uint64)
        n = l.shape[0]
        out = np.empty((n, digest_size), dtype=np.uint64)
        lib.rp_merge_batch(
            slot, l.ctypes.data_as(vp), r.ctypes.data_as(vp), n, rate_start,
            tag_index, digest_start, digest_size, out.ctypes.data_as(vp),
        )
        return out

    return hash_rows, merge_rows


def make_native_permute(name, P, width, rounds, alpha, inv_alpha, mds, ark1,
                        ark2):
    """A `permute(list[int]) -> list[int]` bound to a registered config
    slot, or None if the native tier is unavailable."""
    try:
        from ..native import get_rescue_perm

        nat = get_rescue_perm(name, P, width, rounds, alpha, inv_alpha, mds,
                              ark1, ark2)
    except Exception:
        nat = None
    if nat is None:
        return None
    lib, slot = nat
    vp = ctypes.c_void_p

    def permute(state):
        arr = np.array(state, dtype=np.uint64)
        lib.rp_permute_batch(slot, arr.ctypes.data_as(vp), 1)
        return arr.tolist()

    return permute
