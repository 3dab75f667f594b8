"""Native (C) host kernels — the runtime tier around the JAX compute path.

Each kernel is a single C file compiled on first use into a shared library
next to its source (cached by mtime) and loaded through ctypes.  Loading is
best-effort: if no C compiler is available the callers fall back to their
pure-numpy implementations, so the package stays importable anywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_CACHE: dict = {}


def _build(name: str, src: str, extra=()):
    so = os.path.join(_DIR, f"lib{name}.so")
    csrc = os.path.join(_DIR, src)
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(csrc):
        done = False
        for flags in ((*extra,), ()) if extra else ((),):
            for cc in ("cc", "gcc", "clang"):
                try:
                    subprocess.run(
                        [cc, "-O3", "-shared", "-fPIC", *flags, csrc, "-o", so],
                        check=True,
                        capture_output=True,
                        timeout=120,
                    )
                    done = True
                    break
                except (OSError, subprocess.SubprocessError):
                    continue
            if done:
                break
        if not done:
            return None
    return ctypes.CDLL(so)


def get_blake3():
    """ctypes handle for b3_compress_batch, or None if unavailable."""
    if "b3" not in _CACHE:
        lib = _build("starkb3", "blake3_compress.c", extra=("-fopenmp",))
        if lib is not None:
            lib.b3_compress_batch.argtypes = [
                ctypes.c_void_p,  # cv (k x 8 u32)
                ctypes.c_void_p,  # blocks (k x 16 u32)
                ctypes.c_uint64,  # counter
                ctypes.c_uint32,  # block_len
                ctypes.c_uint32,  # flags
                ctypes.c_size_t,  # k
                ctypes.c_void_p,  # out (k x 8 u32)
            ]
            lib.b3_compress_batch.restype = None
            lib.b3_hash_bytes.argtypes = [
                ctypes.c_char_p, ctypes.c_uint64, ctypes.c_void_p,
            ]
            lib.b3_hash_bytes.restype = None
            lib.b3_hash_bytes_many.argtypes = [
                ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64,
                ctypes.c_void_p,
            ]
            lib.b3_hash_bytes_many.restype = None
            lib.b3_hash_rows_strided.argtypes = [
                ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
                ctypes.c_uint64, ctypes.c_void_p,
            ]
            lib.b3_hash_rows_strided.restype = None
            lib.b3_batch_root.argtypes = [
                ctypes.c_char_p,  # leaves (n_leaves x D bytes)
                ctypes.c_int64,   # n_leaves
                ctypes.c_void_p,  # indexes (u64)
                ctypes.c_int64,   # n_idx
                ctypes.c_char_p,  # node_data
                ctypes.c_void_p,  # node_counts (i32)
                ctypes.c_int64,   # n_vec
                ctypes.c_int32,   # depth
                ctypes.c_int32,   # digest bytes
                ctypes.c_void_p,  # out_root (D bytes)
            ]
            lib.b3_batch_root.restype = ctypes.c_int
        _CACHE["b3"] = lib
    return _CACHE["b3"]


def get_builders():
    """ctypes handle for the sequential-chain trace builders
    (builders.cpp), or None if no compiler is available.

    The chain workloads are one long scalar dependency (rescue_chain's
    x^(1/7) is ~98 serial multiplies per round), so neither the TPU nor
    SIMD width helps — the reference builds them with a sequential row
    scan on the CPU (prover/src/trace/trace_table.rs:230-243); these are
    the native equivalent."""
    if "builders" not in _CACHE:
        lib = _build("starkbuilders", "builders.cpp")
        if lib is not None:
            u64 = ctypes.c_uint64
            p = ctypes.c_void_p
            lib.rescue_chain_trace.argtypes = [p, u64, p, p, p, u64, p]
            lib.rescue_chain_trace.restype = None
            lib.do_work_chain.argtypes = [u64, u64, p]
            lib.do_work_chain.restype = None
            lib.fib_trace.argtypes = [u64, p]
            lib.fib_trace.restype = None
        _CACHE["builders"] = lib
    return _CACHE["builders"]


_RP_SLOTS: dict = {}


def get_rescue_perm(name: str, P: int, width: int, rounds: int, alpha: int,
                    inv_alpha: int, mds, ark1, ark2):
    """(lib, slot) for a registered Rescue-Prime permutation config, or
    None if no compiler.  mds/ark1/ark2 are nested int lists; each distinct
    `name` gets its own config slot in rescue_perm.c."""
    if "rp" not in _CACHE:
        lib = _build("starkrp", "rescue_perm.c", extra=("-fopenmp",))
        if lib is not None:
            u64 = ctypes.c_uint64
            i32 = ctypes.c_int
            p = ctypes.c_void_p
            lib.rp_init.argtypes = [i32, u64, i32, i32, u64, u64, p, p, p]
            lib.rp_permute_batch.argtypes = [i32, p, u64]
            lib.rp_hash_elements_batch.argtypes = [
                i32, p, u64, u64, i32, i32, i32, i32, i32, p,
            ]
            lib.rp_merge_batch.argtypes = [i32, p, p, u64, i32, i32, i32, i32, p]
        _CACHE["rp"] = lib
    lib = _CACHE["rp"]
    if lib is None:
        return None
    if name not in _RP_SLOTS:
        import numpy as np

        slot = len(_RP_SLOTS)
        if slot >= 8:
            return None
        m = np.array([v for row in mds for v in row], dtype=np.uint64)
        a1 = np.array([v for r in ark1 for v in r], dtype=np.uint64)
        a2 = np.array([v for r in ark2 for v in r], dtype=np.uint64)
        pv = ctypes.c_void_p
        lib.rp_init(slot, P, width, rounds, alpha, inv_alpha,
                    m.ctypes.data_as(pv), a1.ctypes.data_as(pv),
                    a2.ctypes.data_as(pv))
        _RP_SLOTS[name] = slot
    return lib, _RP_SLOTS[name]


def get_rescue128():
    """ctypes handle for the f128 Rescue128 wallet kernels (rescue128.c),
    initialized with the protocol constants; None if no compiler."""
    if "r128" not in _CACHE:
        lib = _build("starkr128", "rescue128.c", extra=("-fopenmp",))
        if lib is not None:
            import numpy as np

            from ..crypto import rescue128_constants as rc

            u64 = ctypes.c_uint64
            p = ctypes.c_void_p
            lib.r128_init.argtypes = [p, p, p]
            lib.r128_digest_batch.argtypes = [p, u64, u64, p]
            lib.lamport128_trace.argtypes = [u64, p, p, p, p, p]
            lib.lamport128_trace_batch.argtypes = [u64, u64, p, p, p, p, p]

            def pairs(vals):
                flat = []
                for v in vals:
                    flat.append(v & 0xFFFFFFFFFFFFFFFF)
                    flat.append(v >> 64)
                return np.array(flat, dtype=np.uint64)

            mds = pairs([v for row in rc.MDS for v in row])
            ark = pairs([v for r in rc.ARK for v in r])
            inv_a = pairs([rc.INV_ALPHA])
            lib.r128_init(
                mds.ctypes.data_as(p), ark.ctypes.data_as(p),
                inv_a.ctypes.data_as(p),
            )
            lib._keepalive = (mds, ark, inv_a)
        _CACHE["r128"] = lib
    return _CACHE["r128"]


def get_gl64mod():
    """ctypes handle for the Goldilocks batch mod-arith kernels
    (gl64_mod.c: gl_mulmod/gl_addmod/gl_submod), or None if no compiler."""
    if "gl64" not in _CACHE:
        lib = _build("starkgl64", "gl64_mod.c", extra=("-fopenmp",))
        if lib is not None:
            p = ctypes.c_void_p
            sz = ctypes.c_size_t
            for fn in ("gl_mulmod", "gl_addmod", "gl_submod"):
                f = getattr(lib, fn)
                f.argtypes = [p, p, p, p, p, p, sz, sz]
                f.restype = None
            lib.gl_matvec.argtypes = [sz, p, p, p, sz]
            lib.gl_matvec.restype = None
            lib.gl_dot.argtypes = [sz, p, p, p, p, sz]
            lib.gl_dot.restype = None
            lib.gl_ntt_stage.argtypes = [p, p, p, p, p, p, sz, sz]
            lib.gl_ntt_stage.restype = None
            lib.gl_expmod.argtypes = [p, p, ctypes.c_uint64, p, p, sz]
            lib.gl_expmod.restype = None
            lib.gl_syndiv.argtypes = [p, p, ctypes.c_uint64, p, p, sz, sz]
            lib.gl_syndiv.restype = None
            lib.gl_batchinv.argtypes = [p, p, p, p, sz]
            lib.gl_batchinv.restype = None
            lib.gl_gather.argtypes = [p, p, p, p, p, sz, sz]
            lib.gl_gather.restype = None
        _CACHE["gl64"] = lib
    return _CACHE["gl64"]


def get_verify_scalar():
    """ctypes handle for the native verifier scalar loops
    (verify_scalar.c: FRI layer fold, remainder check, DEEP composition),
    or None if no compiler."""
    if "vs" not in _CACHE:
        lib = _build("starkvs", "verify_scalar.c")
        if lib is not None:
            p = ctypes.c_void_p
            i64 = ctypes.c_int64
            i32 = ctypes.c_int
            u64 = ctypes.c_uint64
            lib.vs_fold_layer.argtypes = [
                p, p, i32, p, i32, i32,   # p, r2, d, qcoeffs, elem_bytes, N
                p, i64,                   # values_bytes, nrows
                p, i64,                   # evals_in, npos
                p, p, p,                  # qmap_row, qmap_col, folded_pos
                p, p, p, p,               # g, offs, alpha, idft
                p,                        # out_evals
            ]
            lib.vs_fold_layer.restype = i32
            lib.vs_remainder_check.argtypes = [
                p, p, i32, p, i32,
                p, i64,                   # rem_bytes, nrem
                p, i64,                   # positions, npos
                p, p, p,                  # g, offs, evals
            ]
            lib.vs_remainder_check.restype = i32
            lib.vs_deep_trace.argtypes = [
                p, p, i32, p, i32,
                p, i64, i64, i64, i32,    # table_words, n, q, w, d_in
                p, p, p,                  # ood_cur, ood_nxt, cc
                p, p, i32,                # t1_num, t2_num, accumulate
            ]
            lib.vs_deep_trace.restype = i32
            lib.vs_deep_combine.argtypes = [
                p, p, i32, p, i32,
                i64, p,                   # q, positions
                p, p, p, p,               # g_lde, offs, z, zg
                p, p,                     # t1_num, t2_num
                p, i64, p, p,             # cons_words, m, ood_c, cc2
                p,                        # out
            ]
            lib.vs_deep_combine.restype = i32
            lib.vs_test_ops.argtypes = [p, p, i32, p, p, p, u64, u64, p]
            lib.vs_test_ops.restype = i32
            lib.vs_poly_eval.argtypes = [p, p, i32, p, p, i64, p, p]
            lib.vs_poly_eval.restype = i32
            lib.vs_barycentric_eval.argtypes = [p, p, i32, p, p, i64, p, p, p]
            lib.vs_barycentric_eval.restype = i32
        _CACHE["vs"] = lib
    return _CACHE["vs"]


def get_limbmod():
    """ctypes handle for the f62/f128 batch field kernels (limb_mod.c),
    or None if no compiler."""
    if "limb" not in _CACHE:
        lib = _build("starklimb", "limb_mod.c", extra=("-fopenmp",))
        if lib is not None:
            p = ctypes.c_void_p
            sz = ctypes.c_size_t
            lib.f62_mulmod.argtypes = [p, p, p, p, p, p, sz, sz]
            lib.f62_mulmod.restype = None
            lib.f62_ntt_stage.argtypes = [p, p, p, p, p, p, sz, sz]
            lib.f62_ntt_stage.restype = None
            lib.f62_matvec.argtypes = [sz, p, p, p, sz]
            lib.f62_matvec.restype = None
            lib.f128_mulmod.argtypes = [p, p, p, sz, sz]
            lib.f128_mulmod.restype = None
            lib.f128_ntt_stage.argtypes = [p, p, p, sz, sz]
            lib.f128_ntt_stage.restype = None
            lib.f128_matvec.argtypes = [sz, p, p, p, sz]
            lib.f128_matvec.restype = None
        _CACHE["limb"] = lib
    return _CACHE["limb"]
