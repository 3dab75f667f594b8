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


def _build(name: str, src: str):
    so = os.path.join(_DIR, f"lib{name}.so")
    csrc = os.path.join(_DIR, src)
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(csrc):
        for cc in ("cc", "gcc", "clang"):
            try:
                subprocess.run(
                    [cc, "-O3", "-shared", "-fPIC", csrc, "-o", so],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
                break
            except (OSError, subprocess.SubprocessError):
                continue
        else:
            return None
    return ctypes.CDLL(so)


def get_blake3():
    """ctypes handle for b3_compress_batch, or None if unavailable."""
    if "b3" not in _CACHE:
        lib = _build("starkb3", "blake3_compress.c")
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
        _CACHE["b3"] = lib
    return _CACHE["b3"]
