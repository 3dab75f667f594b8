"""MXU NTT tile: exact small-m limb-field DFTs as int8 matmuls.

The four-step NTT (ops/limb_field.py) reduces every large transform to
tile transforms of a few thousand points.  Those tiles run as radix-2
butterfly stages on the VPU today (plain XLA or the fused Pallas kernel) —
but the TPU's compute lives in the MXU, which is ~100x the VPU's int
throughput and is idle for the whole proving pipeline.  This module maps a
tile transform onto it exactly:

  Y = W @ X  (mod p),  W the m x m DFT matrix.

  1. Decompose W (host, cached) and X (on device) into BALANCED base-256
     digits d in [-128, 127]: a value < 2^(32k) takes dx = 4k+1 int8 digits.
  2. One int8 matmul emits the product's digit planes directly:
       C = A_toep @ (Xd as (d*m, B))  -> int32,  C viewed (2d-1, m, B)
     where A_toep is the block-Toeplitz arrangement A[k*m+o, j*m+t] =
     Wd[k-j][o, t] (zero blocks outside 0 <= k-j < d), so row-block k of
     the product is the antidiagonal sum C[k] = sum_{i+j=k} W_i @ X_j —
     the base-256 digit planes of the true integer result, with no
     (d^2 * m * B)-word intermediate ever touching HBM.  |C[k]| <=
     d * m * 128^2 < 2^31 for every tile this module serves, so int32
     MXU accumulation is EXACT (asserted statically below).
  3. Signed digit planes recombine into u32 limbs with int32-only
     arithmetic (16-bit lanes + one carry sweep — the TPU has no i64),
     then the field's generic E-fold reduction (_reduce) brings the
     m*p^2-bounded rows back to canonical n-limb form.

Cost model (v5e: ~4e14 int8 MAC/s MXU vs ~4e12 int op/s VPU): a dense
length-m matmul transform costs m*d^2 int8 MACs per element vs the radix-2
path's log2(m) limb muls (~60-250 VPU ops each), so the MXU wins for
m <= ~512 and the four-step recursion keeps every tile in that regime.

Bit-exact with LimbField.ntt — differential-tested on the CPU backend
(tests/test_mxu_ntt.py); engagement is gated on the TPU backend + measured
thresholds, like the Pallas kernels.

Reference parity note: the reference's segment FFT
(prover/src/matrix/segments.rs:232-271) is the same tile decomposition;
the int8-digit matmul body is TPU-native and has no reference counterpart.
"""

from __future__ import annotations

import functools

import numpy as np

_I8 = np.int8
_I32 = np.int32

# Engagement thresholds (same convention as ops/pallas/limb_kernel.py):
# tiles in [MIN_TILE, MAX_TILE] with enough independent transforms to fill
# the MXU's 128-lane tiles go to the matmul path.
MIN_TILE = 64
MAX_TILE = 256
MIN_BATCH = 128

# When the matmul tile is the engine, the four-step split targets tiles of
# this size (self-recursion handles any n as a tower of MAX_TILE levels).
SPLIT_CAP = 256

# None = auto: ON for the TPU backend, OFF on CPU (same gate as the Pallas
# kernels).  Measured on a v5e chip (2026-08-18, .exp/mxu_ab.py): f128
# 2^16x8 interpolate+LDE 47 -> 35 ms (x1.35) vs the VPU radix-2 tiles.
# Tests set True/False explicitly for bit-exactness differentials.
ENABLED = None

#: set (scoped) while tracing a Pallas kernel body: the int8 digit matrices
#: would be closure-captured constants, which pallas_call rejects — and an
#: MXU matmul inside a VPU-tile kernel is not the engagement this cost
#: model measured anyway.  The module global remains honored for backward
#: compatibility, but scoped suppression should use ``suppressed()`` (a
#: contextvar — reentrant and safe under concurrent traces; advisor r4).
SUPPRESS = False

import contextlib as _contextlib
import contextvars as _contextvars

_SUPPRESS_CTX = _contextvars.ContextVar("mxu_ntt_suppress", default=False)


@_contextlib.contextmanager
def suppressed():
    """Scoped MXU suppression for Pallas kernel-body traces."""
    token = _SUPPRESS_CTX.set(True)
    try:
        yield
    finally:
        _SUPPRESS_CTX.reset(token)


def enabled(xp) -> bool:
    if SUPPRESS or _SUPPRESS_CTX.get():
        return False
    if ENABLED is not None:
        return ENABLED
    if xp is np:
        return False
    try:
        import jax

        # explicit allowlist: the int8-MXU cost model and exactness were
        # measured on TPU only ("axon" = the remote-TPU plugin's platform
        # name); any other accelerator stays on the XLA radix-2 path
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # backend init failure — stay on the XLA path
        return False


def _xp_of(x):
    if isinstance(x, (np.ndarray, np.generic)):
        return np
    import jax.numpy as jnp

    return jnp


def digit_count(n_limbs: int) -> int:
    """Balanced base-256 digits for a value < 2^(32k): the top digit of the
    balanced form can carry one position past the 4k bytes."""
    return 4 * n_limbs + 1


def _balanced_digits_int(v: int, n_digits: int):
    """Python int -> balanced base-256 digit list (each in [-128, 127])."""
    out = []
    for _ in range(n_digits):
        d = ((v + 128) % 256) - 128
        out.append(d)
        v = (v - d) >> 8
    assert v == 0, "digit budget too small"
    return out


@functools.lru_cache(maxsize=None)
def _w_digits_cached(field_key, m: int, inverse: bool):
    from .limb_field import FIELDS_BY_NAME

    field = FIELDS_BY_NAME[field_key]
    P = field.P
    root = field.get_root_of_unity(m.bit_length() - 1)
    if inverse:
        root = pow(root, P - 2, P)
    dw = digit_count(field.n)
    out = np.zeros((dw, m, m), dtype=_I8)
    for j in range(m):
        wj = pow(root, j, P)
        acc = 1
        for t in range(m):
            digs = _balanced_digits_int(acc, dw)
            for i, d in enumerate(digs):
                out[i, j, t] = d
            acc = acc * wj % P
    return out


@functools.lru_cache(maxsize=None)
def _w_toeplitz_cached(field_key, m: int, inverse: bool):
    """Block-Toeplitz digit matrix ((2d-1)*m, d*m): row-block k, column-
    block j holds W digit plane k-j (zeros outside [0, d))."""
    from .limb_field import FIELDS_BY_NAME

    d = digit_count(FIELDS_BY_NAME[field_key].n)
    Wd = _w_digits_cached(field_key, m, inverse)
    out = np.zeros(((2 * d - 1) * m, d * m), dtype=_I8)
    for k in range(2 * d - 1):
        for j in range(max(0, k - d + 1), min(d, k + 1)):
            out[k * m : (k + 1) * m, j * m : (j + 1) * m] = Wd[k - j]
    return out


def _static_bound_ok(field, m: int) -> bool:
    """int32 exactness: every antidiagonal sum is <= dx * m * 128 * 128."""
    d = digit_count(field.n)
    return d * m * 128 * 128 < 2**31


def _decompose_balanced(field, a, xp):
    """Limb tuple (each (..., m) u32) -> (dx, ..., m) int8 balanced digits."""
    k = field.n
    digs = []
    carry = xp.zeros(a[0].shape, dtype=_I32)
    for j in range(4 * k):
        l, s = divmod(j, 4)
        byte = ((a[l] >> np.uint32(8 * s)) & np.uint32(0xFF)).astype(_I32)
        t = byte + carry
        d = ((t + 128) & 255) - 128
        carry = (t - d) >> 8
        digs.append(d.astype(_I8))
    digs.append(carry.astype(_I8))  # top balanced digit, in {0, 1}
    return xp.stack(digs)


def _recombine_limbs(field, C, m: int, xp):
    """Signed int32 digit planes C (each (m, B)) -> u32 limb planes of the
    nonnegative integer sum(C[k] * 256^k), int32-only arithmetic."""
    bound = m * (field.P - 1) ** 2
    n_lanes = max((bound.bit_length() + 15) // 16, (len(C) + 1) // 2 + 1)
    lanes = [xp.zeros(C[0].shape, dtype=_I32) for _ in range(n_lanes + 1)]
    for k, Ck in enumerate(C):
        t, odd = divmod(k, 2)
        if odd:
            lanes[t] = lanes[t] + ((Ck & 255) << 8)
            lanes[t + 1] = lanes[t + 1] + (Ck >> 8)
        else:
            lanes[t] = lanes[t] + (Ck & 0xFFFF)
            lanes[t + 1] = lanes[t + 1] + (Ck >> 16)
    out16 = []
    carry = xp.zeros(C[0].shape, dtype=_I32)
    for t in range(n_lanes):
        cur = lanes[t] + carry
        out16.append(cur & 0xFFFF)
        carry = cur >> 16  # arithmetic shift: signed carries propagate
    # the represented value is nonnegative and < 2^(16*n_lanes), so the
    # final carry is identically zero and every out16 lane is in [0, 2^16)
    limbs = []
    for i in range(0, n_lanes, 2):
        lo = out16[i].astype(np.uint32)
        hi = (
            out16[i + 1].astype(np.uint32)
            if i + 1 < n_lanes
            else xp.zeros_like(lo)
        )
        limbs.append(lo | (hi << np.uint32(16)))
    return limbs, bound


def ntt_tile(field, a, inverse: bool):
    """DFT along the last axis (length m) of a limb tuple via one int8
    matmul; natural order in/out, bit-exact with LimbField.ntt."""
    xp = _xp_of(a[0])
    m = int(a[0].shape[-1])
    assert _static_bound_ok(field, m), (field.NAME, m)
    batch_shape = a[0].shape[:-1]
    B = 1
    for dim in batch_shape:
        B *= int(dim)
    flat = tuple(l.reshape(B, m) for l in a)

    d = digit_count(field.n)
    A = _w_toeplitz_cached(field.NAME, m, inverse)  # ((2d-1)m, dm) int8
    Xd = _decompose_balanced(field, flat, xp)  # (d, B, m) int8

    # contraction layout: Xbig[j*m + t, b] = digit j of x[b, t]
    Xbig = xp.moveaxis(Xd, 1, -1).reshape(d * m, B)
    if xp is np:
        C = (A.astype(np.int64) @ Xbig.astype(np.int64)).astype(_I32)
    else:
        import jax

        C = jax.lax.dot_general(
            xp.asarray(A),
            Xbig,
            (((1,), (0,)), ((), ())),
            preferred_element_type=_I32,
        )
    n_digits = 2 * d - 1
    C = C.reshape(n_digits, m, B)

    limbs, bound = _recombine_limbs(field, [C[k] for k in range(n_digits)], m, xp)
    reduced = field._reduce(limbs, xp, bound=bound)
    # planes are (m, B) with the transform index leading: restore (..., m)
    return tuple(
        xp.moveaxis(p, 0, -1).reshape(batch_shape + (m,)) for p in reduced
    )


# ---------------------------------------------------------------------------
# dense field matvec as one int8 matmul (MDS / INV_MDS in constraint eval)
# ---------------------------------------------------------------------------

# engagement: like the NTT tiles, the matmul needs enough independent
# positions to fill the MXU lanes; w is the state width (6 for Rescue128)
MATVEC_MAX_W = 8


@functools.lru_cache(maxsize=None)
def _m_toeplitz_cached(field_key, m_entries):
    """m_entries: tuple of w tuples of ints.  Block-Toeplitz digit matrix
    ((2d-1)*w, d*w): A[(k*w + i), (dj*w + j)] = digit (k-dj) of m[i][j], so
    row block k of A @ Xbig is the k-th base-256 digit plane of
    out_i = sum_j m[i][j] * x_j (same antidiagonal-collapse layout as the
    NTT tile's _w_toeplitz_cached)."""
    from .limb_field import FIELDS_BY_NAME

    field = FIELDS_BY_NAME[field_key]
    d = digit_count(field.n)
    w = len(m_entries)
    digs = np.zeros((d, w, w), dtype=_I8)
    for i in range(w):
        for j in range(w):
            v = int(m_entries[i][j]) % field.P
            for t, dig in enumerate(_balanced_digits_int(v, d)):
                digs[t, i, j] = dig
    out = np.zeros(((2 * d - 1) * w, d * w), dtype=_I8)
    for k in range(2 * d - 1):
        for dj in range(max(0, k - d + 1), min(d, k + 1)):
            out[k * w : (k + 1) * w, dj * w : (dj + 1) * w] = digs[k - dj]
    return out


def matvec_ok(field, w: int, batch: int) -> bool:
    d = digit_count(field.n)
    return (
        w <= MATVEC_MAX_W
        and batch >= MIN_BATCH
        and d * w * 128 * 128 < 2**31  # int32-exact accumulation
    )


def matvec_tile(field, states, m_rows):
    """out_i = sum_j m_rows[i][j] * states[j] via ONE int8 MXU matmul.

    states: list of w limb tuples (arrays of any equal shape); returns w
    canonical limb tuples — identical values to LimbField.matvec's
    deferred-reduction path (the MDS/INV_MDS hot pattern of the Rescue128
    constraint kernels; analog being accelerated:
    prover/src/constraints/evaluator.rs hot loop)."""
    xp = _xp_of(states[0][0])
    w = len(states)
    shape = states[0][0].shape
    B = 1
    for dim in shape:
        B *= int(dim)
    d = digit_count(field.n)
    A = _m_toeplitz_cached(
        field.NAME, tuple(tuple(int(v) for v in row) for row in m_rows)
    )

    # Xbig[(dj*w + j), b] = digit dj of states[j][b]
    Xd = [
        _decompose_balanced(field, tuple(l.reshape(B) for l in s), xp)
        for s in states
    ]  # w entries of (d, B)
    Xbig = xp.stack(Xd, axis=1).reshape(d * w, B)
    if xp is np:
        C = (A.astype(np.int64) @ Xbig.astype(np.int64)).astype(_I32)
    else:
        import jax

        C = jax.lax.dot_general(
            xp.asarray(A),
            Xbig,
            (((1,), (0,)), ((), ())),
            preferred_element_type=_I32,
        )
    n_digits = 2 * d - 1
    C = C.reshape(n_digits, w, B)
    out = []
    for i in range(w):
        limbs, bound = _recombine_limbs(
            field, [C[k, i] for k in range(n_digits)], w, xp
        )
        reduced = field._reduce(limbs, xp, bound=bound)
        out.append(tuple(p.reshape(shape) for p in reduced))
    return out
