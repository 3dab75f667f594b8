"""Goldilocks field (p = 2^64 - 2^32 + 1) arithmetic on 32-bit limb pairs.

TPU-native design: TPUs have no 64-bit integer units, so a field element is a
pair ``(lo, hi)`` of uint32 arrays.  Every operation below is expressed purely
in uint32 adds/subs/muls/shifts/compares, which map 1:1 onto the TPU VPU (and
identically onto numpy for the host path).  The same code runs under ``jnp``
(jit/TPU) and ``np`` (host) via the ``_xp`` namespace dispatch.

Semantics mirror the reference field `math/src/field/f64/mod.rs` — but where
the reference keeps elements in Montgomery form internally (f64/mod.rs:49-58),
we keep the *canonical* representation everywhere: the reference converts to
canonical form at every protocol boundary (``as_int`` at f64/mod.rs:275-282,
``Serializable::write_into`` at f64/mod.rs:607-612), so canonical-on-device
produces bit-identical transcripts and proofs without per-op reductions.

Reduction algorithm: for x = c3*2^96 + c2*2^64 + c1*2^32 + c0 with 2^64 ≡
2^32 - 1 (mod p) and 2^96 ≡ -1 (mod p):  x ≡ lo64 - c3 + c2*(2^32-1) (mod p)
(same identity as mont_red_cst, f64/mod.rs:516-530, minus the Montgomery
scaling).
"""

from __future__ import annotations

import numpy as np

P = 0xFFFFFFFF00000001  # field modulus
EPS = 0xFFFFFFFF  # 2^32 - 1 == 2^64 mod p
MASK32 = 0xFFFFFFFF
MASK16 = 0xFFFF
TWO_ADICITY = 32
GENERATOR = 7
TWO_ADIC_ROOT_OF_UNITY = 7277203076849721926  # order 2^32 (f64/mod.rs:262)

_U32 = np.uint32


def _xp(x):
    """Return the array namespace (numpy or jax.numpy) for ``x``."""
    if isinstance(x, np.ndarray) or isinstance(x, np.generic):
        return np
    import jax.numpy as jnp

    return jnp


# ---------------------------------------------------------------------------
# representation conversions (host side)
# ---------------------------------------------------------------------------


def from_u64(x) -> tuple:
    """numpy uint64 array -> (lo, hi) uint32 pair."""
    x = np.asarray(x, dtype=np.uint64)
    lo = (x & np.uint64(MASK32)).astype(_U32)
    hi = (x >> np.uint64(32)).astype(_U32)
    return lo, hi


def to_u64(a) -> np.ndarray:
    """(lo, hi) uint32 pair -> numpy uint64 array (host only)."""
    lo, hi = a
    lo = np.asarray(lo, dtype=np.uint64)
    hi = np.asarray(hi, dtype=np.uint64)
    return lo | (hi << np.uint64(32))


def from_int(v: int, shape=()) -> tuple:
    v = int(v) % P
    return from_u64(np.full(shape, v, dtype=np.uint64))


def zeros(shape, xp=np):
    return xp.zeros(shape, dtype=_U32), xp.zeros(shape, dtype=_U32)


def ones(shape, xp=np):
    return xp.ones(shape, dtype=_U32), xp.zeros(shape, dtype=_U32)


# ---------------------------------------------------------------------------
# 64-bit primitives on u32 pairs
# ---------------------------------------------------------------------------

# Every primitive below relies on wrapping u32 arithmetic; on host numpy the
# SCALAR (0-d) path emits RuntimeWarning("overflow encountered ...") for the
# intentional wraparound.  An errstate-per-call decorator costs ~5 us per
# entry (measured: ~5 ms of a 16 ms do_work verify was errstate plumbing),
# so the overflow warning is silenced ONCE process-wide instead; integer
# wraparound is load-bearing throughout this package, so the warning has no
# diagnostic value here.
np.seterr(over="ignore")


def _wrapping(fn):  # kept as a marker for intentional-wraparound helpers
    return fn


@_wrapping
def _carry(s, a, xp):
    """Carry-out of u32 add s = a + b (wrapping)."""
    return (s < a).astype(_U32)


@_wrapping
def _add64(alo, ahi, blo, bhi, xp):
    rlo = alo + blo
    cl = (rlo < alo).astype(_U32)
    s1 = ahi + bhi
    c1 = (s1 < ahi).astype(_U32)
    rhi = s1 + cl
    c2 = (rhi < s1).astype(_U32)
    return rlo, rhi, c1 | c2


@_wrapping
def _sub64(alo, ahi, blo, bhi, xp):
    rlo = alo - blo
    bl = (alo < blo).astype(_U32)
    s1 = ahi - bhi
    b1 = (ahi < bhi).astype(_U32)
    rhi = s1 - bl
    b2 = (s1 < bl).astype(_U32)
    return rlo, rhi, b1 | b2


@_wrapping
def _mul32(a, b, xp):
    """Full 32x32 -> 64 product as (lo, hi) u32 pair via 16-bit partials."""
    a0 = a & MASK16
    a1 = a >> 16
    b0 = b & MASK16
    b1 = b >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    v1 = (p01 & MASK16) << 16
    t = p00 + v1
    c1 = (t < v1).astype(_U32)
    v2 = (p10 & MASK16) << 16
    t2 = t + v2
    c2 = (t2 < v2).astype(_U32)
    hi = p11 + (p01 >> 16) + (p10 >> 16) + c1 + c2
    return t2, hi


@_wrapping
def _mul64_full(alo, ahi, blo, bhi, xp):
    """64x64 -> 128 product as four u32 limbs (c0..c3, little-endian)."""
    l0, h0 = _mul32(alo, blo, xp)
    l1, h1 = _mul32(alo, bhi, xp)
    l2, h2 = _mul32(ahi, blo, xp)
    l3, h3 = _mul32(ahi, bhi, xp)
    c0 = l0
    t = h0 + l1
    k1 = (t < h0).astype(_U32)
    t2 = t + l2
    k2 = (t2 < l2).astype(_U32)
    c1 = t2
    u = h1 + h2
    k3 = (u < h1).astype(_U32)
    u2 = u + l3
    k4 = (u2 < l3).astype(_U32)
    k12 = k1 + k2
    u3 = u2 + k12
    k5 = (u3 < k12).astype(_U32)
    c2 = u3
    c3 = h3 + k3 + k4 + k5
    return c0, c1, c2, c3


@_wrapping
def _reduce128(c0, c1, c2, c3, xp):
    """Reduce c3*2^96 + c2*2^64 + c1*2^32 + c0 mod p, canonical output.

    x ≡ lo64 - c3 + c2*(2^32 - 1)  (mod p).
    """
    # t0 = lo64 - c3 (subtract EPS once more on borrow; cannot re-borrow)
    t0lo, t0hi, bo = _sub64(c0, c1, c3, xp.zeros_like(c3), xp)
    t0lo, t0hi, _ = _sub64(t0lo, t0hi, bo * _U32(EPS), xp.zeros_like(c3), xp)
    # t1 = c2 * (2^32 - 1) = (c2 << 32) - c2
    nz = (c2 != 0).astype(_U32)
    t1lo = _U32(0) - c2
    t1hi = c2 - nz
    # s = t0 + t1 (add EPS on carry; cannot re-carry)
    slo, shi, co = _add64(t0lo, t0hi, t1lo, t1hi, xp)
    slo, shi, _ = _add64(slo, shi, co * _U32(EPS), xp.zeros_like(c3), xp)
    return _canon(slo, shi, xp)


@_wrapping
def _canon(lo, hi, xp):
    """Map a value in [0, 2^64) to canonical [0, p) (single conditional sub)."""
    ge = (hi == _U32(EPS)) & (lo >= _U32(1))
    lo2 = xp.where(ge, lo - _U32(1), lo)
    hi2 = xp.where(ge, xp.zeros_like(hi), hi)
    return lo2, hi2


# ---------------------------------------------------------------------------
# field operations; a, b are (lo, hi) pairs of equal-shape u32 arrays
# ---------------------------------------------------------------------------


def _xp2(x, y):
    """Namespace for a binary op: jnp if EITHER operand is traced/jax —
    host-numpy constants mixed into jitted AIR code must not force np."""
    if isinstance(x, (np.ndarray, np.generic)) and isinstance(y, (np.ndarray, np.generic)):
        return np
    import jax.numpy as jnp

    return jnp


# -- native host kernels (gl64_mod.c) ----------------------------------------
# The numpy formulation pays dozens of full-array passes per op (16-bit
# partials + carry chains, shared with the traced 32-bit TPU path); on host
# a single-pass OpenMP C kernel does one __uint128_t product + EPS fold per
# element.  b may be a suffix-repeating pattern (twiddle rows, scalars).

_NATIVE_MOD = None
_NATIVE_MOD_TRIED = False
NATIVE_MIN_SIZE = 1  # measured: numpy limb mul is ~120 us at ANY size (30+ tiny passes); the native call is ~20 us incl. ctypes marshalling, so it wins even for a handful of elements


def _native_mod():
    global _NATIVE_MOD, _NATIVE_MOD_TRIED
    if not _NATIVE_MOD_TRIED:
        _NATIVE_MOD_TRIED = True
        try:
            from ..native import get_gl64mod

            _NATIVE_MOD = get_gl64mod()
        except Exception:
            _NATIVE_MOD = None
    return _NATIVE_MOD


def _native_args(a, b, allow_swap: bool):
    """(a, b, out_shape, nb) if the C kernels can serve this op: both numpy
    u32, a C-contiguous, b a suffix-repeating pattern of a (b.shape, with
    leading 1s stripped, a suffix of a.shape).  Returns None otherwise."""
    alo, ahi = a
    blo, bhi = b
    if not (
        isinstance(alo, np.ndarray)
        and isinstance(blo, np.ndarray)
        and alo.dtype == _U32
        and blo.dtype == _U32
    ):
        return None
    if alo.size < blo.size and allow_swap:
        return _native_args(b, a, False)
    if alo.size < NATIVE_MIN_SIZE or alo.shape != ahi.shape or blo.shape != bhi.shape:
        return None
    bs = blo.shape
    while bs and bs[0] == 1:
        bs = bs[1:]
    if bs != () and alo.shape[len(alo.shape) - len(bs):] != bs:
        return None
    nb = max(1, int(blo.size))
    return a, b, alo.shape, nb


def _native_call(fn_name, a, b, allow_swap: bool):
    lib = _native_mod()
    if lib is None:
        return None
    args = _native_args(a, b, allow_swap)
    if args is None:
        return None
    (alo, ahi), (blo, bhi), shape, nb = args
    import ctypes

    # sliced views (NTT butterflies) arrive non-contiguous: one copy pass
    # still beats the ~50-pass numpy formulation
    alo = np.ascontiguousarray(alo)
    ahi = np.ascontiguousarray(ahi)
    blo = np.ascontiguousarray(blo)
    bhi = np.ascontiguousarray(bhi)
    rlo = np.empty(shape, dtype=_U32)
    rhi = np.empty(shape, dtype=_U32)
    p = ctypes.c_void_p
    getattr(lib, fn_name)(
        alo.ctypes.data_as(p), ahi.ctypes.data_as(p),
        blo.ctypes.data_as(p), bhi.ctypes.data_as(p),
        rlo.ctypes.data_as(p), rhi.ctypes.data_as(p),
        alo.size, nb,
    )
    return rlo, rhi


def add(a, b):
    alo, ahi = a
    blo, bhi = b
    xp = _xp2(alo, blo)
    if xp is np:
        r = _native_call("gl_addmod", a, b, True)
        if r is not None:
            return r
    slo, shi, co = _add64(alo, ahi, blo, bhi, xp)
    slo, shi, _ = _add64(slo, shi, co * _U32(EPS), xp.zeros_like(slo), xp)
    return _canon(slo, shi, xp)


def sub(a, b):
    alo, ahi = a
    blo, bhi = b
    xp = _xp2(alo, blo)
    if xp is np:
        r = _native_call("gl_submod", a, b, False)
        if r is not None:
            return r
    rlo, rhi, bo = _sub64(alo, ahi, blo, bhi, xp)
    rlo, rhi, _ = _sub64(rlo, rhi, bo * _U32(EPS), xp.zeros_like(rlo), xp)
    return rlo, rhi


def neg(a):
    xp = _xp(a[0])
    z = zeros(xp.shape(a[0]) if xp is not np else a[0].shape, xp)
    return sub(z, a)


def mul(a, b):
    alo, ahi = a
    blo, bhi = b
    xp = _xp2(alo, blo)
    if xp is np:
        r = _native_call("gl_mulmod", a, b, True)
        if r is not None:
            return r
    c0, c1, c2, c3 = _mul64_full(alo, ahi, blo, bhi, xp)
    return _reduce128(c0, c1, c2, c3, xp)


def square(a):
    lo, hi = a
    xp = _xp(lo)
    if xp is np:
        return mul(a, a)
    # traced squaring: (lo + hi*2^32)^2 needs 3 of the 4 32x32 products
    # (the cross term lo*hi is doubled) — exp7/exp chains are mostly
    # squarings, so this trims ~25% of their multiply work
    return _reduce128(*_sqr64_full(lo, hi, xp), xp)


@_wrapping
def _sqr64_full(lo, hi, xp):
    """64-bit squaring -> 128-bit product as four u32 limbs (3 _mul32)."""
    l0, h0 = _mul32(lo, lo, xp)
    lx, hx = _mul32(lo, hi, xp)  # cross term, to be doubled
    l3, h3 = _mul32(hi, hi, xp)
    # double (lx, hx): 64-bit value, may carry into the third limb
    dlx = lx + lx
    c0 = (dlx < lx).astype(_U32)
    dhx = hx + hx + c0  # hx <= 2^32-2 so hx+hx+1 cannot wrap twice
    ch = (dhx < hx).astype(_U32)
    # assemble c0..c3 = (l0, h0) + (dlx, dhx)<<32 + carry + (l3, h3)<<64
    c1 = h0 + dlx
    k1 = (c1 < h0).astype(_U32)
    t2 = l3 + dhx
    k2 = (t2 < l3).astype(_U32)
    c2 = t2 + k1
    k3 = (c2 < k1).astype(_U32)
    c3 = h3 + ch + k2 + k3
    return l0, c1, c2, c3


def double(a):
    return add(a, a)


def mul_small(a, k: int):
    """Multiply by a constant < 2^32 (single-limb multiplicand)."""
    xp = _xp(a[0])
    k32 = _U32(k)
    l0, h0 = _mul32(a[0], xp.full_like(a[0], k32), xp)
    l1, h1 = _mul32(a[1], xp.full_like(a[1], k32), xp)
    # product = h1*2^96? no: a*k = (alo + ahi*2^32)*k = l0 + (h0 + l1)*2^32 + h1*2^64
    t = h0 + l1
    cc = (t < h0).astype(_U32)
    return _reduce128(l0, t, h1 + cc, xp.zeros_like(l0), xp)


def dot_block(block, v):
    """Fused modular dot product across columns: out[k] = sum_j s_j[k]*v[j].

    block: ONE contiguous u32 array shaped (w, 2, n) — w (lo, hi) plane
    pairs; v: list of w python ints.  One native pass (gl_dot) instead of
    w mul + (w-1) add full-array passes — the DEEP composer hot shape.
    Returns None when the native tier is unavailable (caller falls back)."""
    lib = _native_mod()
    if lib is None or block.size == 0:
        return None
    import ctypes

    block = np.ascontiguousarray(block, dtype=_U32)
    w, _, nn = block.shape
    vec = np.asarray([int(x) % P for x in v], dtype=np.uint64)
    rlo = np.empty(nn, dtype=_U32)
    rhi = np.empty(nn, dtype=_U32)
    p = ctypes.c_void_p
    lib.gl_dot(
        w, block.ctypes.data_as(p), vec.ctypes.data_as(p),
        rlo.ctypes.data_as(p), rhi.ctypes.data_as(p), nn,
    )
    return rlo, rhi


def mds_circulant(state, row0):
    """Circulant MDS multiply with small constants (Rescue/Griffin matrices
    have entries < 2^5): out_i = sum_j row0[(j - i) mod W] * s_j.

    This is the TPU counterpart of the reference's frequency-domain MDS
    (crypto/src/hash/mds/mds_f64_12x12.rs): instead of 144 full Goldilocks
    multiplies, each term is a 64x5-bit product accumulated WITHOUT modular
    reduction in a 96-bit (3-limb) accumulator, with one reduction per
    output.  value bound: W * 31 * (p-1) < 2^73 — fits 3 limbs.
    """
    xp = _xp(state[0][0])
    W = len(state)
    outs = []
    for i in range(W):
        a0 = a1 = a2 = None
        for j in range(W):
            c = row0[(j - i) % W]
            if c == 0:
                continue
            slo, shi = state[j]
            cc = _U32(c)
            l0, l1a = _mul32(slo, xp.full_like(slo, cc), xp)
            l1b, l2 = _mul32(shi, xp.full_like(shi, cc), xp)
            # term = l0 + (l1a + l1b)*2^32 + l2*2^64
            t1 = l1a + l1b
            k1 = (t1 < l1a).astype(_U32)
            t2 = l2 + k1
            if a0 is None:
                a0, a1, a2 = l0, t1, t2
            else:
                a0n = a0 + l0
                c0 = (a0n < l0).astype(_U32)
                a1n = a1 + t1
                c1 = (a1n < t1).astype(_U32)
                a1n2 = a1n + c0
                c1b = (a1n2 < c0).astype(_U32)
                a2n = a2 + t2 + c1 + c1b
                a0, a1, a2 = a0n, a1n2, a2n
        outs.append(_reduce128(a0, a1, a2, xp.zeros_like(a0), xp))
    return outs


def exp_int(a, e: int):
    """Exponentiation by a static python-int exponent.

    Host path unrolls square-and-multiply; under jax, large exponents roll
    into a fori_loop (MSB-first, constant bit table) to keep the XLA graph
    small — unrolled 64-bit chains make XLA:CPU compilation pathological.
    """
    xp = _xp(a[0])
    e = int(e)
    if e == 0:
        return ones(a[0].shape, xp)
    if xp is not np and e.bit_length() > 8:
        return _exp_loop_jax(a, e)
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = square(base)
    return result


def _exp_loop_jax(a, e: int):
    import jax
    import jax.numpy as jnp

    nbits = e.bit_length()
    bits = jnp.asarray(
        np.array([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=np.uint32)
    )
    one = ones(a[0].shape, _xp(a[0]))

    def body(i, r):
        r = square(r)
        m = mul(r, a)
        cond = bits[i] == 1
        return (
            jnp.where(cond, m[0], r[0]),
            jnp.where(cond, m[1], r[1]),
        )

    return jax.lax.fori_loop(0, nbits, body, one)


def exp7(a):
    """x^7 — Rescue S-box exponent (f64/mod.rs:75-82)."""
    x2 = square(a)
    x4 = square(x2)
    x3 = mul(x2, a)
    return mul(x3, x4)


def inv(a):
    """Field inverse via Fermat: a^(p-2).  a==0 maps to 0."""
    return exp_int(a, P - 2)


def eq(a, b):
    return (a[0] == b[0]) & (a[1] == b[1])


def is_zero(a):
    return (a[0] == 0) & (a[1] == 0)


def where(cond, a, b):
    xp = _xp(a[0])
    return xp.where(cond, a[0], b[0]), xp.where(cond, a[1], b[1])


def batch_inv(a, axis=-1):
    """Batched inversion via prefix/suffix products (Montgomery's trick,
    reference math/src/utils/mod.rs:177).  One field inversion total.

    Zero entries produce zero outputs (matching reference behavior of skipping
    zeros is NOT implemented — reference asserts no zeros in hot paths).
    """
    lo, hi = a
    xp = _xp(lo)
    if xp is np:
        lib = _native_mod()
        if lib is not None:
            import ctypes

            clo = np.ascontiguousarray(lo)
            chi = np.ascontiguousarray(hi)
            rlo = np.empty_like(clo)
            rhi = np.empty_like(chi)
            pv = ctypes.c_void_p
            lib.gl_batchinv(
                clo.ctypes.data_as(pv), chi.ctypes.data_as(pv),
                rlo.ctypes.data_as(pv), rhi.ctypes.data_as(pv), clo.size,
            )
            return rlo, rhi
        u = to_u64(a)
        flat = u.reshape(-1) if axis in (-1, u.ndim - 1) else np.moveaxis(u, axis, -1).reshape(-1)
        # host: simple sequential Montgomery trick on python ints
        n = flat.shape[0]
        prefix = np.empty(n + 1, dtype=np.uint64)
        prefix[0] = 1
        acc = 1
        vals = [int(v) for v in flat]
        for i, v in enumerate(vals):
            acc = (acc * (v if v != 0 else 1)) % P
            prefix[i + 1] = acc
        inv_acc = pow(acc, P - 2, P)
        out = np.empty(n, dtype=np.uint64)
        for i in range(n - 1, -1, -1):
            v = vals[i]
            if v == 0:
                out[i] = 0
            else:
                out[i] = (int(prefix[i]) * inv_acc) % P
                inv_acc = (inv_acc * v) % P
        out = out.reshape(u.shape if axis in (-1, u.ndim - 1) else np.moveaxis(u, axis, -1).shape)
        if axis not in (-1, u.ndim - 1):
            out = np.moveaxis(out, -1, axis)
        return from_u64(out)
    else:
        import jax

        axis = axis % lo.ndim
        one = ones(lo.shape, xp)
        safe = where(is_zero(a), one, a)
        # prefix products (inclusive) and suffix products (inclusive)
        pre = jax.lax.associative_scan(mul, safe, axis=axis)
        suf = jax.lax.associative_scan(mul, safe, axis=axis, reverse=True)
        # total product = last prefix; invert once (jax take clips negative
        # indices, so use the explicit last index)
        last = lo.shape[axis] - 1
        total = (
            xp.take(pre[0], xp.array([last]), axis=axis),
            xp.take(pre[1], xp.array([last]), axis=axis),
        )
        inv_total = inv(total)
        # a_i^{-1} = prefix_{i-1} * suffix_{i+1} * inv_total
        shift_pre = _shift(pre, 1, axis, xp, fill_one=True)
        shift_suf = _shift(suf, -1, axis, xp, fill_one=True)
        out = mul(mul(shift_pre, shift_suf), (xp.broadcast_to(inv_total[0], lo.shape), xp.broadcast_to(inv_total[1], lo.shape)))
        return where(is_zero(a), zeros(lo.shape, xp), out)


def _shift(a, k, axis, xp, fill_one=False):
    """Shift along axis by k (positive = right), filling with ONE."""
    lo, hi = a
    n = lo.shape[axis]
    fill_lo = xp.ones if fill_one else xp.zeros
    idx = [slice(None)] * lo.ndim

    def shift_one(arr, fill_val):
        pad = xp.full_like(xp.take(arr, xp.arange(abs(k)), axis=axis), fill_val)
        if k > 0:
            body = xp.take(arr, xp.arange(0, n - k), axis=axis)
            return xp.concatenate([pad, body], axis=axis)
        else:
            body = xp.take(arr, xp.arange(-k, n), axis=axis)
            return xp.concatenate([body, pad], axis=axis)

    return shift_one(lo, 1 if fill_one else 0), shift_one(hi, 0)


# ---------------------------------------------------------------------------
# host-side scalar helpers (python ints)
# ---------------------------------------------------------------------------


def s_add(a: int, b: int) -> int:
    return (a + b) % P


def s_sub(a: int, b: int) -> int:
    return (a - b) % P


def s_mul(a: int, b: int) -> int:
    return (a * b) % P


def s_inv(a: int) -> int:
    return pow(a, P - 2, P)


def s_exp(a: int, e: int) -> int:
    return pow(a, e, P)


def s_neg(a: int) -> int:
    return (-a) % P


def get_root_of_unity(log_n: int) -> int:
    """Primitive 2^log_n-th root of unity (StarkField::get_root_of_unity,
    math/src/field/traits.rs:254)."""
    assert 0 < log_n <= TWO_ADICITY
    return pow(TWO_ADIC_ROOT_OF_UNITY, 1 << (TWO_ADICITY - log_n), P)
