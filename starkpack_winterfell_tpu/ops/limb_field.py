"""Generic N-limb prime fields on u32 arrays — f62 and f128.

Equivalent of the reference's f62 (p = 2^62 - 111*2^39 + 1, Montgomery —
math/src/field/f62/mod.rs) and f128 (p = 2^128 - 45*2^40 + 1, schoolbook —
math/src/field/f128/mod.rs) fields, re-designed for TPU: an element is a
tuple of n uint32 limb arrays (little-endian limbs), all ops are vectorized
u32 add/mul/shift/compare, and — unlike the reference's f62 — the canonical
representation is used throughout (the reference converts to canonical form
at every protocol boundary anyway).

Reduction: with E = 2^(32n) mod p small (both fields have sparse moduli),
x = hi*2^(32n) + lo ≡ hi*E + lo; folds repeat until the value fits n limbs
(fold count precomputed from bit lengths), then ≤ 2 conditional subtracts.
"""

from __future__ import annotations

import numpy as np

_U32 = np.uint32
MASK16 = 0xFFFF


def _xp(x):
    if isinstance(x, np.ndarray) or isinstance(x, np.generic):
        return np
    import jax.numpy as jnp

    return jnp


# wrapping-u32 helpers: intentional-overflow warnings are silenced
# process-wide (see ops/gl64.py `_wrapping` for the rationale + measurement)
def _wrapping(fn):
    return fn


@_wrapping
def _mul32(a, b):
    """32x32 -> (lo, hi) u32 (same as gl64._mul32).  On host numpy the
    product is one native u64 multiply; the 16-bit split below is for the
    TPU/XLA path, which has no 64-bit integer units."""
    if isinstance(a, (np.ndarray, np.generic)) and isinstance(
        b, (np.ndarray, np.generic)
    ):
        p = a.astype(np.uint64) * b.astype(np.uint64)
        return (p & 0xFFFFFFFF).astype(_U32), (p >> np.uint64(32)).astype(_U32)
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
def _add_limbs(a, b, xp):
    """Add limb lists (unequal lengths ok); returns n+1 limbs."""
    n = max(len(a), len(b))
    out = []
    carry = None
    for i in range(n):
        x = a[i] if i < len(a) else None
        y = b[i] if i < len(b) else None
        if x is None:
            x = xp.zeros_like(b[i])
        if y is None:
            y = xp.zeros_like(a[i])
        s = x + y
        c1 = (s < x).astype(_U32)
        if carry is not None:
            s2 = s + carry
            c2 = (s2 < carry).astype(_U32)
            s = s2
            carry = c1 | c2
        else:
            carry = c1
        out.append(s)
    out.append(carry)
    return out


@_wrapping
def _sub_limbs(a, b, xp):
    """a - b (same length), returns (limbs, borrow_u32)."""
    n = len(a)
    out = []
    borrow = None
    for i in range(n):
        x, y = a[i], b[i] if i < len(b) else xp.zeros_like(a[i])
        d = x - y
        b1 = (x < y).astype(_U32)
        if borrow is not None:
            d2 = d - borrow
            b2 = (d < borrow).astype(_U32)
            d = d2
            borrow = b1 | b2
        else:
            borrow = b1
        out.append(d)
    return out, borrow



@_wrapping
def _sqr_limbs(a, xp):
    """Squaring specialization of _mul_limbs: n(n-1)/2 cross products
    (doubled once at the end) + n diagonal squares — 10 vs 16 _mul32 calls
    for n=4 (traced path; host numpy keeps the native single-pass mul)."""
    n = len(a)
    total = 2 * n
    # cross = sum_{i<j} a_i a_j 2^{32(i+j)}
    cross = [xp.zeros_like(a[0]) for _ in range(total)]
    for i in range(n):
        carry = xp.zeros_like(a[0])
        for j in range(i + 1, n):
            lo, hi = _mul32(a[i], a[j])
            s0 = cross[i + j] + lo
            c1 = (s0 < lo).astype(_U32)
            s1 = s0 + carry
            c2 = (s1 < carry).astype(_U32)
            cross[i + j] = s1
            carry = hi + c1 + c2  # hi <= 2^32-2: no overflow
        k = i + n
        while True:
            s0 = cross[k] + carry
            c = (s0 < carry).astype(_U32)
            cross[k] = s0
            carry = c
            k += 1
            if k >= total:
                break
    # double the cross sum (one add with carries), then add the diagonal
    doubled = _add_limbs(cross, cross, xp)[:total]
    out = doubled
    for i in range(n):
        lo, hi = _mul32(a[i], a[i])
        term = [xp.zeros_like(a[0]) for _ in range(total)]
        term[2 * i] = lo
        if 2 * i + 1 < total:
            term[2 * i + 1] = hi
        out = _add_limbs(out, term, xp)[:total]
    return out


def _leading_batch(a) -> int:
    """Product of every axis but the last of a limb tuple (tile batch)."""
    b = 1
    for d in a[0].shape[:-1]:
        b *= int(d)
    return b


@_wrapping
def _mul_limbs(a, b, xp):
    """Schoolbook product of limb lists -> len(a)+len(b) limbs."""
    na, nb = len(a), len(b)
    if xp is np:
        # host: native u64 products, column sums (< 2^35, no overflow),
        # one final carry propagation — ~3x fewer array dispatches
        M32 = np.uint64(0xFFFFFFFF)
        s32 = np.uint64(32)
        a64 = [x.astype(np.uint64) for x in a]
        b64 = [x.astype(np.uint64) for x in b]
        shape = np.broadcast_shapes(a[0].shape, b[0].shape)
        cols = [np.zeros(shape, dtype=np.uint64) for _ in range(na + nb + 1)]
        for i in range(na):
            for j in range(nb):
                p = a64[i] * b64[j]
                cols[i + j] += p & M32
                cols[i + j + 1] += p >> s32
        out = []
        carry = np.zeros(shape, dtype=np.uint64)
        for c in range(na + nb):
            cur = cols[c] + carry
            out.append((cur & M32).astype(_U32))
            carry = cur >> s32
        return out
    out = [xp.zeros_like(a[0]) for _ in range(na + nb)]
    for i in range(na):
        carry = xp.zeros_like(a[0])
        for j in range(nb):
            lo, hi = _mul32(a[i], b[j])
            # out[i+j] += lo + carry; propagate into hi
            s = out[i + j] + lo
            c1 = (s < lo).astype(_U32)
            s2 = s + carry
            c2 = (s2 < carry).astype(_U32)
            out[i + j] = s2
            carry = hi + c1 + c2  # hi <= 2^32-2 so no overflow
        # propagate final carry
        k = i + nb
        while True:
            s = out[k] + carry
            c = (s < carry).astype(_U32)
            out[k] = s
            carry = c
            k += 1
            if k >= len(out):
                break
            # cheap exit: constant-zero carries still traced; keep full loop
        del carry
    return out


class LimbField:
    def __init__(self, modulus: int, n_limbs: int, generator: int, two_adicity: int,
                 two_adic_root: int, name: str):
        self.P = modulus
        self.n = n_limbs
        self.GENERATOR = generator
        self.TWO_ADICITY = two_adicity
        self.TWO_ADIC_ROOT_OF_UNITY = two_adic_root
        self.NAME = name
        R = 1 << (32 * n_limbs)
        self.E = R % modulus
        self.E_limbs_int = _int_to_limbs(self.E, _nbits_limbs(self.E))
        self.p_limbs_int = _int_to_limbs(modulus, n_limbs)

    # -- conversions --------------------------------------------------------

    def from_int(self, v: int, shape=()):
        v = int(v) % self.P
        return tuple(
            np.full(shape, (v >> (32 * i)) & 0xFFFFFFFF, dtype=np.uint64).astype(_U32)
            for i in range(self.n)
        )

    def from_ints(self, vals):
        arr = [int(v) % self.P for v in vals]
        return tuple(
            np.array([(v >> (32 * i)) & 0xFFFFFFFF for v in arr], dtype=np.uint64).astype(_U32)
            for i in range(self.n)
        )

    def to_ints(self, a):
        limbs = [np.asarray(x, dtype=np.uint64) for x in a]
        flat = [l.reshape(-1) for l in limbs]
        out = []
        for k in range(flat[0].shape[0]):
            v = 0
            for i in range(self.n):
                v |= int(flat[i][k]) << (32 * i)
            out.append(v)
        return out

    def zeros(self, shape, xp=np):
        return tuple(xp.zeros(shape, dtype=_U32) for _ in range(self.n))

    def ones(self, shape, xp=np):
        return (np.ones(shape, dtype=_U32) if xp is np else xp.ones(shape, dtype=_U32),) + tuple(
            xp.zeros(shape, dtype=_U32) for _ in range(self.n - 1)
        )

    # -- core ops ------------------------------------------------------------

    def _p_limbs(self, xp, like):
        return [xp.full_like(like, _U32(l)) for l in self.p_limbs_int]

    def _canon(self, limbs, xp):
        """One conditional subtract of p (inputs must be < 2p)."""
        p = self._p_limbs(xp, limbs[0])
        sub, borrow = _sub_limbs(limbs, p, xp)
        ge = borrow == 0
        return tuple(xp.where(ge, s, l) for s, l in zip(sub, limbs))

    def add(self, a, b):
        xp = _xp(a[0])
        s = _add_limbs(list(a), list(b), xp)  # n+1 limbs, top is carry(0/1)
        # a+b < 2p < 2^(32n+1); if carry, subtract p once from the extended value
        ext = s[: self.n]
        carry = s[self.n]
        # value = ext + carry*2^(32n) ≡ ext + carry*E (mod p)
        e = [xp.full_like(a[0], _U32(l)) for l in self.E_limbs_int]
        ce = [x * carry for x in e]  # carry ∈ {0,1}
        s2 = _add_limbs(ext, ce, xp)
        # adding E (< p) to ext (< 2^(32n)): may carry again only if ext close
        # to 2^(32n); fold once more then canonicalize twice
        ext2 = s2[: self.n]
        carry2 = s2[self.n]
        ce2 = [x * carry2 for x in e]
        s3 = _add_limbs(ext2, ce2, xp)
        out = tuple(s3[: self.n])
        out = self._canon(out, xp)
        return self._canon(out, xp)

    def sub(self, a, b):
        xp = _xp(a[0])
        d, borrow = _sub_limbs(list(a), list(b), xp)
        # on borrow, add p back
        p = self._p_limbs(xp, a[0])
        pb = [x * borrow for x in p]
        s = _add_limbs(d, pb, xp)
        return tuple(s[: self.n])

    def neg(self, a):
        xp = _xp(a[0])
        return self.sub(self.zeros(a[0].shape, xp), a)

    # -- native host kernels (limb_mod.c) ------------------------------------

    NATIVE_MIN_SIZE = 1  # measured (f128): numpy limb mul ~370 us at ANY small size vs ~25 us native incl. marshalling — native wins everywhere

    def _native_lib(self):
        if self.NAME not in ("f62", "f128"):
            return None
        if not hasattr(self, "_native_cached"):
            try:
                from ..native import get_limbmod

                self._native_cached = get_limbmod()
            except Exception:
                self._native_cached = None
        return self._native_cached

    def _plane_ptrs(self, planes):
        import ctypes

        PTR = ctypes.c_void_p * len(planes)
        return PTR(*[p.ctypes.data for p in planes])

    def _native_mul(self, a, b):
        """C single-pass mulmod when b is a suffix-repeating pattern of a
        (or vice versa); None -> numpy fallback."""
        lib = self._native_lib()
        if lib is None:
            return None
        if not all(isinstance(x, np.ndarray) and x.dtype == _U32 for x in a + b):
            return None
        if a[0].size < b[0].size:
            a, b = b, a
        if a[0].size < self.NATIVE_MIN_SIZE:
            return None
        bs = b[0].shape
        while bs and bs[0] == 1:
            bs = bs[1:]
        if bs != () and a[0].shape[len(a[0].shape) - len(bs):] != bs:
            return None
        shape = a[0].shape
        ac = [np.ascontiguousarray(x) for x in a]
        bc = [np.ascontiguousarray(x) for x in b]
        out = [np.empty(shape, dtype=_U32) for _ in range(self.n)]
        nb = max(1, int(b[0].size))
        if self.NAME == "f62":
            import ctypes

            pv = ctypes.c_void_p
            lib.f62_mulmod(
                ac[0].ctypes.data_as(pv), ac[1].ctypes.data_as(pv),
                bc[0].ctypes.data_as(pv), bc[1].ctypes.data_as(pv),
                out[0].ctypes.data_as(pv), out[1].ctypes.data_as(pv),
                a[0].size, nb,
            )
        else:
            lib.f128_mulmod(
                self._plane_ptrs(ac), self._plane_ptrs(bc),
                self._plane_ptrs(out), a[0].size, nb,
            )
        return tuple(out)

    def mul(self, a, b):
        xp = _xp(a[0])
        if xp is np:
            r = self._native_mul(tuple(a), tuple(b))
            if r is not None:
                return r
        prod = _mul_limbs(list(a), list(b), xp)  # 2n limbs
        return self._reduce(prod, xp)

    def square(self, a):
        xp = _xp(a[0])
        if xp is np:
            return self.mul(a, a)
        prod = _sqr_limbs(list(a), xp)
        return self._reduce(prod, xp)

    def _reduce(self, limbs, xp, bound: int = None):
        """Fold limbs beyond n via E = 2^(32n) mod p until the value fits n
        limbs.  A python-int value bound is tracked at trace time, so the
        fold count and limb truncations are static and sound under jit."""
        e = [xp.full_like(limbs[0], _U32(l)) for l in self.E_limbs_int]
        R = 1 << (32 * self.n)
        if bound is None:
            bound = (1 << (32 * len(limbs))) - 1
        cur = list(limbs)

        def fold():
            nonlocal cur, bound
            lo = cur[: self.n]
            hi = cur[self.n :]
            hi_bound = bound >> (32 * self.n)
            hi_e = _mul_limbs(hi, e, xp)
            s = _add_limbs(lo, hi_e, xp)
            bound = (R - 1) + hi_bound * self.E
            keep = max(self.n, (bound.bit_length() + 31) // 32)
            cur = s[:keep]

        # Phase A: while the high part has >= 2^32 of weight, each fold
        # shrinks the bound geometrically (divides hi by ~2^(32n-bits(E)))
        while bound >= (R << 32):
            fold()
        # Phase B: at most 3 more folds; the value strictly decreases by
        # >= R - E per fold with a nonzero top, so v < R is reached even
        # though the *bound* recursion alone has a fixed point just above R
        # (if top == 1 and v >= R then v' = v - R + E < 2E < R).
        for _ in range(3):
            if bound < R or len(cur) <= self.n:
                break
            fold()
        out = tuple(cur[: self.n])
        # conditional subtracts: value < R -> at most (R-1)//P subtracts
        for _ in range(max((R - 1) // self.P, 1)):
            out = self._canon(out, xp)
        return out

    def matvec(self, states, m_rows):
        """Dense matrix application over the state axis with DEFERRED
        reduction: out_i = sum_j m[i][j] * states[j], accumulated as raw
        limb products and reduced ONCE per output row instead of once per
        term (w reductions instead of w*w) — the AIR-side MDS / INV_MDS
        pattern, traceable, so the device CE path benefits too.  Constants
        use their minimal limb count (small MDS entries cost one u32
        multiply per state limb)."""
        xp = _xp(states[0][0])
        w = len(states)
        key = ("mv", tuple(tuple(int(v) for v in row) for row in m_rows))
        if not hasattr(self, "_mv_cache"):
            self._mv_cache = {}
        if key in self._mv_cache:
            consts = self._mv_cache[key]
        else:
            consts = [
                [
                    _int_to_limbs(
                        int(m_rows[i][j]) % self.P,
                        _nbits_limbs(int(m_rows[i][j]) % self.P),
                    )
                    if int(m_rows[i][j]) % self.P
                    else None
                    for j in range(w)
                ]
                for i in range(w)
            ]
            self._mv_cache[key] = consts
        if (
            xp is np
            and w <= 16
            and isinstance(states[0][0], np.ndarray)
            and states[0][0].size >= self.NATIVE_MIN_SIZE
            and all(
                s[0].shape == states[0][0].shape and s[0].dtype == _U32
                for s in states
            )
        ):
            lib = self._native_lib()
            if lib is not None:
                shape = states[0][0].shape
                n_el = states[0][0].size
                planes = []
                for s in states:
                    planes.extend(np.ascontiguousarray(x) for x in s)
                outs = [
                    np.empty(shape, dtype=_U32) for _ in range(self.n * w)
                ]
                if self.NAME == "f62":
                    mvals = np.array(
                        [int(m_rows[i][j]) % self.P for i in range(w)
                         for j in range(w)],
                        dtype=np.uint64,
                    )
                    fn = lib.f62_matvec
                else:
                    flat = []
                    for i in range(w):
                        for j in range(w):
                            v = int(m_rows[i][j]) % self.P
                            flat.append(v & ((1 << 64) - 1))
                            flat.append(v >> 64)
                    mvals = np.array(flat, dtype=np.uint64)
                    fn = lib.f128_matvec
                import ctypes

                fn(
                    w, self._plane_ptrs(planes),
                    mvals.ctypes.data_as(ctypes.c_void_p),
                    self._plane_ptrs(outs), n_el,
                )
                return [
                    tuple(outs[self.n * i + l] for l in range(self.n))
                    for i in range(w)
                ]
        if xp is not np:
            from . import mxu_ntt

            batch = 1
            for dim in states[0][0].shape:
                batch *= int(dim)
            if mxu_ntt.enabled(xp) and mxu_ntt.matvec_ok(self, w, batch):
                # MDS/INV_MDS over a wide CE-domain batch: one int8 MXU
                # matmul instead of w*w schoolbook limb products (identical
                # canonical outputs — tests/test_mxu_ntt.py differential)
                return mxu_ntt.matvec_tile(self, states, m_rows)
        p2 = (self.P - 1) ** 2
        outs = []
        for i in range(w):
            acc = None
            bound = 0
            for j in range(w):
                cl = consts[i][j]
                if cl is None:
                    continue
                c = [xp.full_like(states[j][0], _U32(l)) for l in cl]
                prod = _mul_limbs(list(states[j]), c, xp)
                bound += p2
                if acc is None:
                    acc = prod
                else:
                    keep = (bound.bit_length() + 31) // 32
                    acc = _add_limbs(acc, prod, xp)[:keep]
            if acc is None:
                outs.append(self.zeros(states[0][0].shape, xp))
            else:
                outs.append(self._reduce(acc, xp, bound=bound))
        return outs

    def exp_int(self, a, e: int):
        xp = _xp(a[0])
        e = int(e)
        if e == 0:
            return self.ones(a[0].shape, xp)
        if xp is not np and e.bit_length() > 8:
            return self._exp_loop_jax(a, e)
        result = None
        base = a
        while e:
            if e & 1:
                result = base if result is None else self.mul(result, base)
            e >>= 1
            if e:
                base = self.square(base)
        return result

    def _exp_loop_jax(self, a, e: int):
        import jax
        import jax.numpy as jnp

        nbits = e.bit_length()
        bits = jnp.asarray(
            np.array([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=np.uint32)
        )
        one = self.ones(a[0].shape, jnp)

        def body(i, r):
            r2 = self.square(r)
            m = self.mul(r2, a)
            cond = bits[i] == 1
            return tuple(jnp.where(cond, x, y) for x, y in zip(m, r2))

        return jax.lax.fori_loop(0, nbits, body, one)

    def inv(self, a):
        return self.exp_int(a, self.P - 2)

    def get_root_of_unity(self, log_n: int) -> int:
        assert 0 < log_n <= self.TWO_ADICITY
        return pow(self.TWO_ADIC_ROOT_OF_UNITY, 1 << (self.TWO_ADICITY - log_n), self.P)

    # -- NTT (generic radix-2 DIT, natural order — same structure as the
    # -- Goldilocks ops/ntt.py specialization) -------------------------------

    def _stage_twiddles(self, n: int, inverse: bool):
        key = ("tw", n, inverse)
        if not hasattr(self, "_tw_cache"):
            self._tw_cache = {}
        if key in self._tw_cache:
            return self._tw_cache[key]
        bits = n.bit_length() - 1
        root = self.get_root_of_unity(bits)
        if inverse:
            root = pow(root, self.P - 2, self.P)
        tables = []
        for s in range(1, bits + 1):
            m = 1 << s
            w_m = pow(root, n // m, self.P)
            half = m // 2
            vals = []
            acc = 1
            for _ in range(half):
                vals.append(acc)
                acc = acc * w_m % self.P
            tables.append(self.from_ints(vals))
        self._tw_cache[key] = tables
        return tables

    def _bit_rev(self, n: int):
        bits = n.bit_length() - 1
        idx = np.arange(n, dtype=np.int32)
        rev = np.zeros(n, dtype=np.int32)
        for b in range(bits):
            rev |= ((idx >> b) & 1) << (bits - 1 - b)
        return rev

    # Tiles above this size switch to the four-step decomposition: the
    # radix-2 path's runtime bit-reversal gather and per-stage twiddle
    # constants grow with n and blew up XLA compiles at 2^20 scale
    # (round-1 finding for f64; same medicine here: small-tile transforms +
    # all large tables built ON DEVICE by log-doubling from <=4096-entry
    # constants, so the traced graph stays O(log n) ops with tiny literals).
    MAX_NTT_TILE = 4096

    # Pallas tile-kernel engagement thresholds: the fused-VMEM kernel wins
    # when the stage loop would otherwise make many HBM passes over a big
    # array; tiny transforms stay on plain XLA (each new (n, lanes) shape
    # costs one Mosaic compile — expensive through the axon remote tunnel).
    PALLAS_MIN_N = 256
    PALLAS_MIN_LANES = 64

    def _pallas_on(self, xp) -> bool:
        if xp is np:
            return False
        from .pallas import limb_kernel

        return limb_kernel.enabled()

    def _tile_cap(self, xp, n: int = None, batch: int = None) -> int:
        """Largest tile transform for this array backend: the Pallas kernel's
        VMEM budget caps k=4 tiles at 2048 (the XLA path takes 4096); the
        MXU matmul engine targets small dense tiles (the four-step recursion
        builds any n as a tower of them).

        The MXU cap only applies to transforms that would four-step under
        the VPU cap anyway (n > cap): the measured win (.exp/mxu_ab.py) is
        the tile ENGINE at four-step sizes — towering a transform that fits
        one VPU tile would regress small/medium configs.  And it only
        applies when the resulting tile batch (>= batch * n / SPLIT_CAP)
        can actually fill the MXU lanes (mirrors _use_mxu_tile's MIN_BATCH)
        — a narrow-batch split would fail the tile gate and fall to tiny
        plain-XLA radix-2 transforms instead of the larger VPU tiles."""
        from . import mxu_ntt

        if self._pallas_on(xp):
            from .pallas import limb_kernel

            cap = min(self.MAX_NTT_TILE, limb_kernel.max_tile(self))
        else:
            cap = self.MAX_NTT_TILE
        if mxu_ntt.enabled(xp) and (n is None or n > cap):
            if (
                batch is None
                or n is None
                or batch * (n // mxu_ntt.SPLIT_CAP) >= mxu_ntt.MIN_BATCH
            ):
                return mxu_ntt.SPLIT_CAP
        return cap

    def _use_pallas_tile(self, a, n: int) -> bool:
        if not self._pallas_on(_xp(a[0])):
            return False
        from .pallas import limb_kernel

        shape = a[0].shape
        batch = 1
        for d in shape[:-1]:
            batch *= int(d)
        return (
            self.PALLAS_MIN_N <= n <= limb_kernel.max_tile(self)
            and batch >= self.PALLAS_MIN_LANES
        )

    def _use_mxu_tile(self, a, n: int) -> bool:
        from . import mxu_ntt

        if not mxu_ntt.enabled(_xp(a[0])):
            return False
        shape = a[0].shape
        batch = 1
        for d in shape[:-1]:
            batch *= int(d)
        return (
            mxu_ntt.MIN_TILE <= n <= mxu_ntt.MAX_TILE
            and batch >= mxu_ntt.MIN_BATCH
        )

    def _pow_series(self, bases, length: int, xp):
        """bases: limb tuple shaped (..., 1) -> (..., length) power series
        out[..., j] = base^j, via log-doubling (log2(length) muls)."""
        cur = self.ones(bases[0].shape[:-1] + (1,), xp)
        pw = bases
        ln = 1
        while ln < length:
            nxt = self.mul(cur, pw)
            cur = tuple(
                xp.concatenate([x, y], axis=-1) for x, y in zip(cur, nxt)
            )
            ln *= 2
            if ln < length:
                pw = self.mul(pw, pw)
        if cur[0].shape[-1] != length:
            cur = tuple(l[..., :length] for l in cur)
        return cur

    def _split_tiles(self, n: int, cap: int = None):
        cap = self.MAX_NTT_TILE if cap is None else cap
        bits = n.bit_length() - 1
        r = 1 << ((bits + 1) // 2)
        while r > cap:
            r >>= 1
        c = n // r
        # c may exceed cap: ntt() recurses into another four-step level on
        # the column axis, so any n builds as a tower of <=cap tiles
        return r, c

    def _ntt_four_step(self, a, inverse: bool, xp, pre_row=None, pre_col=None):
        """Four-step NTT along the last axis (n = r*c, both tiles small):

          M[t1, t2] = x[t1*c + t2]          (view (..., r, c))
          A[j1, t2] = NTT_r over t1         (tile transform, axis -2)
          A        *= w_n^{±j1*t2}          (T table, built on device)
          O[j1, j2] = NTT_c over t2         (tile transform, axis -1)
          X[j1 + r*j2] = O[j1, j2]          (swapaxes + reshape)

        pre_row/pre_col: optional input scales s^{c*t1} / s^{t2} (limb
        tuples broadcastable against (..., r, 1) / (..., 1, c)) — any
        power-series input scaling s^t factors through the tile split, so
        coset offsets never materialize length-n tables."""
        n = a[0].shape[-1]
        r, c = self._split_tiles(
            n, self._tile_cap(xp, n, batch=_leading_batch(a))
        )
        bits = n.bit_length() - 1
        root = self.get_root_of_unity(bits)
        if inverse:
            root = pow(root, self.P - 2, self.P)
        # T[j1, t2] = root^{j1*t2}: log-doubled on device from the (r,)-entry
        # per-row bases root^{j1} (a tiny host constant)
        w_pows = self.from_ints([pow(root, j, self.P) for j in range(r)])
        bases = tuple(xp.asarray(l)[:, None] for l in w_pows)
        T = self._pow_series(bases, c, xp)  # (r, c)
        M = tuple(l.reshape(l.shape[:-1] + (r, c)) for l in a)
        if pre_row is not None:
            M = self.mul(M, pre_row)
        if pre_col is not None:
            M = self.mul(M, pre_col)
        Am = tuple(xp.moveaxis(l, -2, -1) for l in M)  # (..., c, r)
        A = self.ntt(Am, inverse=inverse, scale=False)
        A = tuple(xp.moveaxis(l, -1, -2) for l in A)  # (..., r, c)
        A = self.mul(A, T)
        O = self.ntt(A, inverse=inverse, scale=False)
        X = tuple(
            xp.swapaxes(l, -1, -2).reshape(l.shape[:-2] + (n,)) for l in O
        )
        return X

    def ntt(self, a, inverse: bool = False, scale: bool = True):
        """Transform along the last axis of a limb tuple (each limb shaped
        (..., n)); natural order in/out, matching ops/ntt.py semantics."""
        xp = _xp(a[0])
        n = a[0].shape[-1]
        if n == 1:
            return a
        if n > self._tile_cap(xp, n, batch=_leading_batch(a)):
            a = self._ntt_four_step(a, inverse, xp)
            if inverse and scale:
                n_inv = self.from_int(pow(n, self.P - 2, self.P))
                a = self.mul(a, tuple(xp.asarray(x) for x in n_inv))
            return a
        if xp is not np and self._use_mxu_tile(a, n):
            from . import mxu_ntt

            a = mxu_ntt.ntt_tile(self, a, inverse)
            if inverse and scale:
                n_inv = self.from_int(pow(n, self.P - 2, self.P))
                a = self.mul(a, tuple(xp.asarray(x) for x in n_inv))
            return a
        if xp is not np and self._use_pallas_tile(a, n):
            from .pallas import limb_kernel

            a = limb_kernel.ntt_last_axis(self, a, inverse)
            if inverse and scale:
                n_inv = self.from_int(pow(n, self.P - 2, self.P))
                a = self.mul(a, tuple(xp.asarray(x) for x in n_inv))
            return a
        bits = n.bit_length() - 1
        rev = self._bit_rev(n)
        tables = self._stage_twiddles(n, inverse)
        if xp is np:
            r = self._ntt_stages_native(a, n, bits, tables, rev)
            if r is not None:
                if inverse and scale:
                    n_inv = self.from_int(pow(n, self.P - 2, self.P))
                    r = self.mul(r, n_inv)
                return r
        a = tuple(xp.take(l, rev, axis=-1) for l in a)
        for s in range(1, bits + 1):
            m = 1 << s
            half = m // 2
            tw = tuple(xp.asarray(t) for t in tables[s - 1])
            shp = a[0].shape[:-1] + (n // m, m)
            y = tuple(l.reshape(shp) for l in a)
            e = tuple(l[..., :half] for l in y)
            o = tuple(l[..., half:] for l in y)
            t = self.mul(o, tw)
            plus = self.add(e, t)
            minus = self.sub(e, t)
            a = tuple(
                xp.concatenate([p, mi], axis=-1).reshape(a[0].shape)
                for p, mi in zip(plus, minus)
            )
        if inverse and scale:
            n_inv = self.from_int(pow(n, self.P - 2, self.P))
            a = self.mul(a, tuple(xp.asarray(x) for x in n_inv))
        return a

    def _ntt_stages_native(self, a, n: int, bits: int, tables, rev):
        """Bit-reversal gather + all butterfly stages through the fused
        single-pass C kernels; None if unavailable or too small."""
        lib = self._native_lib()
        if lib is None or a[0].size < self.NATIVE_MIN_SIZE:
            return None
        import ctypes

        from ..native import get_gl64mod

        shape = a[0].shape
        src = [np.ascontiguousarray(x).reshape(-1) for x in a]
        total = src[0].size
        glib = get_gl64mod()  # gl_gather is a field-agnostic plane permute
        if glib is None:
            return None
        rev = np.ascontiguousarray(np.asarray(rev, dtype=np.int32))
        cur = [np.empty_like(x) for x in src]
        pv = ctypes.c_void_p
        for k in range(0, len(src), 2):
            glib.gl_gather(
                src[k].ctypes.data_as(pv), src[k + 1].ctypes.data_as(pv),
                rev.ctypes.data_as(pv),
                cur[k].ctypes.data_as(pv), cur[k + 1].ctypes.data_as(pv),
                total // n, n,
            )
        nxt = [np.empty_like(x) for x in cur]
        for s in range(1, bits + 1):
            tw = [np.ascontiguousarray(t) for t in tables[s - 1]]
            if self.NAME == "f62":
                import ctypes

                pv = ctypes.c_void_p
                lib.f62_ntt_stage(
                    cur[0].ctypes.data_as(pv), cur[1].ctypes.data_as(pv),
                    tw[0].ctypes.data_as(pv), tw[1].ctypes.data_as(pv),
                    nxt[0].ctypes.data_as(pv), nxt[1].ctypes.data_as(pv),
                    total, 1 << s,
                )
            else:
                lib.f128_ntt_stage(
                    self._plane_ptrs(cur), self._plane_ptrs(tw),
                    self._plane_ptrs(nxt), total, 1 << s,
                )
            cur, nxt = nxt, cur
        return tuple(x.reshape(shape) for x in cur)

    def evaluate_poly_with_offset(self, a, domain_offset: int, blowup: int):
        """Coset LDE: scale coeffs by offset^j, zero-pad, transform.  Above
        the tile limit this runs as blowup independent coset NTTs of length
        n (math/src/fft/serial.rs:26-57's chunking) with the per-coset
        offset series factored through the four-step tiles, then a
        gather-free interleave — no length-L table or python-pow loop."""
        xp = _xp(a[0])
        n = a[0].shape[-1]
        L = n * blowup
        if L > self._tile_cap(xp, L, batch=_leading_batch(a)):
            return self._lde_cosets(a, domain_offset, blowup, xp)
        offs = self.from_ints(
            [pow(domain_offset, j, self.P) for j in range(n)]
        )
        scaled = self.mul(a, tuple(xp.asarray(x) for x in offs))
        pad_shape = a[0].shape[:-1] + (n * (blowup - 1),)
        padded = tuple(
            xp.concatenate([l, xp.zeros(pad_shape, dtype=_U32)], axis=-1)
            for l in scaled
        )
        return self.ntt(padded)

    def _lde_cosets(self, a, domain_offset: int, blowup: int, xp):
        """evals on coset r (natural index i = q*blowup + r) = NTT_n of
        coeffs scaled by s_r^t, s_r = offset * g_L^r."""
        n = a[0].shape[-1]
        L = n * blowup
        nbatch = len(a[0].shape) - 1
        g_L = self.get_root_of_unity(L.bit_length() - 1)
        s_list = [
            (domain_offset * pow(g_L, r, self.P)) % self.P
            for r in range(blowup)
        ]
        cap = self._tile_cap(xp, n, batch=blowup * _leading_batch(a))
        if n > cap:
            # split with the SAME cap _ntt_four_step will use (its input
            # carries the leading blowup axis, so its batch matches), or
            # the pre_row/pre_col table shapes won't match its tile view
            r_t, c_t = self._split_tiles(n, cap)
            # s^t = (s^c)^{t1} * s^{t2} across the (r_t, c_t) tile view
            row_b = self.from_ints([pow(s, c_t, self.P) for s in s_list])
            col_b = self.from_ints(s_list)
            pre_row = self._pow_series(
                tuple(xp.asarray(l).reshape(blowup, 1) for l in row_b),
                r_t, xp,
            )
            pre_row = tuple(
                l.reshape((blowup,) + (1,) * nbatch + (r_t, 1))
                for l in pre_row
            )
            pre_col = self._pow_series(
                tuple(xp.asarray(l).reshape(blowup, 1) for l in col_b),
                c_t, xp,
            )
            pre_col = tuple(
                l.reshape((blowup,) + (1,) * nbatch + (1, c_t))
                for l in pre_col
            )
            stacked = tuple(l[None] for l in a)  # (1, ..., n) broadcasts
            ev = self._ntt_four_step(
                tuple(xp.broadcast_to(l, (blowup,) + a[0].shape)
                      for l in stacked),
                False, xp, pre_row=pre_row, pre_col=pre_col,
            )  # (blowup, ..., n)
        else:
            col_b = self.from_ints(s_list)
            series = self._pow_series(
                tuple(xp.asarray(l).reshape(blowup, 1) for l in col_b), n, xp
            )  # (blowup, n)
            series = tuple(
                l.reshape((blowup,) + (1,) * nbatch + (n,)) for l in series
            )
            scaled = self.mul(tuple(l[None] for l in a), series)
            ev = self.ntt(scaled)
        # interleave: out[..., q*blowup + r] = ev[r, ..., q]
        out = tuple(
            xp.moveaxis(l, 0, -1).reshape(a[0].shape[:-1] + (L,)) for l in ev
        )
        return out

    def interpolate_poly(self, a):
        return self.ntt(a, inverse=True, scale=True)

    def interpolate_poly_with_offset(self, a, domain_offset: int):
        xp = _xp(a[0])
        n = a[0].shape[-1]
        coeffs = self.ntt(a, inverse=True, scale=True)
        inv_off = pow(domain_offset, self.P - 2, self.P)
        if n > self.MAX_NTT_TILE:
            base = tuple(xp.asarray(l).reshape(1) for l in
                         self.from_int(inv_off, (1,)))
            offs = self._pow_series(base, n, xp)
        else:
            offs = tuple(
                xp.asarray(x)
                for x in self.from_ints(
                    [pow(inv_off, j, self.P) for j in range(n)]
                )
            )
        return self.mul(coeffs, offs)

    def horner(self, coeffs, x):
        """Evaluate along the last axis at point-array x (shape = remaining
        axes)."""
        n = coeffs[0].shape[-1]
        acc = tuple(l[..., n - 1] for l in coeffs)
        for j in range(n - 2, -1, -1):
            term = tuple(l[..., j] for l in coeffs)
            acc = self.add(self.mul(acc, x), term)
        return acc

    def apply_drp(self, transposed, domain_offset: int, alpha: int):
        """FRI degree-respecting projection over this field (base-field
        evaluations; semantics of fri/src/folding/mod.rs:85-117): transposed
        shape (m, N); returns folded evaluations (m,)."""
        xp = _xp(transposed[0])
        m, N = transposed[0].shape
        coeffs = self.ntt(transposed, inverse=True, scale=True)
        src_size = m * N
        g = self.get_root_of_unity(src_size.bit_length() - 1)
        inv_g = pow(g, self.P - 2, self.P)
        inv_c = pow(domain_offset, self.P - 2, self.P)
        inv_offs = self.from_ints(
            [inv_c * pow(inv_g, i, self.P) % self.P for i in range(m)]
        )
        alpha_l = self.from_int(alpha % self.P, ())
        x = self.mul(
            tuple(xp.asarray(o) for o in inv_offs),
            tuple(xp.asarray(al) for al in alpha_l),
        )
        return self.horner(coeffs, x)


def _is_static_zero(arr) -> bool:
    """True only for concrete all-zero numpy arrays (safe under tracing)."""
    return isinstance(arr, np.ndarray) and not arr.any()


def _nbits_limbs(v: int) -> int:
    return max(1, (v.bit_length() + 31) // 32)


def _int_to_limbs(v: int, n: int):
    return [(v >> (32 * i)) & 0xFFFFFFFF for i in range(n)]


# field instances (constants from math/src/field/{f62,f128}/mod.rs)
F62 = LimbField(
    modulus=4611624995532046337,  # 2^62 - 111*2^39 + 1 (f62/mod.rs:32)
    n_limbs=2,
    generator=3,
    two_adicity=39,
    two_adic_root=4421547261963328785,  # g with g^(2^39) == 1
    name="f62",
)

F128 = LimbField(
    modulus=340282366920938463463374557953744961537,  # 2^128 - 45*2^40 + 1
    n_limbs=4,
    generator=3,
    two_adicity=40,
    two_adic_root=23953097886125630542083529559205016746,  # f128/mod.rs
    name="f128",
)

# Goldilocks as a generic limb field: ops/gl64.py's specialized EPS
# reduction owns the f64 hot path, but the (lo, hi) u32 representation is
# exactly a 2-limb canonical element, so generic consumers (the MXU matmul
# NTT tile) can reduce f64 rows with the E-fold path (E = 2^32 - 1).
GL64_LIMB = LimbField(
    modulus=0xFFFFFFFF00000001,
    n_limbs=2,
    generator=7,
    two_adicity=32,
    two_adic_root=7277203076849721926,  # f64/mod.rs:262
    name="f64-limb",
)

FIELDS_BY_NAME = {F62.NAME: F62, F128.NAME: F128, GL64_LIMB.NAME: GL64_LIMB}
