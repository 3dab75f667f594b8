"""Field-backend abstraction: one vectorized-element API over every base
field (f64 / f62 / f128).

An element array is a tuple of ``deg`` *components* (extension coordinates);
each component is a tuple of u32 limb arrays — 2 limbs for f64/f62, 4 for
f128.  The Goldilocks (lo, hi) pairs used throughout the original pipeline
are exactly the 2-limb case, so ``GL64Backend`` simply delegates to the
specialized ops (ops/gl64, ops/gl64_ext, ops/ntt, utils/convert) and is
bit-for-bit identical to calling them directly, while ``LimbBackend`` runs
the same algorithms through the generic N-limb field (ops/limb_field).

This mirrors how the reference makes the whole prover generic over
``FieldElement`` (math/src/field/traits.rs:29, prover/src/lib.rs:124) —
but as a runtime object instead of a compile-time type parameter, which is
the natural JAX design: the backend only decides *trace-time* structure
(limb counts, reduction shapes); the compiled XLA program stays static.
"""

from __future__ import annotations

import numpy as np

from ..math.fieldspec import F62_SPEC, F128_SPEC, GL64_SPEC


class FieldBackend:
    """Generic implementation over a base-op provider; subclasses bind the
    base field.  Required base ops (single component = tuple of limbs):
    badd/bsub/bneg/bmul/bsquare/binv/bzeros/bones/bwhere/beq/b_from_int and
    NTT entry points."""

    def __init__(self, spec):
        self.spec = spec
        self.name = spec.name
        self.P = spec.P
        self.ELEMENT_BYTES = spec.ELEMENT_BYTES
        self.n_words = spec.ELEMENT_BYTES // 4

    # -- structural helpers --------------------------------------------------

    @staticmethod
    def _xp(comp):
        if isinstance(comp[0], (np.ndarray, np.generic)):
            return np
        import jax.numpy as jnp

        return jnp

    @staticmethod
    def cmap(f, comp):
        """Apply an array op limb-wise to one component."""
        return tuple(f(l) for l in comp)

    def emap(self, f, elem):
        """Apply an array op limb-wise to every component of an element."""
        return tuple(self.cmap(f, c) for c in elem)

    # -- element-level ops ----------------------------------------------------

    def promote(self, a, target_deg: int):
        if len(a) == target_deg:
            return a
        assert len(a) == 1, "can only promote base elements"
        xp = self._xp(a[0])
        z = self.cmap(xp.zeros_like, a[0])
        return a + (z,) * (target_deg - 1)

    def vadd(self, a, b):
        d = max(len(a), len(b))
        a, b = self.promote(a, d), self.promote(b, d)
        return tuple(self.badd(x, y) for x, y in zip(a, b))

    def vsub(self, a, b):
        d = max(len(a), len(b))
        a, b = self.promote(a, d), self.promote(b, d)
        return tuple(self.bsub(x, y) for x, y in zip(a, b))

    def vneg(self, a):
        return tuple(self.bneg(x) for x in a)

    def vmul(self, a, b):
        if len(a) == 1 and len(b) == 1:
            return (self.bmul(a[0], b[0]),)
        if len(b) == 1:
            return tuple(self.bmul(x, b[0]) for x in a)
        if len(a) == 1:
            return tuple(self.bmul(a[0], y) for y in b)
        return self.ext_mul(a, b)

    def vsquare(self, a):
        if len(a) == 1:
            return (self.bsquare(a[0]),)
        return self.ext_mul(a, a)

    def vinv(self, a):
        if len(a) == 1:
            # Montgomery-trick batch inverse: one field inversion total
            # instead of a Fermat chain per call (host verifier hot path)
            if self._xp(a[0]) is np:
                return (self.b_batch_inv(a[0]),)
            return (self.binv(a[0]),)
        return self.ext_inv(a)

    def vzeros(self, shape, d: int = 1, xp=np):
        return tuple(self.b_zeros(shape, xp) for _ in range(d))

    def vones(self, shape, d: int = 1, xp=np):
        return (self.b_ones(shape, xp),) + tuple(
            self.b_zeros(shape, xp) for _ in range(d - 1)
        )

    def vwhere(self, cond, a, b):
        d = max(len(a), len(b))
        a, b = self.promote(a, d), self.promote(b, d)
        return tuple(self.bwhere(cond, x, y) for x, y in zip(a, b))

    def vbroadcast(self, a, shape):
        xp = self._xp(a[0])
        return self.emap(lambda l: xp.broadcast_to(l, shape), a)

    def vsum(self, a, axis=-1):
        """Modular sum along an axis via log-halving tree reduction."""
        comps = a
        n = comps[0][0].shape[axis]
        axis = axis % comps[0][0].ndim
        xp = self._xp(comps[0])
        while n > 1:
            half = n // 2

            def sl(start, stop):
                idx = [slice(None)] * comps[0][0].ndim
                idx[axis] = slice(start, stop)
                return tuple(idx)

            lo_i, hi_i, rem_i = sl(0, half), sl(half, 2 * half), sl(2 * half, n)
            new_comps = []
            for c in comps:
                s = self.badd(
                    self.cmap(lambda l: l[lo_i], c), self.cmap(lambda l: l[hi_i], c)
                )
                if n % 2:
                    s = tuple(
                        xp.concatenate([sv, l[rem_i]], axis=axis)
                        for sv, l in zip(s, c)
                    )
                new_comps.append(s)
            comps = tuple(new_comps)
            n = comps[0][0].shape[axis]
        idx = [slice(None)] * comps[0][0].ndim
        idx[axis] = 0
        idx = tuple(idx)
        return tuple(self.cmap(lambda l: l[idx], c) for c in comps)

    def horner(self, coeffs, x, axis=-1):
        n = coeffs[0][0].shape[axis]
        axis = axis % coeffs[0][0].ndim

        def take(j):
            idx = [slice(None)] * coeffs[0][0].ndim
            idx[axis] = j
            idx_t = tuple(idx)
            return tuple(self.cmap(lambda l: l[idx_t], c) for c in coeffs)

        acc = take(n - 1)
        for j in range(n - 2, -1, -1):
            acc = self.vadd(self.vmul(acc, x), take(j))
        return acc

    def suffix_sums(self, a, axis=-1):
        """Inclusive suffix sums via Hillis-Steele doubling."""
        xp = self._xp(a[0])
        n = a[0][0].shape[axis]
        axis = axis % a[0][0].ndim
        comps = a
        shift = 1
        while shift < n:
            new_comps = []
            for c in comps:
                pad_idx = [slice(None)] * c[0].ndim
                pad_idx[axis] = slice(shift, n)
                pad_idx = tuple(pad_idx)
                z_idx = [slice(None)] * c[0].ndim
                z_idx[axis] = slice(0, shift)
                z_idx = tuple(z_idx)
                shifted = tuple(
                    xp.concatenate(
                        [l[pad_idx], xp.zeros_like(l[z_idx])], axis=axis
                    )
                    for l in c
                )
                new_comps.append(shifted)
            comps = tuple(self.badd(c, s) for c, s in zip(comps, new_comps))
            shift *= 2
        return comps

    def syn_div_binomial(self, p, z):
        """Divide coeff vector p by (x - z), p(z) == 0, via the parallel
        suffix-scan identity q_i = z^{-(i+1)} * sum_{j>i} p_j z^j."""
        xp = self._xp(p[0])
        nn = p[0][0].shape[-1]
        d = max(len(p), len(z))
        zp = self.power_series_elem(z, nn)
        s = self.vmul(self.promote(p, d), zp)
        suf = self.suffix_sums(s, axis=-1)
        excl = tuple(
            self.cmap(
                lambda l: xp.concatenate(
                    [l[..., 1:], xp.zeros_like(l[..., :1])], axis=-1
                ),
                c,
            )
            for c in suf
        )
        z_inv = self.vinv(z)
        zi = self.power_series_elem(z_inv, nn)
        zi = self.vmul(zi, self.vbroadcast(z_inv, (nn,)))
        return self.vmul(excl, zi)

    def power_series_elem(self, x, n: int):
        """[1, x, ..., x^(n-1)] for an element array x of shape (1,)."""
        xp = self._xp(x[0])
        d = len(x)
        out = self.vones((1,), d, xp)
        length = 1
        cur_pow = x
        while length < n:
            nxt = self.vmul(out, self.vbroadcast(cur_pow, out[0][0].shape))
            out = tuple(
                tuple(xp.concatenate([la, lb]) for la, lb in zip(a, b))
                for a, b in zip(out, nxt)
            )
            length *= 2
            if length < n:
                cur_pow = self.vsquare(cur_pow)
        return tuple(self.cmap(lambda l: l[:n], c) for c in out)

    # -- generic extension arithmetic (overridden by GL64Backend) ------------

    def ext_mul(self, a, b):
        """Schoolbook component product + reduction by the extension poly
        (fieldspec reduction constants), all in vectorized base ops."""
        d = len(a)
        assert len(b) == d
        full = [None] * (2 * d - 1)
        for i in range(d):
            for j in range(d):
                p = self.bmul(a[i], b[j])
                k = i + j
                full[k] = p if full[k] is None else self.badd(full[k], p)
        return self._ext_reduce(full, d)

    def _ext_reduce(self, full, d: int):
        """Fold coefficients of x^d.. back using x^d = sum r_k x^k."""
        if d == 2:
            q1, q0 = self.spec.quad_reduce
            reduce_rows = [[q0 % self.P, q1 % self.P]]
        elif d == 3:
            assert self.spec.cubic_reduce is not None, (
                f"{self.name} has no cubic extension"
            )
            e2, e1, e0 = [v % self.P for v in self.spec.cubic_reduce]
            # x^3 = e2 x^2 + e1 x + e0 ; x^4 = x * x^3 reduced
            r4 = [
                (e2 * e0) % self.P,
                (e0 + e2 * e1) % self.P,
                (e1 + e2 * e2) % self.P,
            ]
            reduce_rows = [[e0, e1, e2], r4]
        else:
            raise ValueError(f"unsupported extension degree {d}")
        out = list(full[:d])
        for k in range(d, 2 * d - 1):
            row = reduce_rows[k - d]
            for t in range(d):
                if row[t] == 0:
                    continue
                c = self._bconst_like(row[t], full[k])
                out[t] = self.badd(out[t], self.bmul(full[k], c))
        return tuple(out)

    def _bconst_like(self, v: int, like_comp):
        xp = self._xp(like_comp)
        c = self.b_from_int(v, (1,))
        return self.cmap(xp.asarray, c)

    def ext_inv(self, a):
        """Extension inverse.  Quadratic: conjugate/norm formula from the
        reduction poly x^2 - q1 x - q0 (conj(x) = q1 - x).  Cubic: host
        round-trip via the FieldSpec scalar inverse (only used on tiny
        host-side arrays such as the DEEP z)."""
        d = len(a)
        if d == 2:
            q1, q0 = [v % self.P for v in self.spec.quad_reduce]
            a0, a1 = a
            q1c = self._bconst_like(q1, a0)
            q0c = self._bconst_like(q0, a0)
            # conj = (a0 + q1*a1, -a1); N = a0^2 + q1 a0 a1 - q0 a1^2
            conj0 = self.badd(a0, self.bmul(a1, q1c))
            n_val = self.badd(
                self.bsquare(a0),
                self.bsub(
                    self.bmul(self.bmul(a0, a1), q1c),
                    self.bmul(self.bsquare(a1), q0c),
                ),
            )
            if self._xp(n_val) is np:
                ninv = self.b_batch_inv(n_val)
            else:
                ninv = self.binv(n_val)
            return (self.bmul(conj0, ninv), self.bneg(self.bmul(a1, ninv)))
        # cubic: host scalar fallback
        vals = self.limbs_to_elems(a, d)
        inv = [self.spec.finv(v) for v in vals]
        return self.elems_to_limbs(inv, d)

    # -- conversions ----------------------------------------------------------

    def scalar_to_limbs(self, v, deg: int, shape=(1,)):
        comps = self.spec.components(self.spec.embed(v, deg))
        return tuple(self.b_from_int(c, shape) for c in comps)

    def elems_to_limbs(self, elements, deg: int):
        # fast paths: avoid a python embed/components round trip per element
        if deg == 1:
            return (self.b_from_ints(elements),)
        cols = [[0] * len(elements) for _ in range(deg)]
        for i, e in enumerate(elements):
            if isinstance(e, tuple):
                for c in range(len(e)):
                    cols[c][i] = e[c]
            else:
                cols[0][i] = e
        return tuple(self.b_from_ints(col) for col in cols)

    def limbs_to_elems(self, comps, deg: int):
        cols = [self.b_to_ints(c) for c in comps]
        n = len(cols[0])
        if deg == 1:
            return cols[0]
        return [tuple(cols[c][i] for c in range(deg)) for i in range(n)]

    def rows_to_words(self, comps, deg: int):
        """Row data -> hash word layout: per element, its components in
        order, each component as little-endian u32 limb words.
        comps: tuple of deg components, limbs shaped (..., W)."""
        xp = self._xp(comps[0])
        parts = [xp.stack(c, axis=-1) for c in comps]  # (..., W, n_limbs)
        stacked = xp.stack(parts, axis=-2)  # (..., W, deg, n_limbs)
        nl = stacked.shape[-1]
        shape = stacked.shape[:-3] + (stacked.shape[-3] * deg * nl,)
        return stacked.reshape(shape)

    # -- base ops: to be provided by subclasses -------------------------------

    def badd(self, a, b):
        raise NotImplementedError

    def bsub(self, a, b):
        raise NotImplementedError

    def bneg(self, a):
        raise NotImplementedError

    def bmul(self, a, b):
        raise NotImplementedError

    def bsquare(self, a):
        return self.bmul(a, a)

    def binv(self, a):
        raise NotImplementedError

    def bwhere(self, cond, a, b):
        xp = self._xp(a)
        return tuple(xp.where(cond, x, y) for x, y in zip(a, b))

    def beq(self, a, b):
        import functools

        xp = self._xp(a)
        return functools.reduce(
            lambda acc, lxy: acc & (lxy[0] == lxy[1]),
            zip(a, b),
            xp.full(xp.broadcast_shapes(a[0].shape, b[0].shape), True),
        )

    def b_zeros(self, shape, xp=np):
        raise NotImplementedError

    def b_ones(self, shape, xp=np):
        raise NotImplementedError

    def b_from_int(self, v: int, shape=()):
        raise NotImplementedError

    def b_from_ints(self, vals):
        raise NotImplementedError

    def b_to_ints(self, comp):
        raise NotImplementedError

    def b_batch_inv(self, comp):
        return self.binv(comp)

    # NTT entry points (component tuples along last axis)
    def interpolate_poly(self, comps):
        raise NotImplementedError

    def evaluate_poly_with_offset(self, comps, offset: int, blowup: int):
        raise NotImplementedError

    def interpolate_poly_with_offset(self, comps, offset: int):
        raise NotImplementedError

    def power_series(self, base: int, n: int, xp=np):
        """[1, b, b^2, ...] as one base component."""
        raise NotImplementedError

    def eval_base_poly_at(self, c0, x: int):
        """Vectorized scalar poly eval; None = no fast path (f64's python
        Horner is already fast — 64-bit int mulmods)."""
        return None

    def eval_int_poly_at(self, poly, x: int):
        return None

    def get_root_of_unity(self, log_n: int) -> int:
        return self.spec.get_root_of_unity(log_n)


class GL64Backend(FieldBackend):
    """Goldilocks: thin delegation to the specialized (lo, hi) ops — the
    exact code paths the f64 pipeline has always used."""

    def __init__(self):
        super().__init__(GL64_SPEC)

    # base ops
    def badd(self, a, b):
        from . import gl64 as gl

        return gl.add(a, b)

    def bsub(self, a, b):
        from . import gl64 as gl

        return gl.sub(a, b)

    def bneg(self, a):
        from . import gl64 as gl

        return gl.neg(a)

    def bmul(self, a, b):
        from . import gl64 as gl

        return gl.mul(a, b)

    def bsquare(self, a):
        from . import gl64 as gl

        return gl.square(a)

    def binv(self, a):
        from . import gl64 as gl

        return gl.inv(a)

    def bwhere(self, cond, a, b):
        from . import gl64 as gl

        return gl.where(cond, a, b)

    def beq(self, a, b):
        from . import gl64 as gl

        return gl.eq(a, b)

    def b_zeros(self, shape, xp=np):
        from . import gl64 as gl

        return gl.zeros(shape, xp)

    def b_ones(self, shape, xp=np):
        from . import gl64 as gl

        return gl.ones(shape, xp)

    def b_from_int(self, v: int, shape=()):
        from . import gl64 as gl

        return gl.from_int(v, shape)

    def b_from_ints(self, vals):
        from . import gl64 as gl

        return gl.from_u64(np.array(vals, dtype=np.uint64))

    def b_to_ints(self, comp):
        from . import gl64 as gl

        return [int(v) for v in gl.to_u64(comp).reshape(-1)]

    def b_batch_inv(self, comp):
        from . import gl64 as gl

        return gl.batch_inv(comp)

    def syn_div_binomial(self, p, z):
        """Host base-field path: one sequential-Horner native pass per row
        (gl64_mod.c gl_syndiv) instead of power-series + suffix-scan."""
        from . import gl64 as gl

        if (
            len(p) == 1
            and len(z) == 1
            and isinstance(p[0][0], np.ndarray)
            and p[0][0].size >= 1 << 12
        ):
            lib = gl._native_mod()
            if lib is not None:
                import ctypes

                lo = np.ascontiguousarray(p[0][0])
                hi = np.ascontiguousarray(p[0][1])
                n = lo.shape[-1]
                rows = lo.size // n
                zv = int(np.asarray(z[0][0]).reshape(-1)[0]) | (
                    int(np.asarray(z[0][1]).reshape(-1)[0]) << 32
                )
                rlo = np.empty_like(lo)
                rhi = np.empty_like(hi)
                pv = ctypes.c_void_p
                lib.gl_syndiv(
                    lo.ctypes.data_as(pv), hi.ctypes.data_as(pv),
                    ctypes.c_uint64(zv),
                    rlo.ctypes.data_as(pv), rhi.ctypes.data_as(pv),
                    rows, n,
                )
                return ((rlo, rhi),)
        return super().syn_div_binomial(p, z)

    # extension: specialized kernels
    def ext_mul(self, a, b):
        from . import gl64_ext as ext

        return ext.mul2(a, b) if len(a) == 2 else ext.mul3(a, b)

    def vsquare(self, a):
        from . import gl64_ext as ext

        if len(a) == 1:
            return (self.bsquare(a[0]),)
        return ext.square2(a) if len(a) == 2 else ext.square3(a)

    def ext_inv(self, a):
        from . import gl64_ext as ext

        return ext.inv2(a) if len(a) == 2 else ext.inv3(a)

    # NTT
    def interpolate_poly(self, comps):
        from . import ntt

        return ntt.interpolate_poly(comps)

    def evaluate_poly_with_offset(self, comps, offset: int, blowup: int):
        from . import ntt

        return ntt.evaluate_poly_with_offset(comps, offset, blowup)

    def interpolate_poly_with_offset(self, comps, offset: int):
        from . import ntt

        return ntt.interpolate_poly_with_offset(comps, offset)

    def power_series(self, base: int, n: int, xp=np):
        from . import ntt

        return ntt.power_series(base, n, xp)


class LimbBackend(FieldBackend):
    """Generic N-limb field (f62, f128) via ops/limb_field.LimbField."""

    def __init__(self, limb_field, spec):
        super().__init__(spec)
        self.F = limb_field

    def badd(self, a, b):
        return self.F.add(a, b)

    def bsub(self, a, b):
        return self.F.sub(a, b)

    def bneg(self, a):
        return self.F.neg(a)

    def bmul(self, a, b):
        return self.F.mul(a, b)

    def bsquare(self, a):
        return self.F.square(a)

    def binv(self, a):
        return self.F.exp_int(a, self.P - 2)

    def b_batch_inv(self, comp):
        """Montgomery batch inversion on the host: n limb multiplies would
        each pay numpy small-array overhead and the Fermat ladder is ~190
        sequential multiplies, so for numpy inputs we round-trip through
        python ints (one pow() for the whole batch).  Traced (jit) inputs
        keep the Fermat ladder."""
        if not isinstance(comp[0], np.ndarray):
            return self.binv(comp)
        shape = comp[0].shape
        vals = self.F.to_ints(comp)
        n = len(vals)
        prefix = [1] * (n + 1)
        for i, v in enumerate(vals):
            prefix[i + 1] = (prefix[i] * v) % self.P if v else prefix[i]
        inv = pow(prefix[n], self.P - 2, self.P)
        out = [0] * n
        for i in range(n - 1, -1, -1):
            if vals[i]:
                out[i] = (prefix[i] * inv) % self.P
                inv = (inv * vals[i]) % self.P
            # zero stays zero (matches 0^(P-2) from the Fermat path)
        res = self.F.from_ints(out)
        return tuple(l.reshape(shape) for l in res)

    def b_zeros(self, shape, xp=np):
        return self.F.zeros(shape, xp)

    def b_ones(self, shape, xp=np):
        return self.F.ones(shape, xp)

    def b_from_int(self, v: int, shape=()):
        return self.F.from_int(v, shape)

    def b_from_ints(self, vals):
        return self.F.from_ints(vals)

    def b_to_ints(self, comp):
        return self.F.to_ints(comp)

    def interpolate_poly(self, comps):
        return tuple_of_comps_map(self.F.interpolate_poly, comps)

    def evaluate_poly_with_offset(self, comps, offset: int, blowup: int):
        return tuple(
            self.F.evaluate_poly_with_offset(c, offset, blowup) for c in comps
        )

    def interpolate_poly_with_offset(self, comps, offset: int):
        return tuple(
            self.F.interpolate_poly_with_offset(c, offset) for c in comps
        )

    def power_series(self, base: int, n: int, xp=np):
        if n <= 4096:
            vals = []
            acc = 1
            for _ in range(n):
                vals.append(acc)
                acc = acc * base % self.P
            c = self.F.from_ints(vals)
            return self.cmap(xp.asarray, c)
        # vectorized log-doubling — a python-int loop at 2^20 costs seconds
        b = self.F.from_int(base % self.P, (1,))
        c = self.F._pow_series(tuple(np.asarray(l) for l in b), n, np)
        return self.cmap(xp.asarray, c)

    def eval_base_poly_at(self, c0, x: int):
        """Evaluate a base-field polynomial held as limb planes (shape (n,))
        at a python-int point, exactly.  Two-level power decomposition
        p(x) = sum_i x^i sum_j p[j*c+i] (x^c)^j turns the n sequential
        python mulmods of Horner into ONE vectorized limb multiply + a
        log-tree sum + ~2*sqrt(n) scalar mulmods — the verifier's sequence-
        assertion and periodic polys are n=256..4096 where this is ~10x.
        Returns None (caller falls back to Horner) for tiny or odd sizes
        (below ~512 python-int Horner is already sub-0.2 ms and wins on a
        contended box where small native calls pay queueing delay)."""
        n = int(c0[0].size)
        if n < 512 or n & (n - 1):
            return None
        F = self.F
        x %= self.P
        cw = 1 << ((n - 1).bit_length() + 1) // 2  # chunk width ~ sqrt(n)
        r = n // cw
        y = pow(x, cw, self.P)
        pw = [1] * r
        for i in range(1, r):
            pw[i] = pw[i - 1] * y % self.P
        pwl = F.from_ints(pw)
        pw_full = [
            np.ascontiguousarray(np.broadcast_to(pl.reshape(r, 1), (r, cw)))
            for pl in pwl
        ]
        cr = [np.ascontiguousarray(np.asarray(pl).reshape(r, cw)) for pl in c0]
        prod = F.mul(cr, pw_full)
        inner = self.vsum((tuple(prod),), axis=0)[0]
        vals = F.to_ints(inner)
        acc = 0
        for c in reversed(vals):
            acc = (acc * x + c) % self.P
        return acc

    def eval_int_poly_at(self, poly, x: int, _cache={}):
        """eval_base_poly_at for a python-int coefficient list, with the
        limb conversion cached per poly object (periodic polys are
        class-level cached by the AIRs, so identity is stable across
        verifies).  Returns None when the fast path does not apply."""
        n = len(poly)
        if n < 512 or n & (n - 1) or not isinstance(poly[0], int):
            return None
        key = (self.spec.name, id(poly))
        hit = _cache.get(key)
        if hit is None or hit[0] is not poly:
            if len(_cache) > 256:
                _cache.clear()
            hit = (poly, self.F.from_ints(poly))
            _cache[key] = hit
        return self.eval_base_poly_at(hit[1], x)


def tuple_of_comps_map(f, comps):
    return tuple(f(c) for c in comps)


_BACKENDS = {}


def get_backend(name: str) -> FieldBackend:
    if name not in _BACKENDS:
        if name == "f64":
            _BACKENDS[name] = GL64Backend()
        elif name == "f62":
            from .limb_field import F62

            _BACKENDS[name] = LimbBackend(F62, F62_SPEC)
        elif name == "f128":
            from .limb_field import F128

            _BACKENDS[name] = LimbBackend(F128, F128_SPEC)
        else:
            raise ValueError(f"unknown field backend {name!r}")
    return _BACKENDS[name]
