"""User-facing field-element array wrapper.

``Felt`` wraps arrays of field elements stored as u32 limb tuples and
provides operator overloading so AIR transition constraints can be written
naturally (``nxt - (cur**3 + k)``) while remaining fully vectorized and
jittable: the same constraint code runs on the whole constraint-evaluation
domain on TPU, and on shape-(1,) arrays on the host (verifier's OOD
evaluation).

Every Felt carries a FieldBackend (default Goldilocks, whose ops are the
specialized gl64/gl64_ext kernels); f62/f128 Felts use the generic N-limb
backend.  Mirrors the role of the reference's FieldElement trait
(math/src/field/traits.rs:29) but array-valued and runtime-dispatched.
"""

from __future__ import annotations

import numpy as np

from .backend import get_backend


def _gl():
    return get_backend("f64")


class Felt:
    __slots__ = ("c", "deg", "B")

    def __init__(self, components, deg=None, B=None):
        """components: tuple of per-component u32 limb tuples ((lo, hi) for
        64-bit fields, 4 limbs for f128)."""
        self.c = tuple(components)
        self.deg = deg if deg is not None else len(self.c)
        self.B = B if B is not None else _gl()
        assert self.deg == len(self.c) in (1, 2, 3)

    # -- constructors -------------------------------------------------------

    @staticmethod
    def from_u64s(arr, deg: int = 1) -> "Felt":
        """From numpy uint64 array (Goldilocks only); for deg>1 last axis
        must have size deg."""
        from . import gl64 as gl

        arr = np.asarray(arr, dtype=np.uint64)
        if deg == 1:
            return Felt((gl.from_u64(arr),))
        assert arr.shape[-1] == deg
        return Felt(tuple(gl.from_u64(arr[..., i]) for i in range(deg)))

    @staticmethod
    def from_int(v, shape=(), deg: int = 1, B=None) -> "Felt":
        B = B if B is not None else _gl()
        if isinstance(v, tuple):
            comps = tuple(B.b_from_int(x, shape) for x in B.spec.embed(v, deg))
        else:
            comps = (B.b_from_int(v, shape),) + tuple(
                B.b_from_int(0, shape) for _ in range(deg - 1)
            )
        return Felt(comps, B=B)

    @staticmethod
    def zero(shape=(), deg: int = 1, xp=np, B=None) -> "Felt":
        B = B if B is not None else _gl()
        return Felt(B.vzeros(shape, deg, xp), B=B)

    @staticmethod
    def one(shape=(), deg: int = 1, xp=np, B=None) -> "Felt":
        B = B if B is not None else _gl()
        return Felt(B.vones(shape, deg, xp), B=B)

    def to_u64s(self) -> np.ndarray:
        """To numpy uint64 array (Goldilocks only); deg>1 appends a trailing
        component axis."""
        from . import gl64 as gl

        if self.deg == 1:
            return gl.to_u64(self.c[0])
        return np.stack([gl.to_u64(ci) for ci in self.c], axis=-1)

    def to_elems(self):
        """Host python ints/tuples (flattened), any field."""
        flat = self.B.emap(lambda l: np.asarray(l).reshape(-1), self.c)
        return self.B.limbs_to_elems(flat, self.deg)

    # -- shape/utils --------------------------------------------------------

    @property
    def shape(self):
        return self.c[0][0].shape

    def __getitem__(self, idx) -> "Felt":
        return Felt(self.B.emap(lambda l: l[idx], self.c), B=self.B)

    def reshape(self, *shape) -> "Felt":
        return Felt(self.B.emap(lambda l: l.reshape(*shape), self.c), B=self.B)

    def broadcast_to(self, shape) -> "Felt":
        return Felt(self.B.vbroadcast(self.c, shape), B=self.B)

    # -- promotion ----------------------------------------------------------

    def _promote(self, other, deg=None):
        """Coerce other to a Felt of compatible degree with self."""
        if isinstance(other, int):
            other = Felt.from_int(other, (), 1, self.B)
        if not isinstance(other, Felt):
            return NotImplemented
        a, b = self, other
        if a.deg == b.deg:
            return a, b
        if b.deg == 1:
            z = self.B.b_zeros((), self.B._xp(b.c[0]))
            return a, Felt(b.c + (z,) * (a.deg - 1), B=self.B)
        if a.deg == 1:
            z = self.B.b_zeros((), self.B._xp(a.c[0]))
            return Felt(a.c + (z,) * (b.deg - 1), B=self.B), b
        raise ValueError(f"incompatible extension degrees {a.deg} and {b.deg}")

    # -- arithmetic ---------------------------------------------------------

    def __add__(self, other):
        r = self._promote(other)
        if r is NotImplemented:
            return NotImplemented
        a, b = r
        return Felt(tuple(self.B.badd(x, y) for x, y in zip(a.c, b.c)), B=self.B)

    __radd__ = __add__

    def __sub__(self, other):
        r = self._promote(other)
        if r is NotImplemented:
            return NotImplemented
        a, b = r
        return Felt(tuple(self.B.bsub(x, y) for x, y in zip(a.c, b.c)), B=self.B)

    def __rsub__(self, other):
        r = self._promote(other)
        if r is NotImplemented:
            return NotImplemented
        a, b = r
        return Felt(tuple(self.B.bsub(y, x) for x, y in zip(a.c, b.c)), B=self.B)

    def __neg__(self):
        return Felt(tuple(self.B.bneg(x) for x in self.c), B=self.B)

    def __mul__(self, other):
        if isinstance(other, Felt) and other.deg == 1 and self.deg > 1:
            return Felt(
                tuple(self.B.bmul(x, other.c[0]) for x in self.c), B=self.B
            )
        if isinstance(other, Felt) and self.deg == 1 and other.deg > 1:
            return other * self
        r = self._promote(other)
        if r is NotImplemented:
            return NotImplemented
        a, b = r
        return Felt(self.B.vmul(a.c, b.c), B=self.B)

    __rmul__ = __mul__

    def __pow__(self, e: int):
        e = int(e)
        if e == 0:
            return Felt.one(self.shape, self.deg, self.B._xp(self.c[0]), self.B)
        if (
            0 < e < (1 << 64)
            and self.deg == 1
            and getattr(self.B.spec, "name", None) == "f64"
            and isinstance(self.c[0][0], np.ndarray)
            and self.c[0][0].size >= 1 << 12
        ):
            # host f64: one fused native pass (gl64_mod.c gl_expmod)
            # instead of a square-and-multiply chain of full-array passes
            from . import gl64 as gl

            lib = gl._native_mod()
            if lib is not None:
                import ctypes

                lo = np.ascontiguousarray(self.c[0][0])
                hi = np.ascontiguousarray(self.c[0][1])
                rlo = np.empty_like(lo)
                rhi = np.empty_like(hi)
                p = ctypes.c_void_p
                lib.gl_expmod(
                    lo.ctypes.data_as(p), hi.ctypes.data_as(p),
                    ctypes.c_uint64(e),
                    rlo.ctypes.data_as(p), rhi.ctypes.data_as(p), lo.size,
                )
                return Felt(((rlo, rhi),), B=self.B)
        result = None
        base = self
        while e:
            if e & 1:
                result = base if result is None else result * base
            e >>= 1
            if e:
                base = base.square()
        return result

    def square(self):
        return Felt(self.B.vsquare(self.c), B=self.B)

    def inverse(self):
        return Felt(self.B.vinv(self.c), B=self.B)

    def __truediv__(self, other):
        r = self._promote(other)
        if r is NotImplemented:
            return NotImplemented
        a, b = r
        return a * b.inverse()

    def double(self):
        return self + self

    def __eq__(self, other):
        r = self._promote(other)
        if r is NotImplemented:
            return NotImplemented
        a, b = r
        import functools

        return functools.reduce(
            lambda acc, xy: acc & self.B.beq(xy[0], xy[1]), zip(a.c, b.c),
            self.B.beq(a.c[0], b.c[0]),
        )

    def __repr__(self):
        try:
            return f"Felt({self.B.name}, deg={self.deg}, {self.to_elems()!r})"
        except Exception:
            return f"Felt({self.B.name}, deg={self.deg}, shape={self.shape}, traced)"


def mds_apply(states, rows) -> list:
    """out_i = sum_j rows[i][j] * states[j] — dense matrix application over
    a list of Felts (the AIR-side MDS / INV_MDS pattern, e.g.
    examples/src/rescue/air.rs's enforce_round).  On the host f64 base-field
    path this is ONE fused native pass (gl64_mod.c gl_matvec) instead of
    w*w full-array constant multiplies; everywhere else (traced, extension
    degrees, limb fields) it is the identical per-term math, so results are
    bit-equal across paths."""
    w = len(states)
    s0 = states[0]
    B = getattr(s0, "B", None)  # None: verifier's ScalarFelt OOD path
    if B is None and hasattr(s0, "spec") and all(
        isinstance(getattr(s, "v", None), int) for s in states
    ):
        # ScalarFelt raw-int row dots, ONE reduction per row (the same
        # fast path as crypto/rescue128._felt_mds)
        spec = s0.spec
        P = spec.P
        cls = type(s0)
        vals = [s.v for s in states]
        return [
            cls(sum(int(rows[i][j]) * vals[j] for j in range(w)) % P, spec)
            for i in range(w)
        ]
    if (
        B is not None
        and getattr(s0, "deg", None) == 1
        and getattr(B, "spec", None) is not None
        and getattr(B.spec, "name", None) == "f64"
        and isinstance(s0.c[0][0], np.ndarray)
        and s0.c[0][0].size >= 1 << 12
        and w <= 16
    ):
        from . import gl64 as gl

        lib = gl._native_mod()
        if lib is not None and all(
            isinstance(f.c[0][0], np.ndarray) and f.c[0][0].shape == s0.c[0][0].shape
            for f in states
        ):
            import ctypes

            shape = s0.c[0][0].shape
            n = s0.c[0][0].size
            planes = []
            for f in states:
                planes.append(np.ascontiguousarray(f.c[0][0]))
                planes.append(np.ascontiguousarray(f.c[0][1]))
            m = np.array(
                [int(rows[i][j]) % gl.P for i in range(w) for j in range(w)],
                dtype=np.uint64,
            )
            outs = [np.empty(shape, dtype=np.uint32) for _ in range(2 * w)]
            PTR = ctypes.c_void_p * (2 * w)
            sp = PTR(*[p.ctypes.data for p in planes])
            op = PTR(*[p.ctypes.data for p in outs])
            lib.gl_matvec(w, sp, m.ctypes.data_as(ctypes.c_void_p), op, n)
            return [
                Felt(((outs[2 * i], outs[2 * i + 1]),), B=B) for i in range(w)
            ]
    if (
        B is not None
        and getattr(s0, "deg", None) == 1
        and hasattr(B, "F")
        and all(getattr(f, "deg", None) == 1 for f in states)
    ):
        # limb fields (f62/f128): deferred-reduction matvec — traceable,
        # one reduction per output row instead of w*w (device CE path too)
        outs = B.F.matvec([f.c[0] for f in states], rows)
        return [Felt((o,), B=B) for o in outs]
    out = []
    for i in range(w):
        acc = None
        for j in range(w):
            term = states[j] * rows[i][j]
            acc = term if acc is None else acc + term
        out.append(acc)
    return out


def stack(felts, axis=0) -> Felt:
    B = felts[0].B
    xp = B._xp(felts[0].c[0])
    deg = felts[0].deg
    nl = len(felts[0].c[0])
    comps = []
    for i in range(deg):
        comps.append(
            tuple(xp.stack([f.c[i][k] for f in felts], axis=axis) for k in range(nl))
        )
    return Felt(tuple(comps), B=B)


def concatenate(felts, axis=0) -> Felt:
    B = felts[0].B
    xp = B._xp(felts[0].c[0])
    deg = felts[0].deg
    nl = len(felts[0].c[0])
    comps = []
    for i in range(deg):
        comps.append(
            tuple(
                xp.concatenate([f.c[i][k] for f in felts], axis=axis)
                for k in range(nl)
            )
        )
    return Felt(tuple(comps), B=B)
