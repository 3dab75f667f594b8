"""User-facing field-element array wrapper.

``Felt`` wraps arrays of Goldilocks (or extension) elements stored as u32
limb pairs and provides operator overloading so AIR transition constraints
can be written naturally (``nxt - (cur**3 + k)``) while remaining fully
vectorized and jittable: the same constraint code runs on the whole
constraint-evaluation domain on TPU, and on scalars on the host (verifier's
OOD evaluation).

Mirrors the role of the reference's FieldElement trait
(math/src/field/traits.rs:29) but array-valued.
"""

from __future__ import annotations

import numpy as np

from . import gl64 as gl
from . import gl64_ext as ext


class Felt:
    __slots__ = ("c", "deg")

    def __init__(self, components, deg=None):
        """components: tuple of per-component (lo, hi) u32-array pairs."""
        self.c = tuple(components)
        self.deg = deg if deg is not None else len(self.c)
        assert self.deg == len(self.c) in (1, 2, 3)

    # -- constructors -------------------------------------------------------

    @staticmethod
    def from_u64s(arr, deg: int = 1) -> "Felt":
        """From numpy uint64 array; for deg>1 last axis must have size deg."""
        arr = np.asarray(arr, dtype=np.uint64)
        if deg == 1:
            return Felt((gl.from_u64(arr),))
        assert arr.shape[-1] == deg
        return Felt(tuple(gl.from_u64(arr[..., i]) for i in range(deg)))

    @staticmethod
    def from_int(v, shape=(), deg: int = 1) -> "Felt":
        if deg == 1:
            return Felt((gl.from_int(v, shape),))
        comps = [gl.from_int(v, shape)] + [gl.from_int(0, shape) for _ in range(deg - 1)]
        return Felt(tuple(comps))

    @staticmethod
    def zero(shape=(), deg: int = 1, xp=np) -> "Felt":
        return Felt(tuple(gl.zeros(shape, xp) for _ in range(deg)))

    @staticmethod
    def one(shape=(), deg: int = 1, xp=np) -> "Felt":
        return Felt((gl.ones(shape, xp),) + tuple(gl.zeros(shape, xp) for _ in range(deg - 1)))

    def to_u64s(self) -> np.ndarray:
        """To numpy uint64 array; deg>1 appends a trailing component axis."""
        if self.deg == 1:
            return gl.to_u64(self.c[0])
        return np.stack([gl.to_u64(ci) for ci in self.c], axis=-1)

    # -- shape/utils --------------------------------------------------------

    @property
    def shape(self):
        return self.c[0][0].shape

    def __getitem__(self, idx) -> "Felt":
        return Felt(tuple((lo[idx], hi[idx]) for (lo, hi) in self.c))

    def reshape(self, *shape) -> "Felt":
        return Felt(tuple((lo.reshape(*shape), hi.reshape(*shape)) for (lo, hi) in self.c))

    def broadcast_to(self, shape) -> "Felt":
        xp = gl._xp(self.c[0][0])
        return Felt(
            tuple((xp.broadcast_to(lo, shape), xp.broadcast_to(hi, shape)) for (lo, hi) in self.c)
        )

    # -- promotion ----------------------------------------------------------

    def _promote(self, other, deg=None):
        """Coerce other to a Felt of compatible degree with self."""
        if isinstance(other, int):
            other = Felt.from_int(other, (), 1)
        if not isinstance(other, Felt):
            return NotImplemented
        a, b = self, other
        if a.deg == b.deg:
            return a, b
        if b.deg == 1:
            z = gl.zeros((), gl._xp(b.c[0][0]))
            return a, Felt(b.c + (z,) * (a.deg - 1))
        if a.deg == 1:
            z = gl.zeros((), gl._xp(a.c[0][0]))
            return Felt(a.c + (z,) * (b.deg - 1)), b
        raise ValueError(f"incompatible extension degrees {a.deg} and {b.deg}")

    # -- arithmetic ---------------------------------------------------------

    def __add__(self, other):
        r = self._promote(other)
        if r is NotImplemented:
            return NotImplemented
        a, b = r
        return Felt(tuple(gl.add(x, y) for x, y in zip(a.c, b.c)))

    __radd__ = __add__

    def __sub__(self, other):
        r = self._promote(other)
        if r is NotImplemented:
            return NotImplemented
        a, b = r
        return Felt(tuple(gl.sub(x, y) for x, y in zip(a.c, b.c)))

    def __rsub__(self, other):
        r = self._promote(other)
        if r is NotImplemented:
            return NotImplemented
        a, b = r
        return Felt(tuple(gl.sub(y, x) for x, y in zip(a.c, b.c)))

    def __neg__(self):
        return Felt(tuple(gl.neg(x) for x in self.c))

    def __mul__(self, other):
        if isinstance(other, Felt) and other.deg == 1 and self.deg > 1:
            return Felt(
                ext.mul_base2(self.c, other.c[0])
                if self.deg == 2
                else ext.mul_base3(self.c, other.c[0])
            )
        if isinstance(other, Felt) and self.deg == 1 and other.deg > 1:
            return other * self
        r = self._promote(other)
        if r is NotImplemented:
            return NotImplemented
        a, b = r
        if a.deg == 1:
            return Felt((gl.mul(a.c[0], b.c[0]),))
        if a.deg == 2:
            return Felt(ext.mul2(a.c, b.c))
        return Felt(ext.mul3(a.c, b.c))

    __rmul__ = __mul__

    def __pow__(self, e: int):
        e = int(e)
        if e == 0:
            return Felt.one(self.shape, self.deg, gl._xp(self.c[0][0]))
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
        if self.deg == 1:
            return Felt((gl.square(self.c[0]),))
        if self.deg == 2:
            return Felt(ext.square2(self.c))
        return Felt(ext.square3(self.c))

    def inverse(self):
        if self.deg == 1:
            return Felt((gl.inv(self.c[0]),))
        if self.deg == 2:
            return Felt(ext.inv2(self.c))
        return Felt(ext.inv3(self.c))

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

        res = functools.reduce(
            lambda acc, xy: acc & gl.eq(xy[0], xy[1]), zip(a.c, b.c), gl.eq(a.c[0], b.c[0])
        )
        return res

    def __repr__(self):
        try:
            return f"Felt(deg={self.deg}, {self.to_u64s()!r})"
        except Exception:
            return f"Felt(deg={self.deg}, shape={self.shape}, traced)"


def stack(felts, axis=0) -> Felt:
    xp = gl._xp(felts[0].c[0][0])
    deg = felts[0].deg
    comps = []
    for i in range(deg):
        lo = xp.stack([f.c[i][0] for f in felts], axis=axis)
        hi = xp.stack([f.c[i][1] for f in felts], axis=axis)
        comps.append((lo, hi))
    return Felt(tuple(comps))


def concatenate(felts, axis=0) -> Felt:
    xp = gl._xp(felts[0].c[0][0])
    deg = felts[0].deg
    comps = []
    for i in range(deg):
        lo = xp.concatenate([f.c[i][0] for f in felts], axis=axis)
        hi = xp.concatenate([f.c[i][1] for f in felts], axis=axis)
        comps.append((lo, hi))
    return Felt(tuple(comps))
