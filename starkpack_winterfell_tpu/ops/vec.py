"""Vectorized element operations on component-tuples.

An element array is a tuple of ``deg`` (lo, hi) u32-limb pairs (deg = 1, 2 or
3).  These helpers dispatch base/extension arithmetic and implement the
reductions (sums, Horner evaluation, power series) used by the protocol's
bulk phases.  Works identically under numpy and jax.numpy.
"""

from __future__ import annotations

import numpy as np

from . import gl64 as gl
from . import gl64_ext as ext


def deg(a) -> int:
    return len(a)


def promote(a, target_deg: int):
    if len(a) == target_deg:
        return a
    assert len(a) == 1, "can only promote base elements"
    xp = gl._xp(a[0][0])
    z = (xp.zeros_like(a[0][0]), xp.zeros_like(a[0][1]))
    return a + (z,) * (target_deg - 1)


def vadd(a, b):
    d = max(len(a), len(b))
    a, b = promote(a, d), promote(b, d)
    return tuple(gl.add(x, y) for x, y in zip(a, b))


def vsub(a, b):
    d = max(len(a), len(b))
    a, b = promote(a, d), promote(b, d)
    return tuple(gl.sub(x, y) for x, y in zip(a, b))


def vneg(a):
    return tuple(gl.neg(x) for x in a)


def vmul(a, b):
    """Full product with base-mul shortcut when either side is base."""
    if len(a) == 1 and len(b) == 1:
        return (gl.mul(a[0], b[0]),)
    if len(b) == 1:
        return tuple(gl.mul(x, b[0]) for x in a)
    if len(a) == 1:
        return tuple(gl.mul(a[0], y) for y in b)
    if len(a) == 2:
        return ext.mul2(a, b)
    return ext.mul3(a, b)


def vsquare(a):
    if len(a) == 1:
        return (gl.square(a[0]),)
    return ext.square2(a) if len(a) == 2 else ext.square3(a)


def vinv(a):
    if len(a) == 1:
        return (gl.inv(a[0]),)
    return ext.inv2(a) if len(a) == 2 else ext.inv3(a)


def vzeros(shape, d: int = 1, xp=np):
    return tuple(gl.zeros(shape, xp) for _ in range(d))


def vones(shape, d: int = 1, xp=np):
    return (gl.ones(shape, xp),) + tuple(gl.zeros(shape, xp) for _ in range(d - 1))


def vwhere(cond, a, b):
    d = max(len(a), len(b))
    a, b = promote(a, d), promote(b, d)
    return tuple(gl.where(cond, x, y) for x, y in zip(a, b))


def vbroadcast(a, shape):
    xp = gl._xp(a[0][0])
    return tuple(
        (xp.broadcast_to(lo, shape), xp.broadcast_to(hi, shape)) for lo, hi in a
    )


def vsum(a, axis=-1):
    """Modular sum along an axis via log-halving tree reduction (the limb add
    carries preclude a plain xp.sum)."""
    xp = gl._xp(a[0][0])
    comps = a
    n = comps[0][0].shape[axis]
    axis = axis % comps[0][0].ndim
    while n > 1:
        half = n // 2
        lo_idx = [slice(None)] * comps[0][0].ndim
        hi_idx = [slice(None)] * comps[0][0].ndim
        rem_idx = [slice(None)] * comps[0][0].ndim
        lo_idx[axis] = slice(0, half)
        hi_idx[axis] = slice(half, 2 * half)
        rem_idx[axis] = slice(2 * half, n)
        new_comps = []
        for c in comps:
            s = gl.add(
                (c[0][tuple(lo_idx)], c[1][tuple(lo_idx)]),
                (c[0][tuple(hi_idx)], c[1][tuple(hi_idx)]),
            )
            if n % 2:
                s = (
                    gl._xp(s[0]).concatenate([s[0], c[0][tuple(rem_idx)]], axis=axis),
                    gl._xp(s[1]).concatenate([s[1], c[1][tuple(rem_idx)]], axis=axis),
                )
            new_comps.append(s)
        comps = tuple(new_comps)
        n = comps[0][0].shape[axis]
    # squeeze the reduced axis
    idx = [slice(None)] * comps[0][0].ndim
    idx[axis] = 0
    return tuple((c[0][tuple(idx)], c[1][tuple(idx)]) for c in comps)


def horner(coeffs, x, axis=-1):
    """Evaluate polynomials along `axis` at point-array x (same shape as the
    remaining axes).  coeffs: tuple of pairs shaped (..., N) along axis."""
    n = coeffs[0][0].shape[axis]
    axis = axis % coeffs[0][0].ndim

    def take(j):
        idx = [slice(None)] * coeffs[0][0].ndim
        idx[axis] = j
        return tuple((c[0][tuple(idx)], c[1][tuple(idx)]) for c in coeffs)

    acc = take(n - 1)
    for j in range(n - 2, -1, -1):
        acc = vadd(vmul(acc, x), take(j))
    return acc


def suffix_sums(a, axis=-1):
    """Inclusive suffix sums along `axis` via Hillis-Steele doubling —
    log2(n) full-width modular adds (works under numpy and jax)."""
    xp = gl._xp(a[0][0])
    n = a[0][0].shape[axis]
    axis = axis % a[0][0].ndim
    comps = a
    shift = 1
    while shift < n:
        new_comps = []
        for c in comps:
            # c + shift_left(c) where shifted-out positions add zero
            pad_idx = [slice(None)] * c[0].ndim
            pad_idx[axis] = slice(shift, n)
            z_idx = [slice(None)] * c[0].ndim
            z_idx[axis] = slice(0, shift)
            shifted_lo = xp.concatenate(
                [c[0][tuple(pad_idx)], xp.zeros_like(c[0][tuple(z_idx)])], axis=axis
            )
            shifted_hi = xp.concatenate(
                [c[1][tuple(pad_idx)], xp.zeros_like(c[1][tuple(z_idx)])], axis=axis
            )
            new_comps.append((shifted_lo, shifted_hi))
        # add componentwise as full elements (base adds per component)
        comps = tuple(
            gl.add(c, s) for c, s in zip(comps, new_comps)
        )
        shift *= 2
    return comps


def syn_div_binomial(p, z, n: int = None):
    """Divide polynomial p (coeff component-tuple, shape (..., n)) by (x - z)
    where z is a nonzero element (shape-(1,) component tuple) and p(z) == 0.

    Uses q_i = z^{-(i+1)} * sum_{j>i} p_j z^j — exact in field arithmetic and
    fully parallel (one power series + suffix scan + two multiplies), in
    place of the reference's sequential synthetic division
    (polynom/mod.rs:524).  Returns coefficients of the quotient, padded with
    a zero in the top slot (same length as p).
    """
    xp = gl._xp(p[0][0])
    nn = p[0][0].shape[-1]
    d = max(len(p), len(z))
    zp = vec_pow_series = power_series_elem(z, nn)  # z^j, shape (n,)
    s = vmul(promote(p, d), zp)  # p_j z^j
    suf = suffix_sums(s, axis=-1)  # S_i = sum_{j>=i} p_j z^j
    # exclusive suffix: S_{i+1} = shift left by one, zero-fill at top
    excl = tuple(
        (
            xp.concatenate([c[0][..., 1:], xp.zeros_like(c[0][..., :1])], axis=-1),
            xp.concatenate([c[1][..., 1:], xp.zeros_like(c[1][..., :1])], axis=-1),
        )
        for c in suf
    )
    z_inv = vinv(z)
    zi = power_series_elem(z_inv, nn)  # z^{-i}
    zi = vmul(zi, vbroadcast(z_inv, (nn,)))  # z^{-(i+1)}
    return vmul(excl, zi)


def power_series_elem(x, n: int):
    """[1, x, x^2, ..., x^(n-1)] for an element-array x of shape (1,) ->
    tuple of pairs shaped (n,).  Log-doubling, works for any degree."""
    xp = gl._xp(x[0][0])
    d = len(x)
    out = vones((1,), d, xp)
    length = 1
    cur_pow = x  # x^(length)
    while length < n:
        nxt = vmul(out, vbroadcast(cur_pow, out[0][0].shape))
        out = tuple(
            (xp.concatenate([a[0], b[0]]), xp.concatenate([a[1], b[1]]))
            for a, b in zip(out, nxt)
        )
        length *= 2
        if length < n:
            cur_pow = vsquare(cur_pow)
    return tuple((c[0][:n], c[1][:n]) for c in out)
