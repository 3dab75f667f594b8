"""Number-theoretic transform over Goldilocks on u32-limb arrays.

Replaces the reference's FFT stack (math/src/fft/{mod,serial,fft_inputs}.rs)
with a TPU-native formulation: an iterative radix-2 DIT transform expressed as
log2(n) full-array vectorized stages (reshape/slice/concat + limb arithmetic),
jittable end-to-end.  Only the *semantics* of the reference API are kept —
natural-order evaluations in, natural-order coefficients out — the reference's
in-place bit-reversed storage and chunked coset loop (serial.rs:26-57) are
replaced by an upfront static-gather bit-reversal and a zero-padded full-size
coset transform.

Supports extension-field data via per-component base-field twiddle multiplies
(mirroring FieldElement::mul_base semantics in fft_inputs.rs:107-123).
"""

from __future__ import annotations

import functools

import numpy as np

from . import gl64 as gl

# cache: (n, inverse) -> list of per-stage twiddle (lo, hi) numpy pairs
_TW_CACHE: dict = {}
_REV_CACHE: dict = {}


def _bit_rev_perm(n: int) -> np.ndarray:
    if n in _REV_CACHE:
        return _REV_CACHE[n]
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int32)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    _REV_CACHE[n] = rev
    return rev


def power_series(base: int, n: int, xp=np):
    """[1, base, base^2, ..., base^(n-1)] as a (lo, hi) pair via log-doubling."""
    out = gl.from_int(1, (1,))
    out = (xp.asarray(out[0]), xp.asarray(out[1]))
    length = 1
    b = base % gl.P
    while length < n:
        step = pow(b, length, gl.P)
        sc = gl.from_int(step, (1,))
        sc = (xp.asarray(sc[0]), xp.asarray(sc[1]))
        nxt = gl.mul(out, sc)
        out = (xp.concatenate([out[0], nxt[0]]), xp.concatenate([out[1], nxt[1]]))
        length *= 2
    return (out[0][:n], out[1][:n])


def _stage_twiddles(n: int, inverse: bool):
    """Per-stage twiddle tables w_m^j (j < m/2) for m = 2, 4, ..., n."""
    key = (n, inverse)
    if key in _TW_CACHE:
        return _TW_CACHE[key]
    bits = n.bit_length() - 1
    root = gl.get_root_of_unity(bits)
    if inverse:
        root = pow(root, gl.P - 2, gl.P)
    tables = []
    for s in range(1, bits + 1):
        m = 1 << s
        w_m = pow(root, n // m, gl.P)
        half = m // 2
        tw = np.empty(half, dtype=np.uint64)
        acc = 1
        if half <= 1024:
            for j in range(half):
                tw[j] = acc
                acc = (acc * w_m) % gl.P
            tables.append(gl.from_u64(tw))
        else:
            tables.append(tuple(np.asarray(x) for x in power_series(w_m, half)))
    _TW_CACHE[key] = tables
    return tables


def ntt_consts(n: int, inverse: bool = False, device: bool = False):
    """Precomputed constants for a size-n transform: (rev_perm, stage twiddle
    tables).  With device=True the arrays are device_put once so jitted
    callers can take them as ARGUMENTS instead of baking multi-MB literals
    into the XLA graph (which makes large-size compilation pathological)."""
    rev = _bit_rev_perm(n)
    tables = _stage_twiddles(n, inverse)
    if device:
        import jax

        key = ("dev_consts", n, inverse)
        if key not in _TW_CACHE:
            _TW_CACHE[key] = (
                jax.device_put(rev),
                [tuple(jax.device_put(x) for x in t) for t in tables],
            )
        return _TW_CACHE[key]
    return rev, tables


def ntt_components(comps, inverse: bool = False, scale: bool = True, consts=None):
    """Core transform.  ``comps`` is a tuple of (lo, hi) pairs (one per
    extension component), each with shape (..., n).  Returns same structure.

    Forward: result[..., i] = sum_j comps[..., j] * w^(i*j)  (natural order).
    Inverse (with scale=True): coefficient form, scaled by 1/n.
    ``consts``: optional (rev, tables) from ntt_consts — pass through jit
    arguments for large n.
    """
    xp = gl._xp(comps[0][0])
    n = comps[0][0].shape[-1]
    if n == 1:
        return comps
    assert n & (n - 1) == 0, "size must be a power of two"
    bits = n.bit_length() - 1

    rev, tables = consts if consts is not None else (_bit_rev_perm(n), _stage_twiddles(n, inverse))

    if xp is np:
        r = _ntt_stages_native(comps, n, bits, tables, rev)
        if r is not None:
            if inverse and scale:
                n_inv = pow(n, gl.P - 2, gl.P)
                r = tuple(_scale_const(c, n_inv, xp) for c in r)
            return r

    comps = tuple((xp.take(lo, rev, axis=-1), xp.take(hi, rev, axis=-1)) for lo, hi in comps)

    for s in range(1, bits + 1):
        m = 1 << s
        half = m // 2
        tw = tables[s - 1]
        tw = (xp.asarray(tw[0]), xp.asarray(tw[1]))
        new_comps = []
        for lo, hi in comps:
            shp = lo.shape[:-1] + (n // m, m)
            ylo = lo.reshape(shp)
            yhi = hi.reshape(shp)
            elo, olo = ylo[..., :half], ylo[..., half:]
            ehi, ohi = yhi[..., :half], yhi[..., half:]
            t = gl.mul((olo, ohi), tw)
            plo, phi = gl.add((elo, ehi), t)
            mlo, mhi = gl.sub((elo, ehi), t)
            new_comps.append(
                (
                    xp.concatenate([plo, mlo], axis=-1).reshape(lo.shape),
                    xp.concatenate([phi, mhi], axis=-1).reshape(hi.shape),
                )
            )
        comps = tuple(new_comps)

    if inverse and scale:
        n_inv = pow(n, gl.P - 2, gl.P)
        comps = tuple(_scale_const(c, n_inv, xp) for c in comps)
    return comps


def _scale_const(c, k: int, xp):
    kc = gl.from_int(k)
    kc = (xp.asarray(kc[0]), xp.asarray(kc[1]))
    return gl.mul(c, kc)


def _ntt_stages_native(comps, n: int, bits: int, tables, rev):
    """Bit-reversal gather + all butterfly stages through the fused
    single-pass C kernels (native/gl64_mod.c gl_gather + gl_ntt_stage) —
    one read + one write of the array per pass instead of ~6 numpy passes.
    None if unavailable/small."""
    lib = gl._native_mod()
    if lib is None or n * max(
        int(np.prod(c[0].shape[:-1])) for c in comps
    ) < gl.NATIVE_MIN_SIZE:
        return None
    import ctypes

    p = ctypes.c_void_p
    rev = np.ascontiguousarray(np.asarray(rev, dtype=np.int32))
    out = []
    for lo, hi in comps:
        shape = lo.shape
        src_lo = np.ascontiguousarray(lo).reshape(-1)
        src_hi = np.ascontiguousarray(hi).reshape(-1)
        total = src_lo.size
        cur_lo = np.empty_like(src_lo)
        cur_hi = np.empty_like(src_hi)
        lib.gl_gather(
            src_lo.ctypes.data_as(p), src_hi.ctypes.data_as(p),
            rev.ctypes.data_as(p),
            cur_lo.ctypes.data_as(p), cur_hi.ctypes.data_as(p),
            total // n, n,
        )
        nxt_lo = np.empty_like(cur_lo)
        nxt_hi = np.empty_like(cur_hi)
        for s in range(1, bits + 1):
            twl, twh = tables[s - 1]
            twl = np.ascontiguousarray(twl)
            twh = np.ascontiguousarray(twh)
            lib.gl_ntt_stage(
                cur_lo.ctypes.data_as(p), cur_hi.ctypes.data_as(p),
                twl.ctypes.data_as(p), twh.ctypes.data_as(p),
                nxt_lo.ctypes.data_as(p), nxt_hi.ctypes.data_as(p),
                total, 1 << s,
            )
            cur_lo, nxt_lo = nxt_lo, cur_lo
            cur_hi, nxt_hi = nxt_hi, cur_hi
        out.append((cur_lo.reshape(shape), cur_hi.reshape(shape)))
    return tuple(out)


def _ntt_axis0(comps, inverse: bool = False):
    """DIT transform along axis 0 of (n, lanes) arrays — the lane axis stays
    minor, so every butterfly is a full-width VPU op (TPU-friendly layout)."""
    xp = gl._xp(comps[0][0])
    n = comps[0][0].shape[0]
    if n == 1:
        return comps
    bits = n.bit_length() - 1
    rev = _bit_rev_perm(n)
    comps = tuple((lo[rev], hi[rev]) for lo, hi in comps)
    tables = _stage_twiddles(n, inverse)
    for s in range(1, bits + 1):
        m = 1 << s
        half = m // 2
        tw = tables[s - 1]
        twl = xp.asarray(tw[0])[:, None]
        twh = xp.asarray(tw[1])[:, None]
        new_comps = []
        for lo, hi in comps:
            shp = (n // m, m) + lo.shape[1:]
            ylo = lo.reshape(shp)
            yhi = hi.reshape(shp)
            elo, olo = ylo[:, :half], ylo[:, half:]
            ehi, ohi = yhi[:, :half], yhi[:, half:]
            t = gl.mul((olo, ohi), (twl, twh))
            plo, phi = gl.add((elo, ehi), t)
            mlo, mhi = gl.sub((elo, ehi), t)
            new_comps.append(
                (
                    xp.concatenate([plo, mlo], axis=1).reshape(lo.shape),
                    xp.concatenate([phi, mhi], axis=1).reshape(hi.shape),
                )
            )
        comps = tuple(new_comps)
    return comps


def ntt_four_step(comps, n1: int = None, inverse: bool = False, scale: bool = True):
    """Four-step NTT of a 1-D transform of size n = n1*n2 (both powers of 2):
    column NTTs on a (n1, n2) view, twiddle multiply, transpose, column NTTs
    — the single-chip version of the six-step decomposition the reference
    uses for concurrency (prover/src/matrix/segments.rs:232-271), and the
    template for the multi-chip all-to-all NTT.
    """
    xp = gl._xp(comps[0][0])
    n = comps[0][0].shape[-1]
    assert comps[0][0].ndim == 1, "four-step path handles single transforms"
    if n1 is None:
        n1 = 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1
    root = gl.get_root_of_unity(n.bit_length() - 1)
    if inverse:
        root = pow(root, gl.P - 2, gl.P)

    # inner twiddle matrix tw[k1, i2] = root^(i2*k1) = (root^i2)^k1
    key = ("fourstep_tw", n, n1, inverse)
    if key not in _TW_CACHE:
        base = tuple(np.asarray(x) for x in power_series(root, n2))
        cur = gl.from_u64(np.ones(n2, dtype=np.uint64))
        trows = []
        for _ in range(n1):
            trows.append(cur)
            cur = gl.mul(cur, base)
        _TW_CACHE[key] = (
            np.stack([r[0] for r in trows]),
            np.stack([r[1] for r in trows]),
        )
    twl, twh = _TW_CACHE[key]
    tw = (xp.asarray(twl), xp.asarray(twh))

    out = []
    view = tuple((c[0].reshape(n1, n2), c[1].reshape(n1, n2)) for c in comps)
    a = _ntt_axis0(view, inverse)
    b = tuple(gl.mul(c, tw) for c in a)
    bt = tuple((c[0].T, c[1].T) for c in b)  # (n2, n1)
    c = _ntt_axis0(bt, inverse)
    res = tuple((x[0].reshape(n), x[1].reshape(n)) for x in c)
    if inverse and scale:
        n_inv = pow(n, gl.P - 2, gl.P)
        res = tuple(_scale_const(x, n_inv, xp) for x in res)
    return res


# ---------------------------------------------------------------------------
# reference-API equivalents (semantics of math/src/fft/serial.rs)
# ---------------------------------------------------------------------------


def evaluate_poly(comps, consts=None):
    """Coefficients -> evaluations over the size-n subgroup (natural order)."""
    return ntt_components(comps, inverse=False, consts=consts)


def evaluate_poly_with_offset(comps, domain_offset: int, blowup_factor: int,
                              offs=None, consts=None):
    """Coefficients (n) -> evaluations over the coset s*<w_L> of size
    L = n * blowup (natural order: result[i] = P(s * w_L^i)).

    Equivalent to fft/serial.rs:26-57; implemented as scale-by-s^j + zero-pad
    + full-size transform.
    """
    xp = gl._xp(comps[0][0])
    n = comps[0][0].shape[-1]
    big_n = n * blowup_factor
    if offs is None:
        offs = power_series(domain_offset, n, xp)
    scaled = []
    for c in comps:
        sc = gl.mul(c, offs)
        pad_shape = c[0].shape[:-1] + (big_n - n,)
        scaled.append(
            (
                xp.concatenate([sc[0], xp.zeros(pad_shape, dtype=np.uint32)], axis=-1),
                xp.concatenate([sc[1], xp.zeros(pad_shape, dtype=np.uint32)], axis=-1),
            )
        )
    return ntt_components(tuple(scaled), inverse=False, consts=consts)


def interpolate_poly(comps, consts=None):
    """Evaluations over subgroup (natural order) -> coefficients."""
    return ntt_components(comps, inverse=True, scale=True, consts=consts)


def interpolate_poly_with_offset(comps, domain_offset: int, inv_offs=None, consts=None):
    """Evaluations over coset s*<w_n> -> coefficients (serial.rs:78-93)."""
    xp = gl._xp(comps[0][0])
    n = comps[0][0].shape[-1]
    coeffs = ntt_components(comps, inverse=True, scale=True, consts=consts)
    if inv_offs is None:
        inv_off = pow(domain_offset, gl.P - 2, gl.P)
        inv_offs = power_series(inv_off, n, xp)
    return tuple(gl.mul(c, inv_offs) for c in coeffs)
