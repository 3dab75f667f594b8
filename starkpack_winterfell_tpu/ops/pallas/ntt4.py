"""Gather-free four-step NTT pipelines (Pallas TPU kernels).

The four-step NTT in ``ntt_kernel.four_step_ntt`` bit-reverses rows with
``jnp.take`` — on the TPU that gather costs ~minutes of XLA compile time at
2^20 (measured: 237 s for the take alone) and a full HBM pass at runtime.
This module removes every runtime permutation:

* the inverse transform uses **DIF** (decimation-in-frequency) kernels —
  natural-order input, bit-reversed output;
* the forward transform uses **DIT** kernels fed directly with the
  bit-reversed layout the DIF stage produced — natural-order output;
* all twiddle/scale tables are precomputed in the permuted layouts
  (host-side, static), so the only data movement between kernels is plain
  XLA transposes and a zero-interleave reshape for the blowup padding.

The decomposition follows the same index algebra as the reference's
six-step segment FFT (prover/src/matrix/segments.rs:232-271), re-cut so
each inner transform is one VMEM-resident Pallas kernel:

  interpolate+LDE of length-n columns to L = n*blowup, n = a*b, L = a*B:

    view (.., a, b)                 rows t1 (natural)
    K1  DIF_a   (+epilogue W_n^{-j1 t2} at [rev_a(j1), t2])
    T   transpose -> (.., b, a)
    K2  DIF_b   (+epilogue (1/n) * s^j at [rev_b(j2), rev_a(j1)])
    T   transpose -> (.., a, b), zero-interleave cols by blowup -> (.., a, B)
    T   transpose -> (.., B, a)
    K3  DIT_B   (+epilogue W_L^{r j1} at [r, rev_a(j1)])
    T   transpose -> (.., a, B)
    K4  DIT_a   -> natural X[q*B + r], reshape (.., L)

with j = j1 + a*j2 the coefficient index (j1 in [a], j2 in [b]).  The
**permuted coefficient layout** used throughout this module is the K2
output: a (b, a) matrix holding coefficient j at [rev_b(j2), rev_a(j1)].

Beyond the fused interpolate+LDE, the pieces are exposed separately so the
whole prover can run gather-free at 2^20 scale:

* ``intt_permuted``     — coset evals -> TRUE coefficients, permuted layout
* ``lde_from_permuted`` — permuted coefficients -> natural coset LDE
* ``slice_columns_permuted`` — the composition-poly column split
  (coefficients c[k*tl + t] -> column k), a pure strided slice in the
  permuted layout (prover/src/composer.rs's into_columns equivalent)
* ``permuted_power_series`` — z^j laid out like the coefficients, so
  out-of-domain evaluation is one dot product against the permuted arrays

Bit-exact with ops/ntt.py (differentially tested) — only the schedule is
TPU-native, the math is the reference's.
"""

from __future__ import annotations

import functools

import numpy as np

from .. import gl64 as gl
from .. import ntt as ntt_mod
from .ntt_kernel import LANES, VMEM_LIMIT_BYTES, _per_position_twiddles

MAX_TILE = 4096
INTERPRET = False  # set True for XLA:CPU interpreter-mode tests


def _make_body(n: int, dif: bool):
    """Stage loop over a (n, lanes) tile: DIT (bitrev in, natural out) or
    DIF (natural in, bitrev out).  Twiddle table rows are the per-position
    tables of ``_per_position_twiddles`` (shared with the DIT kernel)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    bits = n.bit_length() - 1
    stages = range(bits, 0, -1) if dif else range(1, bits + 1)

    def body(twlo_ref, twhi_ref, lo, hi):
        lanes = lo.shape[1]
        row = jax.lax.broadcasted_iota(jnp.int32, (n, lanes), 0)
        for s in stages:
            m = 1 << s
            half = m >> 1
            twl = twlo_ref[s - 1, :][:, None]
            twh = twhi_ref[s - 1, :][:, None]
            mask = (row & (m - 1)) < half
            if dif:
                # e' = a + b ; o' = (a - b) * w   (a = x[i], b = x[i+half])
                up_lo = pltpu.roll(lo, n - half, 0)  # x[i+half]
                up_hi = pltpu.roll(hi, n - half, 0)
                down_lo = pltpu.roll(lo, half, 0)  # x[i-half]
                down_hi = pltpu.roll(hi, half, 0)
                alo, ahi = gl.add((lo, hi), (up_lo, up_hi))
                dlo, dhi = gl.sub((down_lo, down_hi), (lo, hi))
                slo, shi = gl.mul((dlo, dhi), (twl, twh))
                lo = jnp.where(mask, alo, slo)
                hi = jnp.where(mask, ahi, shi)
            else:
                plo, phi = gl.mul((lo, hi), (twl, twh))
                up_plo = pltpu.roll(plo, n - half, 0)
                up_phi = pltpu.roll(phi, n - half, 0)
                down_lo = pltpu.roll(lo, half, 0)
                down_hi = pltpu.roll(hi, half, 0)
                alo, ahi = gl.add((lo, hi), (up_plo, up_phi))
                slo, shi = gl.sub((down_lo, down_hi), (plo, phi))
                lo = jnp.where(mask, alo, slo)
                hi = jnp.where(mask, ahi, shi)
        return lo, hi

    return body


@functools.lru_cache(maxsize=None)
def _build_call(B: int, n: int, lanes_total: int, dif: bool, post_mul: bool,
                interpret: bool = False):
    """pallas_call over (B, n, lanes_total) with blocks (1, n, LANES);
    optional fused epilogue multiply by a static (n, lanes_total) table."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bits = n.bit_length() - 1
    body = _make_body(n, dif)

    if post_mul:

        def kernel(twlo_ref, twhi_ref, ptlo_ref, pthi_ref, xlo_ref, xhi_ref,
                   olo_ref, ohi_ref):
            lo, hi = body(twlo_ref, twhi_ref, xlo_ref[0], xhi_ref[0])
            lo, hi = gl.mul((lo, hi), (ptlo_ref[:], pthi_ref[:]))
            olo_ref[0] = lo
            ohi_ref[0] = hi

    else:

        def kernel(twlo_ref, twhi_ref, xlo_ref, xhi_ref, olo_ref, ohi_ref):
            lo, hi = body(twlo_ref, twhi_ref, xlo_ref[0], xhi_ref[0])
            olo_ref[0] = lo
            ohi_ref[0] = hi

    grid = (B, lanes_total // LANES)
    in_specs = [
        pl.BlockSpec((bits, n), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bits, n), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    if post_mul:
        in_specs += [
            pl.BlockSpec((n, LANES), lambda b, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, LANES), lambda b, j: (0, j), memory_space=pltpu.VMEM),
        ]
    in_specs += [
        pl.BlockSpec((1, n, LANES), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, LANES), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM),
    ]
    extra = {}
    if not interpret:
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES
        )

    def call(*args):
        return pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=(
                jax.ShapeDtypeStruct((B, n, lanes_total), jnp.uint32),
                jax.ShapeDtypeStruct((B, n, lanes_total), jnp.uint32),
            ),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, n, LANES), lambda b, j: (b, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, LANES), lambda b, j: (b, 0, j),
                             memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
            **extra,
        )(*args)

    return jax.jit(call)


# ---------------------------------------------------------------------------
# host-side static tables
# ---------------------------------------------------------------------------


def _pick_factors(n: int, L: int):
    """a*b = n, a*B = L with a, b, B all in [LANES, MAX_TILE].  Maximal a so
    the outer (size-B) tile fits; requires n >= 2^14 and L <= 2^24."""
    bits_n = n.bit_length() - 1
    for log_a in range(min(12, bits_n - 7), 6, -1):
        a = 1 << log_a
        if a <= MAX_TILE and L // a <= MAX_TILE and LANES <= n // a <= MAX_TILE:
            return a, n // a, L // a
    raise ValueError(f"no valid factorization for n={n}, L={L}")


def supported(n: int, L: int) -> bool:
    try:
        _pick_factors(n, L)
        return True
    except ValueError:
        return False


def _power_series_rows(bases_u64: np.ndarray, ncols: int) -> np.ndarray:
    """(R,) bases -> (R, ncols) uint64 with out[r, c] = bases[r]^c mod P,
    via log-doubling on vectorized limb ops (no python-int loops)."""
    R = len(bases_u64)
    cur = gl.from_u64(np.ones((R, 1), np.uint64))
    scale = tuple(x.reshape(R, 1) for x in gl.from_u64(bases_u64))
    length = 1
    while length < ncols:
        nxt = gl.mul(cur, scale)
        cur = (
            np.concatenate([cur[0], nxt[0]], axis=1),
            np.concatenate([cur[1], nxt[1]], axis=1),
        )
        scale = gl.square(scale)
        length *= 2
    return gl.to_u64((cur[0][:, :ncols], cur[1][:, :ncols]))


def _rev_and_j(a: int, b: int):
    """rev perms and the j1/j2 inverse maps: j1s[s] is the j1 with
    rev_a(j1) == s (and likewise j2s for b)."""
    rev_a = ntt_mod._bit_rev_perm(a)
    rev_b = ntt_mod._bit_rev_perm(b)
    j1s = np.empty(a, dtype=np.int64)
    j1s[rev_a] = np.arange(a)
    j2s = np.empty(b, dtype=np.int64)
    j2s[rev_b] = np.arange(b)
    return rev_a, rev_b, j1s, j2s


@functools.lru_cache(maxsize=None)
def _intt_tables_np(n: int, L: int, scale_base: int):
    """K1/K2 tables: natural length-n evals -> permuted output holding
    (1/n) * scale_base^j * iNTT_j at [rev_b(j2), rev_a(j1)].

    scale_base = 1                    -> plain interpolate (coeffs / offset 1)
    scale_base = inv(interp_offset)   -> coset interpolation (true coeffs)
    scale_base = eval_offset          -> fused interpolate+LDE pre-scale
    """
    a, b, Bf = _pick_factors(n, L)
    rev_a, rev_b, j1s, j2s = _rev_and_j(a, b)

    w_n_inv = pow(gl.get_root_of_unity(n.bit_length() - 1), gl.P - 2, gl.P)
    n_inv = pow(n, gl.P - 2, gl.P)

    # K1 epilogue: W_n^{-j1*t2} at [rev_a(j1), t2]  (a, b)
    wninv_pows = _power_series_rows(np.array([w_n_inv], np.uint64), a)[0]
    e1 = _power_series_rows(wninv_pows[j1s], b)

    # K2 epilogue: (1/n) * scale_base^j at [rev_b(j2), rev_a(j1)]  (b, a)
    s_pows = _power_series_rows(np.array([scale_base % gl.P], np.uint64), n)[0]
    jgrid = j1s[None, :] + a * j2s[:, None]  # (b, a)
    e2_raw = gl.from_u64(s_pows[jgrid])
    ninv_c = gl.from_int(n_inv, (1, 1))
    e2 = gl.to_u64(gl.mul(e2_raw, ninv_c))

    return {
        "a": a,
        "b": b,
        "B": Bf,
        "k1": _per_position_twiddles(a, True),
        "e1": gl.from_u64(e1),
        "k2": _per_position_twiddles(b, True),
        "e2": gl.from_u64(e2),
    }


@functools.lru_cache(maxsize=None)
def _fwd_tables_np(L: int, a: int):
    """K3/K4 tables: permuted (rows, a) coefficients -> natural length-L
    evaluations (the second half of the schedule)."""
    Bf = L // a
    rev_a = ntt_mod._bit_rev_perm(a)
    j1s = np.empty(a, dtype=np.int64)
    j1s[rev_a] = np.arange(a)
    w_L = gl.get_root_of_unity(L.bit_length() - 1)
    wl_pows = _power_series_rows(np.array([w_L], np.uint64), a)[0]
    e3 = _power_series_rows(wl_pows[j1s], Bf).T.copy()  # (Bf, a): W_L^{r j1}
    return {
        "k3": _per_position_twiddles(Bf, False),
        "e3": gl.from_u64(e3),
        "k4": _per_position_twiddles(a, False),
    }


@functools.lru_cache(maxsize=None)
def _scale_table_np(rows: int, a: int, s: int):
    """(rows, a) table s^t at [rev_rows(j2), rev_a(j1)], t = j1 + a*j2 —
    the per-coefficient offset scaling for lde_from_permuted."""
    _, _, j1s, j2s = _rev_and_j(a, rows)
    s_pows = _power_series_rows(np.array([s % gl.P], np.uint64), rows * a)[0]
    tgrid = j1s[None, :] + a * j2s[:, None]
    return gl.from_u64(s_pows[tgrid])


def _dev_cache(key, build):
    """Build-once numpy tables, device_put once, cached in ntt._TW_CACHE."""
    if key not in ntt_mod._TW_CACHE:
        import jax

        t = build()
        t = {
            k: (tuple(jax.device_put(np.asarray(x)) for x in v)
                if isinstance(v, tuple) else v)
            for k, v in t.items()
        }
        ntt_mod._TW_CACHE[key] = t
    return ntt_mod._TW_CACHE[key]


def lde_consts(n: int, L: int, offset: int, device: bool = True):
    """Device-resident tables for the fused interpolate_lde."""
    if not device:
        t = dict(_intt_tables_np(n, L, offset))
        t.update(_fwd_tables_np(L, t["a"]))
        return t
    key = ("ntt4_lde", n, L, offset)

    def build():
        t = dict(_intt_tables_np(n, L, offset))
        t.update(_fwd_tables_np(L, t["a"]))
        return t

    return _dev_cache(key, build)


def intt_consts(n: int, L: int, interp_offset: int, device: bool = True):
    """Device-resident tables for intt_permuted (true-coefficient output)."""
    s = pow(interp_offset % gl.P, gl.P - 2, gl.P)
    if not device:
        return dict(_intt_tables_np(n, L, s))
    return _dev_cache(("ntt4_intt", n, L, s), lambda: dict(_intt_tables_np(n, L, s)))


def fwd_consts(L: int, a: int, eval_offset: int, rows: int, device: bool = True):
    """Device-resident tables for lde_from_permuted: K3/K4 + the offset^t
    coefficient pre-scale for a (rows, a) permuted input."""

    def build():
        t = dict(_fwd_tables_np(L, a))
        t["o"] = _scale_table_np(rows, a, eval_offset)
        return t

    if not device:
        return build()
    return _dev_cache(("ntt4_fwd", L, a, eval_offset, rows), build)


# ---------------------------------------------------------------------------
# pipelines
# ---------------------------------------------------------------------------


def _run_k1k2(comps, c, interpret):
    """Natural (..., n) -> permuted (..., b, a) through K1/T/K2."""
    import jax.numpy as jnp

    shape = comps[0][0].shape
    b, a = c["e2"][0].shape  # static even when c rides through jit as a pytree
    batch = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    k1 = _build_call(batch, a, b, True, True, interpret)
    k2 = _build_call(batch, b, a, True, True, interpret)
    out = []
    for lo, hi in comps:
        lo = lo.reshape(batch, a, b)
        hi = hi.reshape(batch, a, b)
        lo, hi = k1(c["k1"][0], c["k1"][1], c["e1"][0], c["e1"][1], lo, hi)
        lo = jnp.transpose(lo, (0, 2, 1))
        hi = jnp.transpose(hi, (0, 2, 1))
        lo, hi = k2(c["k2"][0], c["k2"][1], c["e2"][0], c["e2"][1], lo, hi)
        out.append((lo.reshape(shape[:-1] + (b, a)),
                    hi.reshape(shape[:-1] + (b, a))))
    return tuple(out)


def _run_interleave_k3k4(comps, c, L, interpret, scale=None):
    """Permuted (..., rows, a) -> natural (..., L) through zero-interleave +
    K3/T/K4.  ``scale``: optional (rows, a) pre-multiply table (offset^t)."""
    import jax.numpy as jnp

    shape = comps[0][0].shape
    rows, a = shape[-2], shape[-1]
    Bf = L // a
    f = Bf // rows  # zero-interleave factor
    batch = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    k3 = _build_call(batch, Bf, a, False, True, interpret)
    k4 = _build_call(batch, a, Bf, False, False, interpret)
    out = []
    for lo, hi in comps:
        lo = lo.reshape(batch, rows, a)
        hi = hi.reshape(batch, rows, a)
        if scale is not None:
            lo, hi = gl.mul((lo, hi), (scale[0][None], scale[1][None]))
        # (batch, rows, a) -> (batch, a, rows) -> interleave -> (batch, a, B)
        lo = jnp.transpose(lo, (0, 2, 1))
        hi = jnp.transpose(hi, (0, 2, 1))
        if f > 1:
            z = jnp.zeros((batch, a, rows, f - 1), dtype=jnp.uint32)
            lo = jnp.concatenate([lo[..., None], z], axis=-1).reshape(batch, a, Bf)
            hi = jnp.concatenate([hi[..., None], z], axis=-1).reshape(batch, a, Bf)
        lo = jnp.transpose(lo, (0, 2, 1))
        hi = jnp.transpose(hi, (0, 2, 1))
        lo, hi = k3(c["k3"][0], c["k3"][1], c["e3"][0], c["e3"][1], lo, hi)
        lo = jnp.transpose(lo, (0, 2, 1))
        hi = jnp.transpose(hi, (0, 2, 1))
        lo, hi = k4(c["k4"][0], c["k4"][1], lo, hi)
        out.append((lo.reshape(shape[:-2] + (L,)), hi.reshape(shape[:-2] + (L,))))
    return tuple(out)


def interpolate_lde(comps, blowup: int, offset: int, consts=None,
                    interpret: bool = False, return_permuted: bool = False):
    """Length-n natural-order evaluations (..., n) -> natural-order coset
    LDE (..., n*blowup), all in four fused Pallas kernels + XLA transposes.

    Semantics == ntt.interpolate_poly followed by
    ntt.evaluate_poly_with_offset (fft/serial.rs:26-93), byte-exact.

    With return_permuted=True also returns the K2 intermediates: permuted
    (..., b, a) arrays holding offset^j * c_j (the o^j-scaled coefficients;
    pair with permuted_power_series of z/offset for OOD evaluation).
    """
    interpret = interpret or INTERPRET
    import jax.numpy as jnp

    n = comps[0][0].shape[-1]
    L = n * blowup
    if consts is None:
        c = lde_consts(n, L, offset, device=False)
        c = {
            k: (tuple(jnp.asarray(np.asarray(x)) for x in v)
                if isinstance(v, tuple) else v)
            for k, v in c.items()
        }
    else:
        c = consts
    pc = _run_k1k2(comps, c, interpret)
    lde = _run_interleave_k3k4(pc, c, L, interpret)
    if return_permuted:
        return lde, pc
    return lde


def intt_permuted(comps, interp_offset: int, L: int, consts=None,
                  interpret: bool = False):
    """Natural-order evaluations (..., n) over the coset interp_offset*<w_n>
    -> TRUE polynomial coefficients in permuted layout (..., b, a):
    out[..., rev_b(j2), rev_a(j1)] = c_{j1 + a*j2}.

    == ntt.interpolate_poly_with_offset, re-laid out.  L picks the tile
    factor `a` shared with a later lde_from_permuted to size L.
    """
    interpret = interpret or INTERPRET
    import jax.numpy as jnp

    n = comps[0][0].shape[-1]
    if consts is None:
        c = intt_consts(n, L, interp_offset, device=False)
        c = {
            k: (tuple(jnp.asarray(np.asarray(x)) for x in v)
                if isinstance(v, tuple) else v)
            for k, v in c.items()
        }
    else:
        c = consts
    return _run_k1k2(comps, c, interpret)


def lde_from_permuted(comps, L: int, eval_offset: int, consts=None,
                      interpret: bool = False):
    """Permuted TRUE coefficients (..., rows, a) of length rows*a polys ->
    natural-order evaluations over eval_offset*<w_L> shaped (..., L).

    == ntt.evaluate_poly_with_offset, fed from the permuted layout.
    """
    interpret = interpret or INTERPRET
    import jax.numpy as jnp

    rows, a = comps[0][0].shape[-2:]
    if consts is None:
        c = fwd_consts(L, a, eval_offset, rows, device=False)
        c = {
            k: (tuple(jnp.asarray(np.asarray(x)) for x in v)
                if isinstance(v, tuple) else v)
            for k, v in c.items()
        }
    else:
        c = consts
    return _run_interleave_k3k4(comps, c, L, interpret, scale=c["o"])


def _rev_bits(k: int, bits: int) -> int:
    r = 0
    for i in range(bits):
        r |= ((k >> i) & 1) << (bits - 1 - i)
    return r


def slice_columns_permuted(comps, num_cols: int, keep: int = None):
    """Permuted (..., b, a) coefficients of a length-n poly -> per-column
    permuted coefficients: a list of ``keep`` (default num_cols) entries,
    column k shaped (..., b/num_cols, a) holding c_{k*tl + t} at
    [rev_{b'}(j2'), rev_a(j1)] with t = j1 + a*j2' and tl = n/num_cols.

    In the permuted layout the coefficient-slice split (air/src/proof's
    composition column convention: coefficient j -> column j // tl) is a
    strided row slice: column k owns rows r with r % num_cols == rev(k).
    """
    if num_cols == 1:
        return [comps]
    bits = num_cols.bit_length() - 1
    keep = num_cols if keep is None else keep
    cols = []
    for k in range(keep):
        rk = _rev_bits(k, bits)
        cols.append(tuple(
            (lo[..., rk::num_cols, :], hi[..., rk::num_cols, :])
            for lo, hi in comps
        ))
    return cols


def permuted_power_series(x_elem, n: int, a: int, b: int):
    """Power series [x^j for j < n] of an (1,)-shaped extension element,
    laid out (b, a) like the permuted coefficients: out[rev_b(j2),
    rev_a(j1)] = x^{j1 + a*j2}.  Built on device: natural log-doubling
    series + two small static index takes (a, b <= 4096 entries)."""
    import jax.numpy as jnp

    from .. import vec

    rev_a = jnp.asarray(ntt_mod._bit_rev_perm(a))
    rev_b = jnp.asarray(ntt_mod._bit_rev_perm(b))
    ps = vec.power_series_elem(x_elem, n)  # tuple of d pairs shaped (n,)
    out = []
    for lo, hi in ps:
        lo = lo.reshape(b, a)[rev_b][:, rev_a]
        hi = hi.reshape(b, a)[rev_b][:, rev_a]
        out.append((lo, hi))
    return tuple(out)
