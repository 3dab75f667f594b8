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
    K2  DIF_b   (+epilogue (1/n) * offset^j at [rev_b(j2), rev_a(j1)])
    T   transpose -> (.., a, b), zero-interleave cols by blowup -> (.., a, B)
    T   transpose -> (.., B, a)
    K3  DIT_B   (+epilogue W_L^{r j1} at [r, rev_a(j1)])
    T   transpose -> (.., a, B)
    K4  DIT_a   -> natural X[q*B + r], reshape (.., L)

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
    """a*b = n, a*B = L with a, b, B all in [128, MAX_TILE]."""
    bits_L = L.bit_length() - 1
    bits_n = n.bit_length() - 1
    # choose a as large as possible subject to B = L/a <= MAX_TILE and
    # b = n/a >= 128 (lanes), a <= MAX_TILE
    for log_a in range(min(12, bits_n - 7), 6, -1):
        a = 1 << log_a
        if a <= MAX_TILE and L // a <= MAX_TILE and n // a >= 128:
            return a, n // a, L // a
    raise ValueError(f"no valid factorization for n={n}, L={L}")


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


@functools.lru_cache(maxsize=None)
def _lde_tables_np(n: int, L: int, offset: int):
    """All static tables for interpolate_lde (natural evals -> natural coset
    LDE), in the permuted layouts of the gather-free schedule."""
    a, b, Bf = _pick_factors(n, L)
    rev_a = ntt_mod._bit_rev_perm(a)
    rev_b = ntt_mod._bit_rev_perm(b)

    w_n_inv = pow(gl.get_root_of_unity(n.bit_length() - 1), gl.P - 2, gl.P)
    w_L = gl.get_root_of_unity(L.bit_length() - 1)
    n_inv = pow(n, gl.P - 2, gl.P)

    j1s = np.empty(a, dtype=np.int64)
    j1s[rev_a] = np.arange(a)  # row/col r holds j1 with rev_a(j1) == r
    j2s = np.empty(b, dtype=np.int64)
    j2s[rev_b] = np.arange(b)

    # K1 epilogue: W_n^{-j1*t2} at [rev_a(j1), t2]  (a, b)
    wninv_pows = _power_series_rows(np.array([w_n_inv], np.uint64), a)[0]
    e1 = _power_series_rows(wninv_pows[j1s], b)

    # K2 epilogue: (1/n) * offset^j at [rev_b(j2), rev_a(j1)]  (b, a)
    offs_pows = _power_series_rows(np.array([offset], np.uint64), n)[0]
    jgrid = j1s[None, :] + a * j2s[:, None]  # (b, a)
    e2_raw = gl.from_u64(offs_pows[jgrid])
    ninv_c = gl.from_int(n_inv, (1, 1))
    e2 = gl.to_u64(gl.mul(e2_raw, ninv_c))

    # K3 epilogue: W_L^{r*j1} at [r, rev_a(j1)]  (B, a)
    wl_pows = _power_series_rows(np.array([w_L], np.uint64), a)[0]
    e3 = _power_series_rows(wl_pows[j1s], Bf).T.copy()

    ktw_a_inv = _per_position_twiddles(a, True)
    ktw_b_inv = _per_position_twiddles(b, True)
    ktw_B_fwd = _per_position_twiddles(Bf, False)
    ktw_a_fwd = _per_position_twiddles(a, False)
    return {
        "a": a,
        "b": b,
        "B": Bf,
        "k1": ktw_a_inv,
        "e1": gl.from_u64(e1),
        "k2": ktw_b_inv,
        "e2": gl.from_u64(e2),
        "k3": ktw_B_fwd,
        "e3": gl.from_u64(e3),
        "k4": ktw_a_fwd,
    }


def lde_consts(n: int, L: int, offset: int, device: bool = True):
    """Device-resident tables, device_put once per (n, L, offset)."""
    key = ("ntt4_lde", n, L, offset)
    if key not in ntt_mod._TW_CACHE:
        t = _lde_tables_np(n, L, offset)
        if device:
            import jax

            t = {
                k: (tuple(jax.device_put(np.asarray(x)) for x in v)
                    if isinstance(v, tuple) else v)
                for k, v in t.items()
            }
        ntt_mod._TW_CACHE[key] = t
    return ntt_mod._TW_CACHE[key]


def interpolate_lde(comps, blowup: int, offset: int, consts=None,
                    interpret: bool = False):
    """Length-n natural-order evaluations (..., n) -> natural-order coset
    LDE (..., n*blowup), all in four fused Pallas kernels + XLA transposes.

    Semantics == ntt.interpolate_poly followed by
    ntt.evaluate_poly_with_offset (fft/serial.rs:26-93), byte-exact.
    """
    import jax.numpy as jnp

    shape = comps[0][0].shape
    n = shape[-1]
    L = n * blowup
    if consts is None:
        c = _lde_tables_np(n, L, offset)
        c = {
            k: (tuple(jnp.asarray(np.asarray(x)) for x in v)
                if isinstance(v, tuple) else v)
            for k, v in c.items()
        }
    else:
        c = consts
    a, b, Bf = c["a"], c["b"], c["B"]
    batch = int(np.prod(shape[:-1])) if len(shape) > 1 else 1

    k1 = _build_call(batch, a, b, True, True, interpret)
    k2 = _build_call(batch, b, a, True, True, interpret)
    k3 = _build_call(batch, Bf, a, False, True, interpret)
    k4 = _build_call(batch, a, Bf, False, False, interpret)

    out = []
    for lo, hi in comps:
        lo = lo.reshape(batch, a, b)
        hi = hi.reshape(batch, a, b)
        lo, hi = k1(c["k1"][0], c["k1"][1], c["e1"][0], c["e1"][1], lo, hi)
        lo = jnp.transpose(lo, (0, 2, 1))
        hi = jnp.transpose(hi, (0, 2, 1))
        lo, hi = k2(c["k2"][0], c["k2"][1], c["e2"][0], c["e2"][1], lo, hi)
        # (batch, b, a) -> transpose (batch, a, b) -> zero-interleave cols by
        # blowup -> (batch, a, B) -> transpose -> (batch, B, a)
        lo = jnp.transpose(lo, (0, 2, 1))
        hi = jnp.transpose(hi, (0, 2, 1))
        z = jnp.zeros((batch, a, b, blowup - 1), dtype=jnp.uint32)
        lo = jnp.concatenate([lo[..., None], z], axis=-1).reshape(batch, a, Bf)
        hi = jnp.concatenate([hi[..., None], z], axis=-1).reshape(batch, a, Bf)
        lo = jnp.transpose(lo, (0, 2, 1))
        hi = jnp.transpose(hi, (0, 2, 1))
        lo, hi = k3(c["k3"][0], c["k3"][1], c["e3"][0], c["e3"][1], lo, hi)
        lo = jnp.transpose(lo, (0, 2, 1))
        hi = jnp.transpose(hi, (0, 2, 1))
        lo, hi = k4(c["k4"][0], c["k4"][1], lo, hi)
        out.append((lo.reshape(shape[:-1] + (L,)), hi.reshape(shape[:-1] + (L,))))
    return tuple(out)
