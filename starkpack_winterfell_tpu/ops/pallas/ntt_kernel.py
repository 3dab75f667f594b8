"""Pallas TPU kernel: fused multi-stage Goldilocks NTT.

The XLA stage-by-stage NTT pays one HBM round trip per butterfly stage; this
kernel keeps a (n, 128) tile of 128 independent transforms resident in VMEM
and runs ALL log2(n) stages before writing back — one HBM read + one write
for the whole transform.

Butterflies use a roll-and-select formulation (no reshapes, Mosaic-friendly):
  stage m, half = m/2, j = i mod m:
    prod[i]  = w_m^{i mod half} * x[i]
    out[i]   = x[i] + roll(prod, -half)[i]        if j <  half
             = roll(x, +half)[i] - prod[i]        if j >= half

Twiddle tables are passed as (log n, n) periodic per-position arrays.
"""

from __future__ import annotations

import functools

import numpy as np

from .. import gl64 as gl
from .. import ntt as ntt_mod

MAX_TILE_N = 4096
LANES = 128


@functools.lru_cache(maxsize=None)
def _per_position_twiddles(n: int, inverse: bool):
    """(log n, n) uint32 lo/hi arrays: row s-1 holds w_{2^s}^(i mod 2^(s-1))."""
    bits = n.bit_length() - 1
    root = gl.get_root_of_unity(bits)
    if inverse:
        root = pow(root, gl.P - 2, gl.P)
    lo = np.zeros((bits, n), dtype=np.uint32)
    hi = np.zeros((bits, n), dtype=np.uint32)
    for s in range(1, bits + 1):
        m = 1 << s
        half = m // 2
        w_m = pow(root, n // m, gl.P)
        tab = np.empty(half, dtype=np.uint64)
        acc = 1
        for j in range(half):
            tab[j] = acc
            acc = (acc * w_m) % gl.P
        full = tab[np.arange(n) % half]
        lo[s - 1] = (full & 0xFFFFFFFF).astype(np.uint32)
        hi[s - 1] = (full >> 32).astype(np.uint32)
    return lo, hi


def _make_kernel(n: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    bits = n.bit_length() - 1

    def kernel(twlo_ref, twhi_ref, xlo_ref, xhi_ref, olo_ref, ohi_ref):
        lo = xlo_ref[:]
        hi = xhi_ref[:]
        lanes = lo.shape[1]
        row = jax.lax.broadcasted_iota(jnp.int32, (n, lanes), 0)
        for s in range(1, bits + 1):
            m = 1 << s
            half = m >> 1
            twl = twlo_ref[s - 1, :][:, None]
            twh = twhi_ref[s - 1, :][:, None]
            plo, phi = gl.mul((lo, hi), (twl, twh))
            up_plo = pltpu.roll(plo, n - half, 0)  # roll(x, -half)
            up_phi = pltpu.roll(phi, n - half, 0)
            down_lo = pltpu.roll(lo, half, 0)
            down_hi = pltpu.roll(hi, half, 0)
            alo, ahi = gl.add((lo, hi), (up_plo, up_phi))
            slo, shi = gl.sub((down_lo, down_hi), (plo, phi))
            mask = (row & (m - 1)) < half
            lo = jnp.where(mask, alo, slo)
            hi = jnp.where(mask, ahi, shi)
        olo_ref[:] = lo
        ohi_ref[:] = hi

    return kernel


INTERPRET = False  # set True to run the kernel in interpreter mode (CPU tests)


@functools.lru_cache(maxsize=None)
def _build_call(n: int, lanes_total: int, inverse: bool, interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bits = n.bit_length() - 1
    kernel = _make_kernel(n)
    grid = (lanes_total // LANES,)

    def call(twlo, twhi, xlo, xhi):
        return pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=(
                jax.ShapeDtypeStruct((n, lanes_total), jnp.uint32),
                jax.ShapeDtypeStruct((n, lanes_total), jnp.uint32),
            ),
            in_specs=[
                pl.BlockSpec((bits, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bits, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((n, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )(twlo, twhi, xlo, xhi)

    return jax.jit(call)


def pallas_ntt_axis0(comps, inverse: bool = False, scale: bool = True):
    """NTT along axis 0 of (n, lanes) limb pairs via the fused kernel.
    n must be a power of two <= MAX_TILE_N; lanes padded to 128 multiples."""
    import jax.numpy as jnp

    n, lanes_total = comps[0][0].shape
    assert n <= MAX_TILE_N and n & (n - 1) == 0
    pad = (-lanes_total) % LANES
    twlo, twhi = _per_position_twiddles(n, inverse)
    rev = ntt_mod._bit_rev_perm(n)
    out = []
    for lo, hi in comps:
        if pad:
            lo = jnp.concatenate([lo, jnp.zeros((n, pad), dtype=jnp.uint32)], axis=1)
            hi = jnp.concatenate([hi, jnp.zeros((n, pad), dtype=jnp.uint32)], axis=1)
        lo = lo[rev]
        hi = hi[rev]
        call = _build_call(n, lo.shape[1], inverse, INTERPRET)
        rlo, rhi = call(jnp.asarray(twlo), jnp.asarray(twhi), lo, hi)
        if pad:
            rlo = rlo[:, :lanes_total]
            rhi = rhi[:, :lanes_total]
        pair = (rlo, rhi)
        if inverse and scale:
            n_inv = pow(n, gl.P - 2, gl.P)
            c = gl.from_int(n_inv, (1,))
            pair = gl.mul(pair, (jnp.asarray(c[0]), jnp.asarray(c[1])))
        out.append(pair)
    return tuple(out)


def pallas_ntt_batched(comps, inverse: bool = False, scale: bool = True):
    """NTT along the LAST axis of (..., n) limb pairs by moving the transform
    axis to sublanes: (..., n) -> (n, batch) -> kernel -> back."""
    import jax.numpy as jnp

    shape = comps[0][0].shape
    n = shape[-1]
    batch = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    flat = tuple(
        (c[0].reshape(batch, n).T, c[1].reshape(batch, n).T) for c in comps
    )
    res = pallas_ntt_axis0(flat, inverse, scale)
    return tuple(
        (r[0].T.reshape(shape), r[1].T.reshape(shape)) for r in res
    )
