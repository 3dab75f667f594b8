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


# ---------------------------------------------------------------------------
# batched 3-D kernel: NTT along axis 1 of (B, n, lanes) — the building block
# of the four-step large transform (no XLA transpose needed to reach the
# sublane axis).
# ---------------------------------------------------------------------------


def _make_kernel3(n: int, pre_twiddle: bool):
    """Kernel over a (1, n, LANES) block; optional fused element-wise
    pre-multiply by a (n, LANES) twiddle block (the four-step inner twiddle,
    already bit-rev-row-permuted and 1/n-scaled by the table builder).

    Butterfly formulation: roll-and-select (uniform full-tile ops), the same
    shape as the proven 2-D kernel above.  Measured on v5e it beats a
    sliced half-mul formulation 2x (Mosaic pays more for the (n/m, m, LANES)
    reshape/concat relayouts than it saves in muls), and unlike a
    roll+sliced hybrid it also compiles cleanly in interpret mode."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    bits = n.bit_length() - 1

    def body(twlo_ref, twhi_ref, lo, hi):
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
        return lo, hi

    if pre_twiddle:

        def kernel(twlo_ref, twhi_ref, ptlo_ref, pthi_ref, xlo_ref, xhi_ref,
                   olo_ref, ohi_ref):
            lo, hi = gl.mul(
                (xlo_ref[0], xhi_ref[0]), (ptlo_ref[:], pthi_ref[:])
            )
            lo, hi = body(twlo_ref, twhi_ref, lo, hi)
            olo_ref[0] = lo
            ohi_ref[0] = hi

    else:

        def kernel(twlo_ref, twhi_ref, xlo_ref, xhi_ref, olo_ref, ohi_ref):
            lo, hi = body(twlo_ref, twhi_ref, xlo_ref[0], xhi_ref[0])
            olo_ref[0] = lo
            ohi_ref[0] = hi

    return kernel


VMEM_LIMIT_BYTES = 96 * 1024 * 1024


@functools.lru_cache(maxsize=None)
def _build_call3(B: int, n: int, lanes_total: int, pre_twiddle: bool,
                 interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bits = n.bit_length() - 1
    kernel = _make_kernel3(n, pre_twiddle)
    grid = (B, lanes_total // LANES)

    in_specs = [
        pl.BlockSpec((bits, n), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bits, n), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    if pre_twiddle:
        in_specs += [
            pl.BlockSpec((n, LANES), lambda b, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, LANES), lambda b, j: (0, j), memory_space=pltpu.VMEM),
        ]
    in_specs += [
        pl.BlockSpec((1, n, LANES), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, LANES), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM),
    ]

    # CompilerParams makes the interpret path hang in native code — only
    # pass it to the real Mosaic compile
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

    # NOTE: the jit wrapper matters even for interpret mode — an EAGER
    # interpret-mode pallas_call returns arrays whose host transfer hangs
    # in native code (observed on the CPU backend).
    return jax.jit(call)


MIN_FOUR_STEP = 1 << 14  # below this, n1 or n2 would drop under 128 lanes


@functools.lru_cache(maxsize=None)
def four_step_consts_np(n: int, inverse: bool, scale: bool):
    """Host tables for the four-step pipeline of size n = n1*n2:
    (n1, n2, rev1, rev2, ktw1 (bits1, n1) x2, ktw2 (bits2, n2) x2,
    twT_rev (n2, n1) x2 — inner twiddle transposed + rev2-row-permuted,
    pre-scaled by 1/n for the inverse transform)."""
    bits = n.bit_length() - 1
    n1 = 1 << (bits // 2)
    n2 = n // n1
    root = gl.get_root_of_unity(bits)
    if inverse:
        root = pow(root, gl.P - 2, gl.P)
    rev1 = ntt_mod._bit_rev_perm(n1)
    rev2 = ntt_mod._bit_rev_perm(n2)
    ktw1 = _per_position_twiddles(n1, inverse)
    ktw2 = _per_position_twiddles(n2, inverse)
    # tw[i1, k2] = root^(i1*k2); build transposed (n2, n1) row by row:
    # twT[k2, i1] = (root^k2)^i1
    twT = np.empty((n2, n1), dtype=np.uint64)
    for k2 in range(n2):
        base = pow(root, k2, gl.P)
        row = np.empty(n1, dtype=np.uint64)
        acc = 1
        for i1 in range(n1):
            row[i1] = acc
            acc = (acc * base) % gl.P
        twT[k2] = row
    if inverse and scale:
        n_inv = pow(n, gl.P - 2, gl.P)
        twT = (twT.astype(object) * n_inv % gl.P).astype(np.uint64)
    twT = twT[rev2]
    return n1, n2, rev1, rev2, ktw1, ktw2, gl.from_u64(twT)


def four_step_consts(n: int, inverse: bool, scale: bool = True):
    """Device-resident tables (device_put once, cached) for jit-arg passing."""
    import jax

    key = ("fourstep_dev", n, inverse, scale)
    if key not in ntt_mod._TW_CACHE:
        n1, n2, rev1, rev2, ktw1, ktw2, twT = four_step_consts_np(n, inverse, scale)
        ntt_mod._TW_CACHE[key] = {
            "n1": n1,
            "n2": n2,
            "rev1": jax.device_put(rev1),
            "rev2": jax.device_put(rev2),
            "ktw1": tuple(jax.device_put(x) for x in ktw1),
            "ktw2": tuple(jax.device_put(x) for x in ktw2),
            "twT": tuple(jax.device_put(x) for x in twT),
        }
    return ntt_mod._TW_CACHE[key]


def four_step_ntt(comps, inverse: bool = False, scale: bool = True, consts=None,
                  interpret: bool = False):
    """Four-step NTT along the LAST axis of (..., n) limb pairs, n >= 2^14:

      view (B, n1, n2) -> bit-rev rows -> fused Pallas NTT over n1
      -> XLA transpose -> bit-rev rows -> fused Pallas NTT over n2 with the
      inner twiddle (and 1/n scale) folded into the kernel prologue
      -> natural-order (B, n) output.

    The same decomposition the reference uses for intra-FFT concurrency
    (prover/src/matrix/segments.rs:232-271), re-cut so each inner transform
    is one VMEM-resident Pallas kernel and the only HBM round trips are the
    kernels' own reads/writes plus one transpose.
    """
    import jax.numpy as jnp

    shape = comps[0][0].shape
    n = shape[-1]
    assert n >= MIN_FOUR_STEP and n & (n - 1) == 0
    if consts is None:
        c = four_step_consts_np(n, inverse, scale)
        n1, n2, rev1, rev2, ktw1, ktw2, twT = c
        ktw1 = tuple(jnp.asarray(x) for x in ktw1)
        ktw2 = tuple(jnp.asarray(x) for x in ktw2)
        twT = tuple(jnp.asarray(x) for x in twT)
    else:
        n1, n2 = consts["n1"], consts["n2"]
        rev1, rev2 = consts["rev1"], consts["rev2"]
        ktw1, ktw2, twT = consts["ktw1"], consts["ktw2"], consts["twT"]
    B = int(np.prod(shape[:-1])) if len(shape) > 1 else 1

    call1 = _build_call3(B, n1, n2, False, interpret)
    call2 = _build_call3(B, n2, n1, True, interpret)
    out = []
    for lo, hi in comps:
        lo = lo.reshape(B, n1, n2)
        hi = hi.reshape(B, n1, n2)
        lo = jnp.take(lo, rev1, axis=1)
        hi = jnp.take(hi, rev1, axis=1)
        lo, hi = call1(ktw1[0], ktw1[1], lo, hi)
        lo = jnp.transpose(lo, (0, 2, 1))
        hi = jnp.transpose(hi, (0, 2, 1))
        lo = jnp.take(lo, rev2, axis=1)
        hi = jnp.take(hi, rev2, axis=1)
        lo, hi = call2(ktw2[0], ktw2[1], twT[0], twT[1], lo, hi)
        out.append((lo.reshape(shape), hi.reshape(shape)))
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
