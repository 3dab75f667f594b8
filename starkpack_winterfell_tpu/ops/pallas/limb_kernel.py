"""Pallas TPU kernel: fused multi-stage NTT over the u32-limb fields.

The f62/f128 transforms in ops/limb_field.py run stage by stage in plain
XLA: every butterfly stage re-reads and re-writes the whole array in HBM,
and a single k-limb field multiply is a ~(100*k^2)-op u32 chain, so the
limb NTT is memory-/dispatch-bound, not compute-bound.  This kernel keeps
an (n, 128) tile of 128 independent transforms resident in VMEM and runs
ALL log2(n) stages (twiddle muls included) before writing back — one HBM
read + one write per transform, the same schedule the Goldilocks kernel in
ntt_kernel.py uses (reference decomposition: prover/src/matrix/segments.rs
six-step segment FFT).

Generic over the limb count: an element is a tuple of k uint32 planes
(little-endian limbs, canonical representation — ops/limb_field.py), so the
same kernel body serves f62 (k=2) and f128 (k=4).  Butterflies use the
roll-and-select formulation proven out for f64 (no reshapes/slices inside
the kernel — Mosaic-friendly, and the only formulation that also compiles
in interpreter mode, see CLAUDE.md):

  stage m, half = m/2, j = i mod m:
    prod[i]  = w_m^{i mod half} * x[i]
    out[i]   = x[i] + roll(prod, -half)[i]        if j <  half
             = roll(x, +half)[i] - prod[i]        if j >= half

Bit-exact with LimbField.ntt (differential-tested in interpret mode on the
CPU backend; tests/test_limb_pallas.py)."""

from __future__ import annotations

import functools

import numpy as np

from .. import ntt as ntt_mod

LANES = 128
VMEM_LIMIT_BYTES = 96 * 1024 * 1024

# Per-limb-count VMEM budget: block IO is 2*k planes of (n, 128) u32 plus
# the mul chain's live temporaries, so the tile cap shrinks as k grows.
MAX_TILE = {2: 4096, 4: 2048}

INTERPRET = False  # set True for XLA:CPU interpreter-mode tests

# None = auto (enabled on the TPU backend only); tests set True/False.
ENABLED = None


def enabled() -> bool:
    if ENABLED is not None:
        return ENABLED
    import jax

    try:
        # explicit allowlist ("axon" = the remote-TPU plugin's platform
        # name): Mosaic kernels are TPU-only
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # backend init failure — stay on the XLA path
        return False


@functools.lru_cache(maxsize=None)
def _per_position_twiddles(field_name: str, n: int, inverse: bool):
    """k-tuple of (log n, n) uint32 planes: row s-1 holds w_{2^s}^(i mod
    2^(s-1)) in limb plane order (same convention as the f64 kernel)."""
    field = _field(field_name)
    bits = n.bit_length() - 1
    root = field.get_root_of_unity(bits)
    if inverse:
        root = pow(root, field.P - 2, field.P)
    planes = [np.zeros((bits, n), dtype=np.uint32) for _ in range(field.n)]
    for s in range(1, bits + 1):
        m = 1 << s
        half = m // 2
        w_m = pow(root, n // m, field.P)
        vals = []
        acc = 1
        for _ in range(half):
            vals.append(acc)
            acc = acc * w_m % field.P
        full = [vals[i % half] for i in range(n)]
        for li in range(field.n):
            planes[li][s - 1] = np.array(
                [(v >> (32 * li)) & 0xFFFFFFFF for v in full], dtype=np.uint32
            )
    return tuple(planes)


def _field(name: str):
    from ..limb_field import FIELDS_BY_NAME

    return FIELDS_BY_NAME[name]


def _make_kernel(field_name: str, n: int, pre_twiddle: bool):
    """Kernel over a (1, n, LANES) block per limb plane; optional fused
    element-wise pre-multiply by (n, LANES) tables (the four-step inner
    twiddle / scale, pre-permuted by the caller)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    field = _field(field_name)
    k = field.n
    bits = n.bit_length() - 1

    def body(tw_refs, x):
        lanes = x[0].shape[1]
        row = jax.lax.broadcasted_iota(jnp.int32, (n, lanes), 0)
        for s in range(1, bits + 1):
            m = 1 << s
            half = m >> 1
            tw = tuple(r[s - 1, :][:, None] for r in tw_refs)
            p = field.mul(x, tw)
            up_p = tuple(pltpu.roll(c, n - half, 0) for c in p)  # roll -half
            down = tuple(pltpu.roll(c, half, 0) for c in x)
            a = field.add(x, up_p)
            d = field.sub(down, p)
            mask = (row & (m - 1)) < half
            x = tuple(jnp.where(mask, ac, dc) for ac, dc in zip(a, d))
        return x

    if pre_twiddle:

        def kernel(*refs):
            tw_refs = refs[:k]
            pt_refs = refs[k : 2 * k]
            x_refs = refs[2 * k : 3 * k]
            o_refs = refs[3 * k :]
            x = field.mul(
                tuple(r[0] for r in x_refs), tuple(r[:] for r in pt_refs)
            )
            x = body(tw_refs, x)
            for o, c in zip(o_refs, x):
                o[0] = c

    else:

        def kernel(*refs):
            tw_refs = refs[:k]
            x_refs = refs[k : 2 * k]
            o_refs = refs[2 * k :]
            x = body(tw_refs, tuple(r[0] for r in x_refs))
            for o, c in zip(o_refs, x):
                o[0] = c

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call(field_name: str, B: int, n: int, lanes_total: int,
                pre_twiddle: bool, interpret: bool = False):
    """pallas_call over (B, n, lanes_total) per plane, blocks (1, n, LANES);
    NTT along axis 1 (bit-reversed input order, natural output)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    field = _field(field_name)
    k = field.n
    bits = n.bit_length() - 1
    kernel = _make_kernel(field_name, n, pre_twiddle)
    grid = (B, lanes_total // LANES)

    in_specs = [
        pl.BlockSpec((bits, n), lambda b, j: (0, 0), memory_space=pltpu.VMEM)
        for _ in range(k)
    ]
    if pre_twiddle:
        in_specs += [
            pl.BlockSpec((n, LANES), lambda b, j: (0, j), memory_space=pltpu.VMEM)
            for _ in range(k)
        ]
    in_specs += [
        pl.BlockSpec((1, n, LANES), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM)
        for _ in range(k)
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
            out_shape=tuple(
                jax.ShapeDtypeStruct((B, n, lanes_total), jnp.uint32)
                for _ in range(k)
            ),
            in_specs=in_specs,
            out_specs=tuple(
                pl.BlockSpec((1, n, LANES), lambda b, j: (b, 0, j),
                             memory_space=pltpu.VMEM)
                for _ in range(k)
            ),
            interpret=interpret,
            **extra,
        )(*args)

    # jit wrapper matters even in interpret mode (eager interpret outputs
    # hang on host transfer — see CLAUDE.md / ntt_kernel.py)
    return jax.jit(call)


def max_tile(field) -> int:
    return MAX_TILE.get(field.n, 1024)


def fits(field, n: int, batch: int) -> bool:
    """Kernel-eligibility: one full tile in VMEM, at least one lane block."""
    return 128 <= n <= max_tile(field) and batch >= 1


def ntt_last_axis(field, a, inverse: bool, interpret: bool = None):
    """NTT along the LAST axis of a limb tuple (each plane (..., n)) via the
    fused kernel: move the transform axis to sublanes, bit-reverse rows with
    one static XLA take, run every stage in VMEM, move back.  No 1/n scale
    (LimbField.ntt applies it when asked).  Semantics == LimbField.ntt(...,
    scale=False)."""
    import jax.numpy as jnp

    if interpret is None:
        interpret = INTERPRET
    shape = a[0].shape
    n = shape[-1]
    batch = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    pad = (-batch) % LANES
    tw = _per_position_twiddles(field.NAME, n, inverse)
    rev = ntt_mod._bit_rev_perm(n)
    # (..., n) -> (n, batch) [-> pad lanes] -> (1, n, lanes)
    planes = []
    for l in a:
        x = l.reshape(batch, n).T
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((n, pad), dtype=jnp.uint32)], axis=1
            )
        planes.append(jnp.take(x, rev, axis=0)[None])
    call = _build_call(field.NAME, 1, n, batch + pad, False, interpret)
    out = call(*[jnp.asarray(t) for t in tw], *planes)
    res = []
    for x in out:
        x = x[0]
        if pad:
            x = x[:, :batch]
        res.append(x.T.reshape(shape))
    return tuple(res)
