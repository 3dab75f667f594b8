"""TPU A/B: MXU int8-matmul NTT tiles vs the Pallas/XLA radix-2 tiles.

Measures the f128 interpolate+LDE (the Lamport hot path) and the f62 one,
steady-state, with ops.mxu_ntt.ENABLED = False then True.  Run on the real
chip; flip mxu_ntt.ENABLED defaults based on the result.
"""
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_cpu_use_fusion_emitters=false")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import faulthandler

faulthandler.dump_traceback_later(3500, exit=True)

import jax
import numpy as np

from starkpack_winterfell_tpu.ops import limb_field as lf
from starkpack_winterfell_tpu.ops import mxu_ntt

BLOWUP = 8


def run_case(field, log_n, width, enabled, iters=4):
    mxu_ntt.ENABLED = enabled
    n = 1 << log_n
    rng = np.random.default_rng(0)
    # random canonical elements: full-range low limbs, top limb < 2^29
    # (value < 2^(32*(n-1)+29) < P for both f62 and f128)
    planes = [rng.integers(0, 1 << 32, size=(width, n), dtype=np.uint64)
              for _ in range(field.n - 1)]
    planes.append(rng.integers(0, 1 << 29, size=(width, n), dtype=np.uint64))
    a = tuple(jax.device_put(p.astype(np.uint32)) for p in planes)
    g = field.GENERATOR

    def lde(*planes):
        coeffs = field.interpolate_poly_with_offset(planes, g)
        return field.evaluate_poly_with_offset(coeffs, g, BLOWUP)

    fn = jax.jit(lde)
    t0 = time.perf_counter()
    out = fn(*a)
    _ = np.asarray(out[0][..., :2])
    tc = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    _ = np.asarray(out[0][..., :2])
    dt = (time.perf_counter() - t0) / iters
    bf = width * (n * log_n // 2 + n * BLOWUP * log_n // 2)
    print(f"{field.NAME} n=2^{log_n} w={width} mxu={enabled}: "
          f"compile {tc:.1f}s steady {dt*1000:.0f} ms "
          f"({bf/dt/1e9:.2f}e9 bf/s)", flush=True)
    # exactness ON THE CHIP, not just the CPU differentials: a TPU-specific
    # lowering/accumulation bug would silently change proof bytes
    return dt, out


SMOKE = bool(os.environ.get("SMOKE"))
CASES = ((lf.F128, 13, 2),) if SMOKE else ((lf.F128, 16, 8), (lf.F62, 16, 8))
for field, log_n, width in CASES:
    off, out_off = run_case(field, log_n, width, False, iters=1 if SMOKE else 4)
    on, out_on = run_case(field, log_n, width, True, iters=1 if SMOKE else 4)
    import jax.numpy as jnp

    # compare on device: pulling the full LDE over the tunnel is slow
    eq = jax.jit(lambda xs, ys: jnp.all(
        jnp.stack([jnp.all(x == y) for x, y in zip(xs, ys)])))
    assert bool(np.asarray(eq(out_off, out_on))), "MXU != VPU output!"
    print(f"==> {field.NAME}: MXU speedup x{off/on:.2f} (outputs EQUAL)",
          flush=True)
