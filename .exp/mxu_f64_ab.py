"""TPU A/B: f64 interpolate+LDE — production ntt4 Pallas pipeline vs the
GL64_LIMB four-step tower with MXU int8-digit tile DFTs.

Usage: python .exp/mxu_f64_ab.py [log_n [width]]
Asserts the two paths agree element-for-element on chip before timing.
"""
import os
import sys
import time

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_cpu_use_fusion_emitters" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_cpu_use_fusion_emitters=false"
    ).strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import faulthandler

faulthandler.dump_traceback_later(
    int(os.environ.get("FH_TIMEOUT", "5200")), exit=True
)

import jax
import jax.numpy as jnp
import numpy as np

from starkpack_winterfell_tpu.ops import gl64 as gl
from starkpack_winterfell_tpu.ops import mxu_ntt
from starkpack_winterfell_tpu.ops.limb_field import GL64_LIMB
from starkpack_winterfell_tpu.ops.pallas import ntt4

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 18
W = int(sys.argv[2]) if len(sys.argv) > 2 else 12
BLOWUP = 8
OFFSET = 7
n = 1 << LOG_N
L = n * BLOWUP

rng = np.random.default_rng(0)
x = rng.integers(0, gl.P, size=(W, n), dtype=np.uint64)
pair = tuple(jax.device_put(jnp.asarray(v)) for v in gl.from_u64(x))


def bench(tag, fn, args, iters=4):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = np.asarray(out[0].reshape(-1)[:2])
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    _ = np.asarray(out[0].reshape(-1)[:2])
    dt = (time.perf_counter() - t0) / iters
    bf = W * (n * LOG_N // 2 + L * LOG_N // 2)
    print(f"{tag}: compile {tc:.1f}s steady {dt*1e3:.0f} ms "
          f"({bf/dt/1e9:.1f}e9 bf/s)", flush=True)
    return out, dt


# -- production path: ntt4 fused interpolate+LDE ---------------------------
consts = ntt4.lde_consts(n, L, OFFSET)


def run_ntt4(lo, hi):
    r = ntt4.interpolate_lde(((lo, hi),), BLOWUP, OFFSET, consts=consts)[0]
    return r


out4, dt4 = bench("ntt4 (Pallas DIF/DIT)", jax.jit(run_ntt4), pair)

# -- limb tower with MXU tiles ----------------------------------------------
mxu_ntt.ENABLED = True


def run_mxu(lo, hi):
    coeffs = GL64_LIMB.interpolate_poly((lo, hi))
    return GL64_LIMB.evaluate_poly_with_offset(coeffs, OFFSET, BLOWUP)


outm, dtm = bench("GL64_LIMB four-step + MXU tiles", jax.jit(run_mxu), pair)

eq = jax.jit(lambda a, b: jnp.all(
    jnp.stack([jnp.all(x == y) for x, y in zip(a, b)])))
assert bool(np.asarray(eq(tuple(out4), tuple(outm)))), "MXU path != ntt4!"
print(f"outputs EQUAL; speedup ntt4/mxu = x{dt4/dtm:.2f}", flush=True)
