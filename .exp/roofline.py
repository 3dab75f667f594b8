"""NTT roofline derivation (VERDICT r4 item 6) — CPU-only, no TPU needed.

Counts the actual traced u32 VPU primitives per Goldilocks butterfly (the
ntt4 hot op) by inspecting the jaxpr, then sets the measured butterfly rate
(bench.py BENCH_WORKLOAD=ntt: 9.6e9-1.4e10 bf/s/chip at 2^18-2^20) against
the v5e VPU ceiling.

v5e peak assumptions (public numbers): 197 bf16 TFLOP/s from the MXUs
=> clock ~1.5 GHz (4 MXUs x 128x128 x 2); the VPU is an (8, 128) = 1024-lane
unit, so u32 elementwise peak is ~1.5e12 ops/s single-issue and ~3e12 with
dual-issue.  HBM peak 819 GB/s.

Run: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python .exp/roofline.py
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_cpu_use_fusion_emitters=false")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from starkpack_winterfell_tpu.ops import gl64 as gl

ELEMWISE = {
    "add", "sub", "mul", "and", "or", "xor", "shift_left",
    "shift_right_logical", "shift_right_arithmetic", "lt", "le", "gt", "ge",
    "eq", "ne", "select_n", "convert_element_type", "not",
}


def count_ops(fn, *args):
    jaxpr = jax.make_jaxpr(fn)(*args)
    counts = {}
    total = 0

    def walk(jx):
        nonlocal total
        for eqn in jx.eqns:
            name = eqn.primitive.name
            for sub in (v for v in eqn.params.values() if hasattr(v, "jaxpr")):
                walk(sub.jaxpr)
            if name in ("pjit", "closed_call"):
                continue
            counts[name] = counts.get(name, 0) + 1
            if name in ELEMWISE:
                total += 1

    walk(jaxpr.jaxpr)
    return total, counts


def main():
    x = (jnp.zeros((8,), jnp.uint32), jnp.zeros((8,), jnp.uint32))

    mul_ops, mul_c = count_ops(lambda a, b: gl.mul(a, b), x, x)
    add_ops, _ = count_ops(lambda a, b: gl.add(a, b), x, x)
    sub_ops, _ = count_ops(lambda a, b: gl.sub(a, b), x, x)

    bf_ops = mul_ops + add_ops + sub_ops  # t = b*w; (a+t, a-t)
    print(f"gl64 traced u32 elementwise primitives: mul={mul_ops} "
          f"add={add_ops} sub={sub_ops}")
    print(f"=> DIT butterfly (1 mul + 1 add + 1 sub) ~ {bf_ops} u32 ops "
          f"(pre-XLA-fusion upper bound)")

    clock = 1.5e9
    lanes = 8 * 128
    peak1, peak2 = clock * lanes, 2 * clock * lanes
    for rate in (9.6e9, 1.4e10):
        used = rate * bf_ops
        print(f"measured {rate:.1e} bf/s  -> {used:.2e} u32 ops/s "
              f"= {100*used/peak1:.0f}% of single-issue peak "
              f"({peak1:.1e}), {100*used/peak2:.0f}% of dual-issue "
              f"({peak2:.1e})")

    # HBM sanity: the 2^20x8 LDE moves far less than 819 GB/s
    n, blowup, cols, ms = 1 << 20, 8, 10, 78.0
    bts = cols * (n + n * blowup) * 8 * 2 * 2  # ~2 passes, read+write
    print(f"HBM bound check: 2^20x8 LDE ~{bts/1e9:.1f} GB moved / "
          f"{ms:.0f} ms = {bts/1e9/(ms/1e3):.0f} GB/s of 819 GB/s peak "
          f"-> compute-bound")


if __name__ == "__main__":
    main()
