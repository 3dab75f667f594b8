"""Benchmark driver — prints ONE JSON line.

Measures the prover's hot kernel on the attached accelerator: the
gather-free four-step interpolate+LDE pipeline (ops/pallas/ntt4.py) that
the big-trace device prover (prover/device_big.py) runs for every trace
column — 2^18-point columns, blowup 8, batch 10, i.e. the per-column work
of a 2^18-step proof.  Reported as butterflies/s/chip (iNTT + forward NTT
stages counted).

vs_baseline compares against upstream Winterfell's single-core Rust f64 FFT
throughput (~1e8 butterflies/s on a modern x86 core, i.e. ~10ns per radix-2
butterfly — derived from the README's Rescue-chain timings at
/root/reference/README.md:335-403 where FFT work dominates proving).

Whole-proof wall-clock numbers (fib/rescue 2^20 on TPU vs the reference's
8-core CPU table) are recorded in README.md §Measured.
"""

import json
import time

import numpy as np

BASELINE_BUTTERFLIES_PER_S = 1.0e8


def main():
    import jax
    import jax.numpy as jnp

    from starkpack_winterfell_tpu.ops import gl64 as gl
    from starkpack_winterfell_tpu.ops.pallas import ntt4

    log_n, blowup, batch, iters = 18, 8, 10, 10
    n = 1 << log_n
    L = n * blowup

    consts = ntt4.lde_consts(n, L, 7)
    rng = np.random.default_rng(0)
    x = rng.integers(0, gl.P, size=(batch, n), dtype=np.uint64)
    pair = tuple(jax.device_put(jnp.asarray(v)) for v in gl.from_u64(x))

    # chain iters LDEs inside ONE jitted call so tunnel dispatch latency is
    # paid once; a host readback is the only reliable completion fence on
    # the tunneled backend (block_until_ready returns early)
    def run(lo, hi):
        def body(i, s):
            r = ntt4.interpolate_lde(((s[0], s[1]),), blowup, 7, consts=consts)[0]
            return (r[0][..., :n], r[1][..., :n])  # loop-invariant shapes

        return jax.lax.fori_loop(0, iters, body, (lo, hi))

    fn = jax.jit(run)
    out = fn(*pair)
    _ = np.asarray(out[0].reshape(-1)[:4])

    t0 = time.perf_counter()
    out = fn(*pair)
    _ = np.asarray(out[0].reshape(-1)[:4])
    t1 = time.perf_counter()

    log_L = L.bit_length() - 1
    per_lde = (n // 2) * log_n + (L // 2) * log_L  # iNTT_n + NTT_L
    value = per_lde * batch * iters / (t1 - t0)

    print(
        json.dumps(
            {
                "metric": "lde_butterflies_per_s_per_chip",
                "value": value,
                "unit": "butterflies/s",
                "vs_baseline": value / BASELINE_BUTTERFLIES_PER_S,
            }
        )
    )


if __name__ == "__main__":
    main()
