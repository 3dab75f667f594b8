"""Benchmark driver — prints ONE JSON line.

Measures the core proving kernel on the attached accelerator: batched
Goldilocks NTT (the dominant cost of trace LDE — SURVEY.md §3.1 hot loops),
reported as butterflies/s/chip.

vs_baseline compares against upstream Winterfell's single-core Rust f64 FFT
throughput (~1e8 butterflies/s on a modern x86 core, i.e. ~10ns per radix-2
butterfly — derived from the README's Rescue-chain timings at
/root/reference/README.md:335-403 where FFT work dominates proving).
"""

import json
import time

import numpy as np

BASELINE_BUTTERFLIES_PER_S = 1.0e8


def main():
    import jax

    from starkpack_winterfell_tpu.ops import gl64 as gl, ntt

    # batched column transforms — the shape the prover actually runs
    # (per-column trace LDE of a 32-instance aggregated batch)
    log_n = 13
    n = 1 << log_n
    batch = 128
    iters = 20

    rng = np.random.default_rng(0)
    cols = rng.integers(0, gl.P, size=(batch, n), dtype=np.uint64)
    pair = tuple(jax.device_put(x) for x in gl.from_u64(cols))

    # chain `iters` NTTs inside ONE jitted call so tunnel dispatch latency is
    # paid once; a host readback is the only reliable completion fence on the
    # tunneled backend (block_until_ready returns early)
    def chained(c):
        return jax.lax.fori_loop(
            0, iters, lambda i, x: ntt.ntt_components((x,))[0], c
        )

    fn = jax.jit(chained)
    out = fn(pair)
    _ = np.asarray(out[0][:1, :4])

    t0 = time.perf_counter()
    out = fn(pair)
    _ = np.asarray(out[0][:1, :4])  # force full materialization
    t1 = time.perf_counter()

    per_transform = (n // 2) * log_n
    total_butterflies = per_transform * batch * iters
    value = total_butterflies / (t1 - t0)

    print(
        json.dumps(
            {
                "metric": "ntt_butterflies_per_s_per_chip",
                "value": value,
                "unit": "butterflies/s",
                "vs_baseline": value / BASELINE_BUTTERFLIES_PER_S,
            }
        )
    )


if __name__ == "__main__":
    main()
