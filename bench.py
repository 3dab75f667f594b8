"""Benchmark driver — prints ONE JSON line.

Default metric: the reference's own headline benchmark — a Rescue hash-chain
proof over a 2^20-step trace (96-bit parameters: 28 queries, blowup 8,
grinding 16; `/root/reference/README.md:393-403` proves it in 50 s on an
8-core laptop).  We run the full pipeline on the attached TPU chip: native C
trace build, device prove (gather-free four-step Pallas LDE + on-device
constraint eval/DEEP/FRI, byte-identical to the host pipeline), and report
steady-state prove wall-clock.  vs_baseline = reference seconds / ours.

BENCH_WORKLOAD=ntt switches to the hot-kernel microbench (butterflies/s/chip
of the four-step interpolate+LDE, vs ~1e8 butterflies/s for one Rust core);
it is also the automatic fallback if the whole-proof path fails.
"""

import json
import os
import time

# One canonical XLA_FLAGS baseline across every entry point (bench, tests,
# .exp scripts, __graft_entry__): XLA_FLAGS is hashed into the persistent
# compilation-cache key, so a flag mismatch silently re-pays the multi-minute
# remote compile of every proving kernel (measured: same graph, flag vs no
# flag = full recompile).  The flag itself is the XLA:CPU fusion-emitter
# workaround (see CLAUDE.md); it is a no-op for TPU binaries but must still
# match for cache hits.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_cpu_use_fusion_emitters" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_cpu_use_fusion_emitters=false"
    ).strip()

REFERENCE_RESCUE20_S = 50.0  # 8-core CPU, /root/reference/README.md:393-403
BASELINE_BUTTERFLIES_PER_S = 1.0e8


def bench_rescue20():
    import numpy as np

    from starkpack_winterfell_tpu import (
        Blake3_256,
        FieldExtension,
        ProofOptions,
        verify,
    )
    from starkpack_winterfell_tpu.models.rescue_chain import (
        RescueChainAir,
        RescueChainProver,
        build_chain_trace,
    )

    options = ProofOptions(28, 8, 16, FieldExtension.NONE, 4, 31)
    traces = [build_chain_trace([7] * 8, (1 << 20) // 8)]
    prover = RescueChainProver(options, Blake3_256)

    proof = prover.prove(1, traces, device=True)  # compile (one-time)
    t0 = time.perf_counter()
    proof = prover.prove(1, traces, device=True)
    elapsed = time.perf_counter() - t0

    assert verify(
        RescueChainAir, proof, [prover.get_pub_inputs(t) for t in traces],
        Blake3_256,
    )
    return {
        "metric": "rescue_2^20_proof_wall_clock",
        "value": round(elapsed, 2),
        "unit": "s",
        "vs_baseline": round(REFERENCE_RESCUE20_S / elapsed, 2),
    }


def bench_ntt():
    import jax
    import jax.numpy as jnp
    import numpy as np

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

    # butterflies: iNTT (n log n / 2) + forward NTT (L log n / 2) per column
    per_iter = batch * (n * log_n // 2 + L * log_n // 2)
    rate = per_iter * iters / (t1 - t0)
    return {
        "metric": "ntt_butterflies_per_s_per_chip",
        "value": round(rate, -6),
        "unit": "butterflies/s",
        "vs_baseline": round(rate / BASELINE_BUTTERFLIES_PER_S, 1),
    }


def _tpu_reachable(timeout_s: int = 150) -> bool:
    """Probe backend init in a subprocess: the axon tunnel, when down, HANGS
    device enumeration forever (it does not error), which would hang the
    whole bench run."""
    import subprocess
    import sys

    code = (
        "import faulthandler; faulthandler.dump_traceback_later(%d, exit=True)\n"
        "import jax, numpy as np, jax.numpy as jnp\n"
        "print(np.asarray(jnp.arange(4).sum()))\n" % (timeout_s - 5)
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, timeout=timeout_s
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def bench_ntt_cpu_fallback():
    """Tunnel-down fallback: a plain-XLA f64 LDE on the host CPU backend,
    reported under an explicit fallback metric name (NOT a chip number) so
    a dead tunnel yields an honest data point instead of a hung run."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from starkpack_winterfell_tpu.ops import gl64 as gl
    from starkpack_winterfell_tpu.ops import ntt

    log_n, blowup, batch = 16, 8, 10
    n = 1 << log_n

    rng = np.random.default_rng(0)
    x = rng.integers(0, gl.P, size=(batch, n), dtype=np.uint64)
    pair = tuple(jnp.asarray(v) for v in gl.from_u64(x))

    def run(lo, hi):
        polys = ntt.interpolate_poly(((lo, hi),))
        return ntt.evaluate_poly_with_offset(polys, 7, blowup)[0]

    fn = jax.jit(run)
    _ = np.asarray(fn(*pair)[0][0, 0])
    t0 = time.perf_counter()
    out = fn(*pair)
    _ = np.asarray(out[0][0, 0])
    dt = time.perf_counter() - t0
    rate = batch * (n * log_n // 2 + n * blowup * log_n // 2) / dt
    return {
        "metric": "ntt_butterflies_per_s_CPU_FALLBACK_tpu_tunnel_down",
        "value": round(rate, -3),
        "unit": "butterflies/s",
        "vs_baseline": round(rate / BASELINE_BUTTERFLIES_PER_S, 2),
    }


def _wait_for_tpu() -> bool:
    """Retry the tunnel probe for a long window before surrendering to the
    CPU fallback: the tunnel has been observed down for minutes-to-hours and
    a CPU-fallback BENCH artifact is near-worthless (round-2 lesson).
    BENCH_TPU_WAIT_S overrides the window (0 = single probe)."""
    import sys

    deadline = time.monotonic() + float(os.environ.get("BENCH_TPU_WAIT_S", 1800))
    attempt = 0
    while True:
        attempt += 1
        if _tpu_reachable():
            return True
        if time.monotonic() >= deadline:
            return False
        print(
            "bench: tpu tunnel down (probe %d); retrying for %.0f more s"
            % (attempt, deadline - time.monotonic()),
            file=sys.stderr,
            flush=True,
        )
        time.sleep(60)


def main():
    workload = os.environ.get("BENCH_WORKLOAD", "rescue20")
    if not _wait_for_tpu():
        print(json.dumps(bench_ntt_cpu_fallback()))
        return
    if workload == "ntt":
        print(json.dumps(bench_ntt()))
        return
    try:
        print(json.dumps(bench_rescue20()))
    except Exception:
        import traceback

        traceback.print_exc()
        print(json.dumps(bench_ntt()))


if __name__ == "__main__":
    main()
