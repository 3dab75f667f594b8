"""TPU validation: fused Pallas constraint kernel (ops/pallas/cons_kernel)
vs the XLA constraint path, small configs, real Mosaic compile.

Proves each config twice on device — STARKPACK_PCONS=0-style disabled vs
enabled — and asserts byte-identical proofs, then prints steady timings of
the constraint-bearing prove so the kernel's win is visible even at small
sizes.  Run BEFORE the big queued jobs depend on the kernel.
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

from starkpack_winterfell_tpu import verify
from starkpack_winterfell_tpu.air.options import FieldExtension, ProofOptions
from starkpack_winterfell_tpu.crypto.hashers import Blake3_256, Sha3_256
from starkpack_winterfell_tpu.ops.pallas import cons_kernel


def timed_prove(prover, n, traces, label):
    t0 = time.perf_counter()
    proof = prover.prove(n, traces, device=True)
    t1 = time.perf_counter()
    proof2 = prover.prove(n, traces, device=True)
    t2 = time.perf_counter()
    print(f"{label}: first {t1-t0:.1f}s steady {t2-t1:.2f}s", flush=True)
    return proof, proof2


def run_fib128():
    from starkpack_winterfell_tpu.models.fib_multifield import get_fib_family

    air_cls, build_trace, prover_cls, _ = get_fib_family("f128")
    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 3)
    traces = [build_trace(1 << 12) for _ in range(2)]
    prover = prover_cls(options, Sha3_256)
    cons_kernel.ENABLED = False
    off, _ = timed_prove(prover, 2, traces, "fib-f128 2^12 XLA")
    cons_kernel.ENABLED = True
    on, _ = timed_prove(prover, 2, traces, "fib-f128 2^12 pcons")
    assert on.to_bytes() == off.to_bytes(), "fib-f128 pcons bytes DIFFER"
    pubs = [prover.get_pub_inputs(t) for t in traces]
    assert verify(air_cls, on, pubs, Sha3_256)
    print("fib-f128 pcons byte-identical ok", flush=True)


def run_rescue64():
    from starkpack_winterfell_tpu.models.rescue_chain import (
        RescueChainProver,
        build_chain_trace,
    )

    options = ProofOptions(28, 8, 0, FieldExtension.NONE, 4, 7)
    traces = [build_chain_trace([i + 1] * 8, 1 << 10) for i in range(2)]
    prover = RescueChainProver(options, Blake3_256)
    cons_kernel.ENABLED = False
    off, _ = timed_prove(prover, 2, traces, "rescue-f64 2^13 XLA")
    cons_kernel.ENABLED = True
    on, _ = timed_prove(prover, 2, traces, "rescue-f64 2^13 pcons")
    assert on.to_bytes() == off.to_bytes(), "rescue-f64 pcons bytes DIFFER"
    print("rescue-f64 pcons byte-identical ok", flush=True)


def run_lamport():
    from starkpack_winterfell_tpu.models import lamport128_agg as agg

    messages, pub_keys, sigs = agg.make_wallet(4, seed=5)
    options = ProofOptions(28, 8, 0, FieldExtension.NONE, 4, 7)
    prover = agg.Lamport128AggProver(options, Blake3_256, 4)
    cons_kernel.ENABLED = False
    trace = agg.build_lamport128_agg_trace(messages, sigs)
    off, _ = timed_prove(prover, 1, [trace], "lamport-agg-4 XLA")
    cons_kernel.ENABLED = True
    trace = agg.build_lamport128_agg_trace(messages, sigs)
    on, _ = timed_prove(prover, 1, [trace], "lamport-agg-4 pcons")
    assert on.to_bytes() == off.to_bytes(), "lamport-agg pcons bytes DIFFER"
    print("lamport-agg pcons byte-identical ok", flush=True)


# the lamport-agg body is the headline kernel family — validate it by
# default; fib/rescue parity follows from the scaling jobs' verify steps
# (a Mosaic/interpret divergence makes the transcript reject).
if os.environ.get("PCONS_ALL"):
    run_fib128()
    run_rescue64()
run_lamport()
print("ALL PCONS PARITY OK", flush=True)
