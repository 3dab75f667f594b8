"""TPU bench: aggregated single-trace Lamport+ (models/lamport128_agg.py).

Usage: python .exp/agg_tpu_bench.py <n_sigs>
Proves twice (first = compile), verifies, prints wallet/build/prove times
and proof size.  Reference table: /root/reference/README.md:417-426
(64 sigs 1.2 s ... 1024 sigs 20.5 s on 8 cores; proof 110-349 KB).
"""
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_cpu_use_fusion_emitters=false")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import faulthandler

faulthandler.dump_traceback_later(
    int(os.environ.get("FH_TIMEOUT", "3500")), exit=True
)

n = int(sys.argv[1]) if len(sys.argv) > 1 else 64

if os.environ.get("PHASES"):
    import logging

    logging.basicConfig(
        level=logging.DEBUG,
        format="%(relativeCreated)8.0f ms %(name)s: %(message)s",
    )
    logging.getLogger("jax").setLevel(logging.WARNING)

from starkpack_winterfell_tpu import verify
from starkpack_winterfell_tpu.air.options import FieldExtension, ProofOptions
from starkpack_winterfell_tpu.crypto.hashers import get_hasher
from starkpack_winterfell_tpu.models import lamport128_agg as agg

# default sha3_256 (historic runs); the reference's "123-bit security"
# Lamport table is f128 + BLAKE3-192 — HASH=blake3_192 for parity runs
Sha3_256 = get_hasher(os.environ.get("HASH", "sha3_256"))

OPTIONS = ProofOptions(28, 8, 0, FieldExtension.NONE, 4, 7)

t0 = time.perf_counter()
messages, pub_keys, sigs = agg.make_wallet(n, seed=1)
t1 = time.perf_counter()
trace = agg.build_lamport128_agg_trace(messages, sigs)
t2 = time.perf_counter()
print(f"n={n}  wallet {t1-t0:.1f}s  trace build {t2-t1:.1f}s  "
      f"trace {trace.length}x{trace.width}", flush=True)

prover = agg.Lamport128AggProver(OPTIONS, Sha3_256, n)
pub = prover.get_pub_inputs(trace)

t3 = time.perf_counter()
proof = prover.prove(1, [trace], device=True)
t4 = time.perf_counter()
print(f"prove #1 (compile) {t4-t3:.1f}s", flush=True)

t5 = time.perf_counter()
proof = prover.prove(1, [trace], device=True)
t6 = time.perf_counter()
pb = proof.to_bytes()
print(f"prove #2 (steady)  {t6-t5:.2f}s   proof {len(pb)/1024:.1f} KB", flush=True)

t7 = time.perf_counter()
ok = verify(agg.Lamport128AggAir, proof, [pub], Sha3_256)
t8 = time.perf_counter()
print(f"verify {t8-t7:.2f}s ok={ok}", flush=True)

# Warm-process canonical-size padding demo (VERDICT r3 item 5): prove a
# SMALLER wallet padded to this bucket in the same process — no recompile.
m = int(os.environ.get("PAD_DEMO", "0"))
if m:
    t9 = time.perf_counter()
    msgs2, pks2, sigs2 = agg.make_wallet(m, seed=2)
    msgs2, pks2, sigs2 = agg.pad_wallet(msgs2, pks2, sigs2, n)
    t10 = time.perf_counter()
    trace2 = agg.build_lamport128_agg_trace(msgs2, sigs2)
    pub2 = prover.get_pub_inputs(trace2)
    t11 = time.perf_counter()
    proof2 = prover.prove(1, [trace2], device=True)
    t12 = time.perf_counter()
    ok2 = verify(agg.Lamport128AggAir, proof2, [pub2], Sha3_256)
    t13 = time.perf_counter()
    print(f"pad-demo n={m}->bucket {n}: wallet+pad {t10-t9:.1f}s  "
          f"trace {t11-t10:.1f}s  warm prove {t12-t11:.2f}s  "
          f"proof {len(proof2.to_bytes())/1024:.1f} KB  "
          f"verify {t13-t12:.2f}s ok={ok2}", flush=True)
