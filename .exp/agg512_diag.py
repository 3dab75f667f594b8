"""TPU diagnostic for the agg512 OOD verify failure (round 5).

Proves n=512 twice through the streamed path (compile should hit the
terminal cache from the failed run), checks prove-to-prove byte
determinism, saves the proof + pub inputs for post-mortem, verifies, and
on failure re-verifies the FIRST proof too (separates a nondeterministic
second prove from a deterministic prover/verifier divergence).
"""
import os
import pickle
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_cpu_use_fusion_emitters=false")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import faulthandler

faulthandler.dump_traceback_later(
    int(os.environ.get("FH_TIMEOUT", "8400")), exit=True
)

from starkpack_winterfell_tpu import FieldExtension, ProofOptions, verify
from starkpack_winterfell_tpu.crypto.hashers import get_hasher
from starkpack_winterfell_tpu.models import lamport128_agg as agg

B192 = get_hasher("blake3_192")
OPTIONS = ProofOptions(28, 8, 0, FieldExtension.NONE, 4, 7)
n = int(sys.argv[1]) if len(sys.argv) > 1 else 512

msgs, pks, sigs = agg.make_wallet(n, seed=1)
trace = agg.build_lamport128_agg_trace(msgs, sigs)
prover = agg.Lamport128AggProver(OPTIONS, B192, n)
pub = prover.get_pub_inputs(trace)

t0 = time.perf_counter()
p1 = prover.prove(1, [trace], device=True)
t1 = time.perf_counter()
p2 = prover.prove(1, [trace], device=True)
t2 = time.perf_counter()
b1, b2 = p1.to_bytes(), p2.to_bytes()
print(f"n={n} prove#1 {t1-t0:.0f}s  prove#2 {t2-t1:.1f}s  "
      f"deterministic={b1 == b2}  {len(b2)/1024:.1f} KB", flush=True)
with open(f".exp/queue/agg{n}_diag_proof.pkl", "wb") as f:
    pickle.dump({"proof_bytes": b2, "proof": p2, "pub": pub, "n": n}, f)
try:
    ok2 = verify(agg.Lamport128AggAir, p2, [pub], B192)
    print("verify p2:", ok2, flush=True)
except Exception as e:
    print("verify p2 FAILED:", e, flush=True)
    try:
        ok1 = verify(agg.Lamport128AggAir, p1, [pub], B192)
        print("verify p1:", ok1, flush=True)
    except Exception as e1:
        print("verify p1 FAILED:", e1, flush=True)
