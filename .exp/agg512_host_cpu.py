"""CPU host-path prove+verify at n=512 (round-5 agg512 OOD failure isolation).

If this passes, the n=512 failure is specific to the device/streamed path;
if it fails, the bug is in shared AIR/prover/verifier logic at 2^19.
Run: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python .exp/agg512_host_cpu.py
"""
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_cpu_use_fusion_emitters=false")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import faulthandler

faulthandler.dump_traceback_later(int(os.environ.get("FH_TIMEOUT", "5400")), exit=True)

from starkpack_winterfell_tpu import FieldExtension, ProofOptions, verify
from starkpack_winterfell_tpu.crypto.hashers import get_hasher
from starkpack_winterfell_tpu.models import lamport128_agg as agg

B192 = get_hasher("blake3_192")
OPTIONS = ProofOptions(28, 8, 0, FieldExtension.NONE, 4, 7)
n = int(sys.argv[1]) if len(sys.argv) > 1 else 512

t0 = time.perf_counter()
msgs, pks, sigs = agg.make_wallet(n, seed=1)
trace = agg.build_lamport128_agg_trace(msgs, sigs)
prover = agg.Lamport128AggProver(OPTIONS, B192, n)
pub = prover.get_pub_inputs(trace)
t1 = time.perf_counter()
proof = prover.prove(1, [trace])  # host path
t2 = time.perf_counter()
print(f"n={n} wallet+trace {t1-t0:.1f}s  host prove {t2-t1:.1f}s  "
      f"{len(proof.to_bytes())/1024:.1f} KB", flush=True)
import pickle

with open(f".exp/queue/agg{n}_host_proof.pkl", "wb") as f:
    pickle.dump({"proof_bytes": proof.to_bytes(), "pub": pub, "n": n}, f)
try:
    ok = verify(agg.Lamport128AggAir, proof, [pub], B192)
    print("verify:", ok, flush=True)
except Exception as e:
    print("verify FAILED:", e, flush=True)
