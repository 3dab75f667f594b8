"""Idle-box verifier latency after the round-5 native scalar port
(native/verify_scalar.c).  Run with NOTHING else on the box (CLAUDE.md:
contention inflates small native calls ~100x):

  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python .exp/verify_idle_r5.py

Uses the pickled proof corpus from .exp/verify_prof_r4.py (rebuilds it if
missing); pass agg1024 to also host-prove the 1024-sig config (~20 min).
"""
import os
import pickle
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_cpu_use_fusion_emitters=false")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from starkpack_winterfell_tpu import Blake3_256, FieldExtension, ProofOptions, verify
from starkpack_winterfell_tpu.crypto.hashers import get_hasher
from starkpack_winterfell_tpu.models import lamport128_agg as agg
from starkpack_winterfell_tpu.models.do_work import DoWorkAir
from starkpack_winterfell_tpu.models.rescue_chain import RescueChainAir

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "verify_prof_r4_proofs.pkl")
B192 = get_hasher("blake3_192")

if not os.path.exists(CACHE):
    os.system(f"{sys.executable} .exp/verify_prof_r4.py rebuild")
data = pickle.load(open(CACHE, "rb"))


def bench(name, air, proof, pubs, hasher, iters=30):
    assert verify(air, proof, pubs, hasher)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        verify(air, proof, pubs, hasher)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{name}: min {ts[0]*1e3:.2f} ms  median {ts[len(ts)//2]*1e3:.2f} ms",
          flush=True)


bench("do_work 32x1024", DoWorkAir, *data["do_work"], Blake3_256)
bench("rescue 2^14", RescueChainAir, *data["rescue14"], Blake3_256)
bench("lamport-agg 256", agg.Lamport128AggAir, *data["agg256"], B192)

if "agg1024" in sys.argv:
    opts = ProofOptions(28, 8, 0, FieldExtension.NONE, 4, 7)
    msgs, pks, sigs = agg.make_wallet(1024, seed=1)
    trace = agg.build_lamport128_agg_trace(msgs, sigs, device_builder=False)
    prover = agg.Lamport128AggProver(opts, B192, 1024)
    t0 = time.perf_counter()
    proof = prover.prove(1, [trace])
    print(f"agg1024 host prove {time.perf_counter()-t0:.0f}s", flush=True)
    bench("lamport-agg 1024", agg.Lamport128AggAir, proof,
          [prover.get_pub_inputs(trace)], B192)
