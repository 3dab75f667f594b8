"""Clean verifier latency baselines for the three VERDICT r3 item-4 targets:
  do_work 32x1024 <= 8 ms, rescue 2^14 <= 6 ms, lamport-agg 256 <= 20 ms.
Run CPU-only with NO other load: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu.
Proof objects are pickled on first run (proving is the slow part); pass
"rebuild" to regenerate.  Pass a target name as argv to cProfile it."""
import os
import sys
import time
import cProfile
import pstats
import pickle

os.environ.setdefault("XLA_FLAGS", "--xla_cpu_use_fusion_emitters=false")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from starkpack_winterfell_tpu import Blake3_256, FieldExtension, ProofOptions, verify
from starkpack_winterfell_tpu.crypto.hashers import get_hasher

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "verify_prof_r4_proofs.pkl")
B192 = get_hasher("blake3_192")


def build_all():
    from starkpack_winterfell_tpu.models.do_work import (
        DoWorkProver, build_do_work_trace)
    from starkpack_winterfell_tpu.models.rescue_chain import (
        RescueChainProver, build_chain_trace)
    from starkpack_winterfell_tpu.models import lamport128_agg as agg

    out = {}
    opts = ProofOptions(28, 8, 16, FieldExtension.NONE, 4, 31)
    n = 32
    traces = [build_do_work_trace(i + 1, 1024) for i in range(n)]
    prover = DoWorkProver(opts, Blake3_256)
    out["do_work"] = (prover.prove(n, traces),
                      [prover.get_pub_inputs(t) for t in traces])
    print("do_work proof built", flush=True)

    traces = [build_chain_trace([7] * 8, (1 << 14) // 8)]
    prover = RescueChainProver(opts, Blake3_256)
    out["rescue14"] = (prover.prove(1, traces),
                       [prover.get_pub_inputs(t) for t in traces])
    print("rescue14 proof built", flush=True)

    aopts = ProofOptions(28, 8, 0, FieldExtension.NONE, 4, 7)
    msgs, pks, sigs = agg.make_wallet(256, seed=1)
    trace = agg.build_lamport128_agg_trace(msgs, sigs, device_builder=False)
    prover = agg.Lamport128AggProver(aopts, B192, 256)
    out["agg256"] = (prover.prove(1, [trace]),
                     [prover.get_pub_inputs(trace)])
    print("agg256 proof built", flush=True)
    return out


if os.path.exists(CACHE) and "rebuild" not in sys.argv:
    data = pickle.load(open(CACHE, "rb"))
else:
    data = build_all()
    with open(CACHE, "wb") as f:
        pickle.dump(data, f)

from starkpack_winterfell_tpu.models.do_work import DoWorkAir
from starkpack_winterfell_tpu.models.rescue_chain import RescueChainAir
from starkpack_winterfell_tpu.models.lamport128_agg import Lamport128AggAir

TARGETS = [
    ("do_work", DoWorkAir, Blake3_256, 8.0),
    ("rescue14", RescueChainAir, Blake3_256, 6.0),
    ("agg256", Lamport128AggAir, B192, 20.0),
]

for name, air_cls, hasher, tgt in TARGETS:
    proof, pubs = data[name]
    iters = 30
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        ok = verify(air_cls, proof, pubs, hasher)
        ts.append(time.perf_counter() - t0)
        assert ok
    ts.sort()
    print(f"{name}: min {1e3*ts[0]:.2f} ms  median {1e3*ts[len(ts)//2]:.2f} ms"
          f"  (target {tgt} ms)", flush=True)
    if name in sys.argv:
        pr = cProfile.Profile()
        pr.enable()
        for _ in range(iters):
            verify(air_cls, proof, pubs, hasher)
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(32)
