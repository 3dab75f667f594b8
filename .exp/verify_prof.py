import os, sys, time, cProfile, pstats
os.environ.setdefault("XLA_FLAGS", "--xla_cpu_use_fusion_emitters=false")
sys.path.insert(0, "/root/repo")
from starkpack_winterfell_tpu import Blake3_256, FieldExtension, ProofOptions, verify
from starkpack_winterfell_tpu.models.do_work import DoWorkAir, DoWorkProver, build_do_work_trace

options = ProofOptions(28, 8, 16, FieldExtension.NONE, 4, 31)
n = 32
traces = [build_do_work_trace(i + 1, 1024) for i in range(n)]
prover = DoWorkProver(options, Blake3_256)
proof = prover.prove(n, traces)
pub = [prover.get_pub_inputs(t) for t in traces]
for _ in range(3):
    t0 = time.perf_counter()
    ok = verify(DoWorkAir, proof, pub, Blake3_256)
    print(f"verify {1e3*(time.perf_counter()-t0):.1f} ms ok={ok}")
pr = cProfile.Profile(); pr.enable()
for _ in range(10):
    verify(DoWorkAir, proof, pub, Blake3_256)
pr.disable()
pstats.Stats(pr).sort_stats("cumulative").print_stats(22)
