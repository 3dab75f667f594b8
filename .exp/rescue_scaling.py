"""TPU: rescue-chain steady prove scaling rows (README table vs
/root/reference/README.md:335-403).

Usage: python .exp/rescue_scaling.py [log_n ...]   (default 16 18)
One process, sequential configs (each pays its own remote compile).
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

sizes = [int(a) for a in sys.argv[1:]] or [16, 18]
# 96-bit config by default; EXT=cube Q=38 is the 128-bit column of the
# reference's table (conjectured security: min(field 64*3-20, 38*3+16)-1
# = 129, capped at the hash's 128 — matches proof/mod.rs:202-225 math)
EXT = {"none": FieldExtension.NONE, "quad": FieldExtension.QUADRATIC,
       "cube": FieldExtension.CUBIC}[os.environ.get("EXT", "none")]
Q = int(os.environ.get("Q", "28"))
GRIND = int(os.environ.get("GRIND", "16"))
options = ProofOptions(Q, 8, GRIND, EXT, 4, 31)
for log_n in sizes:
    t0 = time.perf_counter()
    traces = [build_chain_trace([7] * 8, (1 << log_n) // 8)]
    t1 = time.perf_counter()
    prover = RescueChainProver(options, Blake3_256)
    proof = prover.prove(1, traces, device=True)
    t2 = time.perf_counter()
    proof = prover.prove(1, traces, device=True)
    t3 = time.perf_counter()
    tv = time.perf_counter()
    ok = verify(RescueChainAir, proof,
                [prover.get_pub_inputs(t) for t in traces], Blake3_256)
    print(f"rescue 2^{log_n}: trace {t1-t0:.1f}s  compile {t2-t1:.0f}s  "
          f"steady {t3-t2:.2f}s  proof {len(proof.to_bytes())/1024:.1f} KB  "
          f"verify {(time.perf_counter()-tv)*1e3:.0f} ms ok={ok}  "
          f"sec={proof.security_level_conjectured()}", flush=True)
