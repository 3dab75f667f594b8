"""TPU: canonical-bucket rescue family — ONE compile serves 2^10..2^16
(VERDICT r4 item 2 done-criterion).

Compiles the 2^16-step (8192-permutation) bucket once, then proves chains
of 2^10 / 2^12 / 2^14 / 2^16 steps on the warm executable; each length
only re-derives its divisor/periodic tables (host O(ce) + one upload).

Usage: python .exp/pad_family_bench.py [bucket_log=16]
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
    int(os.environ.get("FH_TIMEOUT", "5100")), exit=True
)

from starkpack_winterfell_tpu import Blake3_256, FieldExtension, ProofOptions, verify
from starkpack_winterfell_tpu.models.rescue_chain_pad import (
    RescueChainPadAir,
    RescueChainPadProver,
    build_padded_chain_trace,
)

bucket_log = int(sys.argv[1]) if len(sys.argv) > 1 else 16
bucket = (1 << bucket_log) // 8  # permutations
options = ProofOptions(28, 8, 16, FieldExtension.NONE, 4, 31)

first = True
for log_n in (bucket_log, 10, 12, 14, 16):
    n_live = min((1 << log_n) // 8, bucket)
    t0 = time.perf_counter()
    trace = build_padded_chain_trace([7] * 8, n_live, bucket)
    t1 = time.perf_counter()
    prover = RescueChainPadProver(options, Blake3_256, n_live)
    proof = prover.prove(1, [trace], device=True)
    t2 = time.perf_counter()
    tv = time.perf_counter()
    ok = verify(RescueChainPadAir, proof,
                [prover.get_pub_inputs(trace)], Blake3_256)
    tag = "compile" if first else "warm"
    print(
        f"pad-family bucket 2^{bucket_log}: chain 2^{log_n} steps "
        f"(n_live {n_live})  trace {t1-t0:.1f}s  {tag} prove "
        f"{t2-t1:.2f}s  proof {len(proof.to_bytes())/1024:.1f} KB  "
        f"verify {(time.perf_counter()-tv)*1e3:.0f} ms ok={ok}",
        flush=True,
    )
    first = False
