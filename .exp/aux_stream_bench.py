"""TPU: 2^20-row aux-segment (randomized) AIR through the coset-streamed
prover (VERDICT r4 item 3 done-criterion: a >=2^20-row aux config proving
on the chip).

Uses the f128 grand-product StreamAux AIR from tests/test_streamed.py with
the HBM budget forced low enough that the streamed path engages (at width
2+1 the one-shot estimate is ~5.6 GB, under the default 10 GB budget).

Usage: python .exp/aux_stream_bench.py [log_n]   (default 20)
"""
import os
import sys
import time

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_cpu_use_fusion_emitters" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_cpu_use_fusion_emitters=false"
    ).strip()
os.environ.setdefault("STARKPACK_HBM_BUDGET", "2000000000")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))
import faulthandler

faulthandler.dump_traceback_later(
    int(os.environ.get("FH_TIMEOUT", "8700")), exit=True
)

if os.environ.get("PHASES"):
    import logging

    logging.basicConfig(
        level=logging.DEBUG,
        format="%(relativeCreated)8.0f ms %(name)s: %(message)s",
    )
    logging.getLogger("jax").setLevel(logging.WARNING)

from test_streamed import StreamAuxAir, StreamAuxProver, build_aux_trace

from starkpack_winterfell_tpu import FieldExtension, ProofOptions, Sha3_256, verify
from starkpack_winterfell_tpu.parallel.full_pipeline import prove_mesh
from starkpack_winterfell_tpu.parallel.mesh import make_mesh

log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
options = ProofOptions(28, 8, 16, FieldExtension.NONE, 4, 31)

t0 = time.perf_counter()
trace = build_aux_trace(7, 1 << log_n)
t1 = time.perf_counter()
prover = StreamAuxProver(options, Sha3_256)
mesh = make_mesh(1)
proof = prove_mesh(prover, 1, [trace], mesh)
t2 = time.perf_counter()
trace = build_aux_trace(7, 1 << log_n)  # aux segment is rebuilt per prove
proof = prove_mesh(prover, 1, [trace], mesh)
t3 = time.perf_counter()
tv = time.perf_counter()
ok = verify(StreamAuxAir, proof, [prover.get_pub_inputs(trace)], Sha3_256)
print(
    f"aux-stream f128 2^{log_n}: trace {t1-t0:.1f}s  compile {t2-t1:.0f}s  "
    f"steady {t3-t2:.2f}s  proof {len(proof.to_bytes())/1024:.1f} KB  "
    f"verify {(time.perf_counter()-tv)*1e3:.0f} ms ok={ok}",
    flush=True,
)
