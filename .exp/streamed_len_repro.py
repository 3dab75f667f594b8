"""agg512 repro hunt: streamed-vs-host byte identity at LARGE trace lengths
(the committed test runs at length 32; the device agg512 proof diverges
from host at the main trace root, and 2^19 is the first length the
streamed path ever saw on the TPU outside square four-step splits).

env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python .exp/streamed_len_repro.py [logn ...]
"""
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_cpu_use_fusion_emitters=false")
os.environ["STARKPACK_HBM_BUDGET"] = "1"  # force streaming at any size
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import faulthandler

faulthandler.dump_traceback_later(int(os.environ.get("FH_TIMEOUT", "3600")), exit=True)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

from test_streamed import (  # noqa: E402
    StreamTestAir,
    StreamTestProver,
    build_stream_trace,
)

from starkpack_winterfell_tpu import (  # noqa: E402
    FieldExtension,
    ProofOptions,
    Sha3_256,
    verify,
)
from starkpack_winterfell_tpu.parallel.full_pipeline import prove_mesh  # noqa: E402
from starkpack_winterfell_tpu.parallel.mesh import make_mesh  # noqa: E402

for logn in [int(a) for a in sys.argv[1:]] or [13, 18, 19]:
    L = 1 << logn
    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 3)
    traces = [build_stream_trace(7, 11, L)]
    prover = StreamTestProver(options, Sha3_256)
    t0 = time.perf_counter()
    host_proof = prover.prove(1, traces)
    t1 = time.perf_counter()
    mesh = make_mesh(1)
    streamed_proof = prove_mesh(prover, 1, traces, mesh)
    t2 = time.perf_counter()
    hb, sb = host_proof.to_bytes(), streamed_proof.to_bytes()
    same = hb == sb
    msg = f"2^{logn}: host {t1-t0:.0f}s streamed {t2-t1:.0f}s identical={same}"
    if not same:
        k = next((i for i, (a, b) in enumerate(zip(hb, sb)) if a != b), None)
        msg += f"  first divergent byte {k} (host {len(hb)} B, streamed {len(sb)} B)"
    print(msg, flush=True)
    if not same:
        pub = [prover.get_pub_inputs(t) for t in traces]
        try:
            ok = verify(StreamTestAir, streamed_proof, pub, Sha3_256)
            print("  streamed proof verifies:", ok, flush=True)
        except Exception as e:
            print("  streamed proof verify FAILED:", e, flush=True)
