"""TPU bench: fib over the limb fields (f62/f128) at 2^18-2^20.

Usage: python .exp/fib_limb_bench.py <field> <log_n>
Proves twice (first = compile), verifies, prints steady seconds.
VERDICT r2 item 6: commit limb-field scaling numbers measured on chip.
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

field = sys.argv[1] if len(sys.argv) > 1 else "f128"
log_n = int(sys.argv[2]) if len(sys.argv) > 2 else 18

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
from starkpack_winterfell_tpu.models.fib_multifield import get_fib_family

# HASH=blake3_192 for the keccak-vs-blake3 control run (VERDICT r3 item 6)
Sha3_256 = get_hasher(os.environ.get("HASH", "sha3_256"))

air_cls, build_trace, prover_cls, _ = get_fib_family(field)
options = ProofOptions(28, 8, 16, FieldExtension.NONE, 4, 31)

t0 = time.perf_counter()
traces = [build_trace(1 << log_n)]
t1 = time.perf_counter()
print(f"{field} fib 2^{log_n}: trace build {t1-t0:.1f}s", flush=True)

prover = prover_cls(options, Sha3_256)
t2 = time.perf_counter()
proof = prover.prove(1, traces, device=True)
t3 = time.perf_counter()
print(f"prove #1 (compile) {t3-t2:.1f}s", flush=True)

t4 = time.perf_counter()
proof = prover.prove(1, traces, device=True)
t5 = time.perf_counter()
print(f"prove #2 (steady)  {t5-t4:.2f}s  proof {len(proof.to_bytes())/1024:.1f} KB",
      flush=True)
pub = [prover.get_pub_inputs(t) for t in traces]
t6 = time.perf_counter()
ok = verify(air_cls, proof, pub, Sha3_256)
print(f"verify {time.perf_counter()-t6:.3f}s ok={ok}", flush=True)
