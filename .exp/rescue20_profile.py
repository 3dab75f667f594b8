"""Per-phase profile of the rescue 2^20 device prove on the TPU.

Runs the bench.py workload with DEBUG phase timers; second (steady) run's
phase breakdown is the optimization map.
"""
import logging
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_cpu_use_fusion_emitters=false")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import faulthandler

faulthandler.dump_traceback_later(3500, exit=True)

logging.basicConfig(
    level=logging.DEBUG,
    format="%(relativeCreated)8.0f ms %(name)s: %(message)s",
)
for noisy in ("jax", "jax._src"):
    logging.getLogger(noisy).setLevel(logging.WARNING)

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

LOG_N = int(os.environ.get("LOG_N", "20"))
options = ProofOptions(28, 8, 16, FieldExtension.NONE, 4, 31)
traces = [build_chain_trace([7] * 8, (1 << LOG_N) // 8)]
prover = RescueChainProver(options, Blake3_256)

t0 = time.perf_counter()
proof = prover.prove(1, traces, device=True)
print(f"== first prove (incl. compile): {time.perf_counter()-t0:.1f} s",
      flush=True)
print("== steady-state run with phase timers:", flush=True)
t0 = time.perf_counter()
proof = prover.prove(1, traces, device=True)
print(f"== steady prove: {time.perf_counter()-t0:.2f} s", flush=True)
assert verify(RescueChainAir, proof,
              [prover.get_pub_inputs(t) for t in traces], Blake3_256)
print("verified ok", flush=True)
