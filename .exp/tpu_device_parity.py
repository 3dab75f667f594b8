"""TPU evidence run for the CPU-skip-marked Rescue128 device-parity tests.

tests/test_lamport128_agg.py (and the plain lamport128 device test) skip on
XLA:CPU because of the known algebraic-simplifier runaway compiling the f128
Rescue AIR constraint kernel; this script runs the SAME byte-parity asserts
on the real TPU backend and prints a PASS line per config.  Commit the
output (.exp/tpu_device_parity_rN.log) as the repo artifact.
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

faulthandler.dump_traceback_later(5200, exit=True)

import jax

from starkpack_winterfell_tpu import verify
from starkpack_winterfell_tpu.air.options import FieldExtension, ProofOptions
from starkpack_winterfell_tpu.crypto.hashers import Sha3_256

print("backend:", jax.default_backend(), jax.devices(), flush=True)
assert jax.default_backend() != "cpu", "this evidence run must be on TPU"

# -- lamport128_agg: aggregated single-trace, 2 sigs ------------------------
from starkpack_winterfell_tpu.models import lamport128_agg as agg

options = ProofOptions(28, 8, 0, FieldExtension.NONE, 4, 7)
messages, pub_keys, sigs = agg.make_wallet(2, seed=3)
trace = agg.build_lamport128_agg_trace(messages, sigs)
prover = agg.Lamport128AggProver(options, Sha3_256, 2)
pub = prover.get_pub_inputs(trace)

t0 = time.perf_counter()
host_proof = prover.prove(1, [trace])
t1 = time.perf_counter()
dev_proof = prover.prove(1, [trace], device=True)
t2 = time.perf_counter()
assert dev_proof.to_bytes() == host_proof.to_bytes(), "agg device != host!"
assert verify(agg.Lamport128AggAir, dev_proof, [pub], Sha3_256)
print(f"PASS lamport128_agg n=2: device == host bytes "
      f"({len(dev_proof.to_bytes())} B; host {t1-t0:.1f}s, device "
      f"{t2-t1:.1f}s incl. compile)", flush=True)

# -- plain lamport128: one signature per trace ------------------------------
from starkpack_winterfell_tpu.models import lamport128 as lam

k = 15
secrets, pk_hashes, pub_key = lam.keygen(k, seed=5)
msg = 0b101100111000101
sig = lam.sign(secrets, pk_hashes, msg, k)
trace2 = lam.build_lamport128_trace(msg, sig, k)
prover2 = lam.Lamport128Prover(options, Sha3_256)
pub2 = prover2.get_pub_inputs(trace2)

t0 = time.perf_counter()
host2 = prover2.prove(1, [trace2])
t1 = time.perf_counter()
dev2 = prover2.prove(1, [trace2], device=True)
t2 = time.perf_counter()
assert dev2.to_bytes() == host2.to_bytes(), "lamport128 device != host!"
assert verify(lam.Lamport128Air, dev2, [pub2], Sha3_256)
print(f"PASS lamport128 n=1: device == host bytes "
      f"({len(dev2.to_bytes())} B; host {t1-t0:.1f}s, device "
      f"{t2-t1:.1f}s incl. compile)", flush=True)
print("ALL DEVICE-PARITY CHECKS PASSED ON TPU", flush=True)
