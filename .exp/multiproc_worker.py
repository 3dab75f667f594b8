"""Worker for the multi-process mesh test: one of NPROC processes, each
holding 4 virtual CPU devices, proving do_work through prove_mesh over the
GLOBAL 8-device mesh.  Prints the proof hex on success (process 0).

Usage: multiproc_worker.py <process_id> <num_processes> <coordinator_port>
SURVEY.md §4 testing implication: multi-host testable on CPU via
jax.distributed + multiprocess mesh.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=4 "
    "--xla_cpu_use_fusion_emitters=false"
)
os.environ["PALLAS_AXON_POOL_IPS"] = ""  # no remote-TPU plugin
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import faulthandler

faulthandler.dump_traceback_later(420, exit=True)

proc_id = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nproc,
    process_id=proc_id,
)
assert len(jax.devices()) == 4 * nproc, jax.devices()
assert len(jax.local_devices()) == 4

from starkpack_winterfell_tpu.air.options import FieldExtension, ProofOptions
from starkpack_winterfell_tpu.crypto.hashers import Blake3_256
from starkpack_winterfell_tpu.models.do_work import (
    DoWorkProver,
    build_do_work_trace,
)
from starkpack_winterfell_tpu.parallel.full_pipeline import prove_mesh
from starkpack_winterfell_tpu.parallel.mesh import make_mesh

options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 7)
n = 8
traces = [build_do_work_trace(i + 1, 16) for i in range(n)]
prover = DoWorkProver(options, Blake3_256)
mesh = make_mesh(4 * nproc)
proof = prove_mesh(prover, n, traces, mesh)
data = proof.to_bytes()
host = prover.prove(n, traces).to_bytes()
assert data == host, "multi-process mesh proof != host proof"
from starkpack_winterfell_tpu.models.do_work import DoWorkAir
from starkpack_winterfell_tpu.verifier.verifier import verify

assert verify(DoWorkAir, proof,
              [prover.get_pub_inputs(t) for t in traces], Blake3_256)
print(f"proc {proc_id} OK: byte-identical to host + verifies", flush=True)
