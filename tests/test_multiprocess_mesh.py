"""REAL multi-process mesh validation (VERDICT r3 item 7 / SURVEY §4):
2 processes x 4 virtual CPU devices via jax.distributed.initialize, proving
through prove_mesh over the global 8-device mesh, byte-identical to the
host pipeline.  Proves no collective or host pull assumes single-process
addressability (two such pulls were found and fixed by this test:
full_pipeline.py _replicated).

Gated: spawning two fresh jax processes costs ~2 min; run with
STARKPACK_MULTIPROC_TESTS=1 (a committed run log lives at
.exp/multiproc_run_r4.log)."""

import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, ".exp", "multiproc_worker.py")


@pytest.mark.skipif(
    not os.environ.get("STARKPACK_MULTIPROC_TESTS"),
    reason="spawns 2 jax processes (~2 min); STARKPACK_MULTIPROC_TESTS=1",
)
def test_two_process_mesh_prove_byte_identical():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port)],
            cwd=ROOT, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert "OK: byte-identical to host" in out, out[-4000:]
