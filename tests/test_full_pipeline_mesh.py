"""Multi-chip FULL proving step on a virtual 8-device mesh: byte-identical
to the host pipeline."""

import numpy as np

from starkpack_winterfell_tpu.air.options import FieldExtension, ProofOptions
from starkpack_winterfell_tpu.crypto.hashers import Blake3_256
from starkpack_winterfell_tpu.models.do_work import (
    DoWorkAir,
    DoWorkProver,
    build_do_work_trace,
)
from starkpack_winterfell_tpu.parallel.full_pipeline import prove_mesh
from starkpack_winterfell_tpu.parallel.mesh import make_mesh
from starkpack_winterfell_tpu.verifier.verifier import verify


def test_prove_mesh_byte_identical_and_verifies():
    import jax

    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 7)
    n = 8
    traces = [build_do_work_trace(i + 1, 16) for i in range(n)]
    prover = DoWorkProver(options, Blake3_256)

    host_proof = prover.prove(n, traces)
    mesh_proof = prove_mesh(prover, n, traces, mesh)
    assert mesh_proof.to_bytes() == host_proof.to_bytes()

    pub_inputs = [prover.get_pub_inputs(t) for t in traces]
    assert verify(DoWorkAir, mesh_proof, pub_inputs, Blake3_256)


def test_prove_mesh_quadratic_extension():
    import jax

    mesh = make_mesh(8)
    options = ProofOptions(16, 8, 0, FieldExtension.QUADRATIC, 4, 7)
    n = 8
    traces = [build_do_work_trace(i + 5, 16) for i in range(n)]
    prover = DoWorkProver(options, Blake3_256)
    host_proof = prover.prove(n, traces)
    mesh_proof = prove_mesh(prover, n, traces, mesh)
    assert mesh_proof.to_bytes() == host_proof.to_bytes()
