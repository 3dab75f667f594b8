"""Device (jitted) pipeline vs host pipeline — proofs must be byte-identical
(the moral equivalent of the reference's concurrent==sequential proptest,
SURVEY.md §4)."""

import numpy as np
import pytest

from starkpack_winterfell_tpu import Blake3_256, FieldExtension, ProofOptions, verify
from starkpack_winterfell_tpu.models.do_work import (
    DoWorkAir,
    DoWorkProver,
    build_do_work_trace,
)
from starkpack_winterfell_tpu.models.fibonacci import FibAir, FibProver, build_fib_trace


def test_device_matches_host_do_work():
    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 31)
    traces = [build_do_work_trace(i, 64) for i in range(2)]
    prover = DoWorkProver(options, Blake3_256)
    pub_inputs = [prover.get_pub_inputs(t) for t in traces]

    host_proof = prover.prove(2, [build_do_work_trace(i, 64) for i in range(2)])
    dev_proof = prover.prove(2, traces, device=True)
    assert dev_proof.to_bytes() == host_proof.to_bytes()
    assert verify(DoWorkAir, dev_proof, pub_inputs, Blake3_256)


def test_device_matches_host_quadratic():
    options = ProofOptions(16, 8, 0, FieldExtension.QUADRATIC, 4, 31)
    traces = [build_fib_trace(32)]
    prover = FibProver(options, Blake3_256)
    pub_inputs = [prover.get_pub_inputs(t) for t in traces]
    host_proof = prover.prove(1, [build_fib_trace(32)])
    dev_proof = prover.prove(1, traces, device=True)
    assert dev_proof.to_bytes() == host_proof.to_bytes()
    assert verify(FibAir, dev_proof, pub_inputs, Blake3_256)
