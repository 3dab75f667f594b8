"""Model-family e2e tests: Fibonacci + aggregated batches."""

import pytest

from starkpack_winterfell_tpu import Blake3_256, FieldExtension, ProofOptions, verify
from starkpack_winterfell_tpu.crypto.rescue import Rp64_256
from starkpack_winterfell_tpu.models.fibonacci import (
    FibAir,
    FibProver,
    build_fib_trace,
)
from starkpack_winterfell_tpu.verifier import VerifierError


def test_fibonacci_e2e():
    options = ProofOptions(32, 8, 0, FieldExtension.NONE, 4, 31)
    traces = [build_fib_trace(64) for _ in range(2)]
    prover = FibProver(options, Blake3_256)
    pub_inputs = [prover.get_pub_inputs(t) for t in traces]
    proof = prover.prove(2, traces)
    assert verify(FibAir, proof, pub_inputs, Blake3_256)


def test_fibonacci_wrong_result_fails():
    options = ProofOptions(32, 8, 0, FieldExtension.NONE, 4, 31)
    traces = [build_fib_trace(64)]
    prover = FibProver(options, Blake3_256)
    pub_inputs = [prover.get_pub_inputs(t) for t in traces]
    proof = prover.prove(1, traces)
    pub_inputs[0].result = (pub_inputs[0].result + 1) % (2**64 - 2**32 + 1)
    with pytest.raises(VerifierError):
        verify(FibAir, proof, pub_inputs, Blake3_256)


def test_fibonacci_with_rescue_hasher():
    """Full pipeline with the arithmetization-friendly hasher."""
    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 31)
    traces = [build_fib_trace(32)]
    prover = FibProver(options, Rp64_256)
    pub_inputs = [prover.get_pub_inputs(t) for t in traces]
    proof = prover.prove(1, traces)
    assert verify(FibAir, proof, pub_inputs, Rp64_256)


def test_rescue_chain_e2e():
    from starkpack_winterfell_tpu.models.rescue_chain import (
        RescueChainAir,
        RescueChainProver,
        build_chain_trace,
    )

    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 31)
    traces = [build_chain_trace([i + 1] * 8, 4) for i in range(2)]  # 32 rows
    prover = RescueChainProver(options, Blake3_256)
    pub_inputs = [prover.get_pub_inputs(t) for t in traces]
    proof = prover.prove(2, traces)
    assert verify(RescueChainAir, proof, pub_inputs, Blake3_256)


def test_rescue_chain_wrong_digest_fails():
    from starkpack_winterfell_tpu.models.rescue_chain import (
        RescueChainAir,
        RescueChainProver,
        build_chain_trace,
    )

    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 31)
    traces = [build_chain_trace([7] * 8, 4)]
    prover = RescueChainProver(options, Blake3_256)
    pub_inputs = [prover.get_pub_inputs(t) for t in traces]
    proof = prover.prove(1, traces)
    pub_inputs[0].result[0] = (pub_inputs[0].result[0] + 1) % (2**64 - 2**32 + 1)
    with pytest.raises(VerifierError):
        verify(RescueChainAir, proof, pub_inputs, Blake3_256)
