"""End-to-end: batched do_work prove -> serialize -> deserialize -> verify.

Mirrors the reference demo (winterfell/src/main.rs:105-159): n traces of the
x <- x^3 + 42 chain aggregated into ONE proof with a shared transcript."""

import pytest

from starkpack_winterfell_tpu import (
    Blake3_256,
    FieldExtension,
    ProofOptions,
    verify,
)
from starkpack_winterfell_tpu.models.do_work import (
    DoWorkAir,
    DoWorkProver,
    PublicInputs,
    build_do_work_trace,
)
from starkpack_winterfell_tpu.verifier import VerifierError


def make_options(ext=FieldExtension.NONE, grinding=0):
    # demo config: 32 queries, blowup 8, folding 8, remainder 31
    return ProofOptions(32, 8, grinding, ext, 8, 31)


def run_cycle(n, trace_length, options):
    traces = [build_do_work_trace(i, trace_length) for i in range(n)]
    prover = DoWorkProver(options, Blake3_256)
    pub_inputs = [prover.get_pub_inputs(t) for t in traces]
    proof = prover.prove(n, traces)
    return proof, pub_inputs


def test_single_trace_roundtrip():
    proof, pub_inputs = run_cycle(1, 64, make_options())
    assert verify(DoWorkAir, proof, pub_inputs, Blake3_256)
    # serialization round trip
    data = proof.to_bytes()
    proof2 = proof.from_bytes(data)
    assert proof2.to_bytes() == data
    assert verify(DoWorkAir, proof2, pub_inputs, Blake3_256)


def test_batched_traces():
    proof, pub_inputs = run_cycle(4, 64, make_options())
    assert verify(DoWorkAir, proof, pub_inputs, Blake3_256)


def test_wrong_inputs_fail():
    proof, pub_inputs = run_cycle(2, 64, make_options())
    bad = [PublicInputs(p.start, (p.result + 1) % (2**64 - 2**32 + 1)) for p in pub_inputs]
    with pytest.raises(VerifierError):
        verify(DoWorkAir, proof, bad, Blake3_256)


def test_tampered_proof_fails():
    proof, pub_inputs = run_cycle(1, 64, make_options())
    data = bytearray(proof.to_bytes())
    data[len(data) // 2] ^= 1
    try:
        proof2 = proof.from_bytes(bytes(data))
    except ValueError:
        return  # parsing itself may fail — also a pass
    with pytest.raises((VerifierError, ValueError)):
        verify(DoWorkAir, proof2, pub_inputs, Blake3_256)


def test_grinding():
    proof, pub_inputs = run_cycle(1, 64, make_options(grinding=8))
    assert proof.pow_nonce > 1
    assert verify(DoWorkAir, proof, pub_inputs, Blake3_256)


def test_quadratic_extension():
    proof, pub_inputs = run_cycle(2, 64, make_options(ext=FieldExtension.QUADRATIC))
    assert verify(DoWorkAir, proof, pub_inputs, Blake3_256)


def test_cubic_extension():
    proof, pub_inputs = run_cycle(1, 64, make_options(ext=FieldExtension.CUBIC))
    assert verify(DoWorkAir, proof, pub_inputs, Blake3_256)
