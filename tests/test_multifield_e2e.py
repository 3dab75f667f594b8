"""End-to-end StarkPack prove -> serialize -> verify over f62 and f128
through the FieldBackend-generic pipeline (the f64 path is covered by
test_e2e_do_work / test_golden_transcript)."""

import pytest

from starkpack_winterfell_tpu.air.options import FieldExtension, ProofOptions
from starkpack_winterfell_tpu.crypto.hashers import Blake3_256, Sha3_256
from starkpack_winterfell_tpu.models.fib_multifield import get_fib_family
from starkpack_winterfell_tpu.verifier.verifier import verify
from starkpack_winterfell_tpu.verifier.channel import VerifierError


@pytest.mark.parametrize("field,hasher", [
    ("f62", Blake3_256),
    ("f128", Sha3_256),
    ("f64", Blake3_256),
])
def test_fib_prove_verify(field, hasher):
    air_class, build_trace, prover_class, inputs_class = get_fib_family(field)
    options = ProofOptions(28, 8, 16, FieldExtension.NONE, 4, 7)
    n = 2
    traces = [build_trace(64) for _ in range(n)]
    prover = prover_class(options, hasher)
    proof = prover.prove(n, traces)

    # serialization round trip
    data = proof.to_bytes()
    proof2 = proof.from_bytes(data)
    assert proof2.to_bytes() == data

    pub_inputs = [prover.get_pub_inputs(t) for t in traces]
    assert verify(air_class, proof2, pub_inputs, hasher)

    # wrong public input must fail
    bad = [inputs_class((p.result + 1) % air_class(
        traces[0].get_info(), p, options).context.field.P) for p in pub_inputs]
    with pytest.raises(VerifierError):
        verify(air_class, proof2, bad, hasher)


@pytest.mark.parametrize("field", ["f62", "f128"])
def test_fib_proof_tamper_detection(field):
    air_class, build_trace, prover_class, _ = get_fib_family(field)
    options = ProofOptions(28, 8, 0, FieldExtension.NONE, 4, 7)
    traces = [build_trace(32)]
    prover = prover_class(options, Blake3_256)
    proof = prover.prove(1, traces)
    pub_inputs = [prover.get_pub_inputs(t) for t in traces]

    # flip one byte in the FRI-layer query values
    data = bytearray(proof.to_bytes())
    data[len(data) // 2] ^= 0x01
    tampered = proof.from_bytes(bytes(data))
    with pytest.raises(VerifierError):
        verify(air_class, tampered, pub_inputs, Blake3_256)


def test_f128_grinding_and_security_level():
    air_class, build_trace, prover_class, _ = get_fib_family("f128")
    options = ProofOptions(28, 8, 8, FieldExtension.NONE, 4, 7)
    traces = [build_trace(32)]
    prover = prover_class(options, Sha3_256)
    proof = prover.prove(1, traces)
    assert proof.pow_nonce >= 1
    # 128-bit base field: security no longer limited by field size
    assert proof.security_level_conjectured() > 80
    pub_inputs = [prover.get_pub_inputs(t) for t in traces]
    assert verify(air_class, proof, pub_inputs, Sha3_256)


@pytest.mark.parametrize("field,hasher", [
    ("f62", Blake3_256),
    ("f128", Sha3_256),
])
def test_fib_prove_verify_quadratic_extension(field, hasher):
    """Quadratic-extension DEEP/FRI over the limb fields (x^2 = x + 1 for
    both f62 and f128 — f62/mod.rs:321, f128/mod.rs:270)."""
    air_class, build_trace, prover_class, _ = get_fib_family(field)
    options = ProofOptions(16, 8, 0, FieldExtension.QUADRATIC, 4, 7)
    traces = [build_trace(64), build_trace(64)]
    prover = prover_class(options, hasher)
    proof = prover.prove(2, traces)

    data = proof.to_bytes()
    proof2 = proof.from_bytes(data)
    assert proof2.to_bytes() == data

    pub_inputs = [prover.get_pub_inputs(t) for t in traces]
    assert verify(air_class, proof2, pub_inputs, hasher)

    data = bytearray(data)
    data[len(data) // 3] ^= 0x04
    with pytest.raises(VerifierError):
        verify(air_class, proof.from_bytes(bytes(data)), pub_inputs, hasher)
