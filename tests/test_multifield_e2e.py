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


def test_fib_f62_with_rp62_transcript():
    """f62 config with its native algebraic hasher Rp62_248 (31-byte
    digests, rate-first legacy layout — rp62_248/mod.rs:90-230)."""
    from starkpack_winterfell_tpu.crypto.rescue62 import (
        Rp62_248, digest_from_bytes31, digest_to_bytes31,
    )

    # digest pack/unpack round trip
    vals = [0x3ABCDEF012345678 % ((1 << 62) - 1), 1, (1 << 62) - 5, 42]
    assert digest_from_bytes31(digest_to_bytes31(vals)) == vals

    # merge/merge_with_int structural checks
    d1 = Rp62_248.hash_elements([1, 2, 3])
    d2 = Rp62_248.hash_elements([4, 5])
    assert len(d1) == 31
    assert Rp62_248.merge(d1, d2) != Rp62_248.merge(d2, d1)
    assert Rp62_248.merge_with_int(d1, 7) != Rp62_248.merge_with_int(d1, 8)
    # value overflow branch: tag 6 vs tag 5
    big = (1 << 63) + 12345
    assert Rp62_248.merge_with_int(d1, big) != Rp62_248.merge_with_int(d1, big % ((1 << 62) - 111 * (1 << 39) + 1))
    # byte hash: trailing-zero sensitivity via padding + count tag
    assert Rp62_248.hash(b"abc") != Rp62_248.hash(b"abc\x00")

    air_class, build_trace, prover_class, _ = get_fib_family("f62")
    options = ProofOptions(16, 8, 4, FieldExtension.NONE, 4, 7)
    traces = [build_trace(32)]
    prover = prover_class(options, Rp62_248)
    proof = prover.prove(1, traces)
    pub_inputs = [prover.get_pub_inputs(t) for t in traces]
    assert verify(air_class, proof, pub_inputs, Rp62_248)

    data = bytearray(proof.to_bytes())
    data[len(data) // 2] ^= 0x10
    with pytest.raises(VerifierError):
        verify(air_class, proof.from_bytes(bytes(data)), pub_inputs, Rp62_248)


def test_fib_f62_cubic_extension():
    """Cubic-extension DEEP/FRI over f62 (x^3 = -2x - 2, f62/mod.rs:345);
    f128 has no cubic extension (f128/mod.rs:295-298) and raises."""
    air_class, build_trace, prover_class, _ = get_fib_family("f62")
    options = ProofOptions(16, 8, 0, FieldExtension.CUBIC, 4, 7)
    traces = [build_trace(32), build_trace(32)]
    prover = prover_class(options, Blake3_256)
    proof = prover.prove(2, traces)
    data = proof.to_bytes()
    proof2 = proof.from_bytes(data)
    assert proof2.to_bytes() == data
    pub_inputs = [prover.get_pub_inputs(t) for t in traces]
    assert verify(air_class, proof2, pub_inputs, Blake3_256)

    air128, build128, prover128, _ = get_fib_family("f128")
    with pytest.raises((AssertionError, ValueError)):
        prover128(options, Sha3_256).prove(1, [build128(32)])
