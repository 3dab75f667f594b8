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


def test_lamport128_batched_aggregation():
    """StarkPack batching: n independent signatures -> ONE aggregated proof
    (the reference's Lamport+ aggregate-signature benchmark shape)."""
    k = 7  # 64-row traces
    n = 4
    traces, pubs = [], []
    for s in range(n):
        secrets, pk_hashes, pub_key = lam.keygen(k, seed=100 + s)
        message = (0b1011001 + s) % (1 << k)
        sig = lam.sign(secrets, pk_hashes, message, k)
        traces.append(lam.build_lamport128_trace(message, sig, k))
    options = ProofOptions(24, 8, 0, FieldExtension.NONE, 4, 7)
    prover = lam.Lamport128Prover(options, Sha3_256)
    proof = prover.prove(n, traces)
    pub_inputs = [prover.get_pub_inputs(t) for t in traces]
    assert verify(lam.Lamport128Air, proof, pub_inputs, Sha3_256)

    # aggregated proof must be far smaller than n independent proofs
    single = prover.prove(1, traces[:1])
    assert len(proof.to_bytes()) < n * len(single.to_bytes())

    # swapping two instances' public inputs must fail
    swapped = [pub_inputs[1], pub_inputs[0]] + pub_inputs[2:]
    with pytest.raises(VerifierError):
        verify(lam.Lamport128Air, proof, swapped, Sha3_256)


def test_rescue128_chain_prove_verify():
    """Rescue128 hash chain over f128 (the upstream `rescue` example)."""
    from starkpack_winterfell_tpu.models.rescue128_chain import (
        Rescue128ChainAir,
        Rescue128ChainInputs,
        Rescue128ChainProver,
        build_rescue128_chain_trace,
        chain_digest,
    )

    seed = [42, 43]
    m = 8
    trace = build_rescue128_chain_trace(seed, m)
    want = chain_digest(seed, m)
    last = trace.length - 1
    assert [trace.get(0, last), trace.get(1, last)] == want

    options = ProofOptions(28, 8, 0, FieldExtension.NONE, 4, 7)
    prover = Rescue128ChainProver(options, Sha3_256)
    air = Rescue128ChainAir(
        trace.get_info(), prover.get_pub_inputs(trace), options
    )
    assert trace.validate(air)

    proof = prover.prove(2, [trace, build_rescue128_chain_trace([7, 9], m)])
    pub_inputs = [
        prover.get_pub_inputs(t)
        for t in [trace, build_rescue128_chain_trace([7, 9], m)]
    ]
    assert verify(Rescue128ChainAir, proof, pub_inputs, Sha3_256)

    bad = [Rescue128ChainInputs(pub_inputs[0].seed, [1, 2]), pub_inputs[1]]
    with pytest.raises(VerifierError):
        verify(Rescue128ChainAir, proof, bad, Sha3_256)


def test_merkle128_prove_verify():
    """Merkle auth path over f128/Rescue128 (the upstream merkle example's
    field); trace root must equal the host-folded root, proof verifies, and
    a wrong root is rejected."""
    import random

    from starkpack_winterfell_tpu.models.merkle128 import (
        Merkle128Air,
        Merkle128Inputs,
        Merkle128Prover,
        build_merkle128_trace,
        compute_root128,
    )

    rng = random.Random(11)
    depth = 8
    leaf = [rng.randrange(lam.P), rng.randrange(lam.P)]
    siblings = [[rng.randrange(lam.P), rng.randrange(lam.P)] for _ in range(depth)]
    index = 0b10110010
    trace = build_merkle128_trace(leaf, siblings, index)
    root = compute_root128(leaf, siblings, index)
    last = trace.length - 1
    assert [trace.get(0, last), trace.get(1, last)] == root

    options = ProofOptions(28, 8, 0, FieldExtension.NONE, 4, 7)
    prover = Merkle128Prover(options, Sha3_256)
    air = Merkle128Air(trace.get_info(), prover.get_pub_inputs(trace), options)
    assert trace.validate(air)

    proof = prover.prove(1, [trace])
    pub_inputs = [prover.get_pub_inputs(trace)]
    assert verify(Merkle128Air, proof, pub_inputs, Sha3_256)

    with pytest.raises(VerifierError):
        verify(
            Merkle128Air, proof,
            [Merkle128Inputs([(root[0] + 1) % lam.P, root[1]])], Sha3_256,
        )
