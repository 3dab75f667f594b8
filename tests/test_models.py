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


def test_randomized_air_aux_segment():
    """Grand-product permutation check with an auxiliary trace segment.

    Note: the reference's aux-segment transcript only agrees between prover
    and verifier for n=1 (the verifier reseeds the aux commitment per
    instance, the prover once per segment — verifier/src/lib.rs:162-178 vs
    prover/src/lib.rs:296-352), so batched aux proofs are out of contract.
    """
    from starkpack_winterfell_tpu.models.permutation import (
        PermAir,
        PermProver,
        build_perm_trace,
    )

    for ext in (FieldExtension.NONE, FieldExtension.QUADRATIC):
        options = ProofOptions(16, 8, 0, ext, 4, 31)
        traces = [build_perm_trace(3, 64)]
        prover = PermProver(options, Blake3_256)
        pub_inputs = [prover.get_pub_inputs(t) for t in traces]
        proof = prover.prove(1, traces)
        assert verify(PermAir, proof, pub_inputs, Blake3_256)


def test_randomized_air_tampered_main_fails():
    from starkpack_winterfell_tpu.models.permutation import (
        PermAir,
        PermProver,
        build_perm_trace,
    )

    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 31)
    trace = build_perm_trace(3, 64)
    # break the permutation property in the middle of the trace
    trace.set(1, 10, (trace.get(1, 10) + 1))
    prover = PermProver(options, Blake3_256)
    pub_inputs = [prover.get_pub_inputs(trace)]
    try:
        proof = prover.prove(1, [trace])
    except AssertionError:
        return  # prover-side degree assert caught the bad trace — fine
    with pytest.raises(VerifierError):
        verify(PermAir, proof, pub_inputs, Blake3_256)


def test_merkle_auth_path_e2e():
    import numpy as np

    from starkpack_winterfell_tpu.models.merkle import (
        MerklePathAir,
        MerklePathProver,
        build_merkle_path_trace,
        compute_root,
    )

    rng = np.random.default_rng(40)
    P = 2**64 - 2**32 + 1
    leaf = [int(x) for x in rng.integers(0, P, size=4, dtype=np.uint64)]
    depth = 4  # 32-row trace
    siblings = [
        [int(x) for x in rng.integers(0, P, size=4, dtype=np.uint64)]
        for _ in range(depth)
    ]
    index = 0b1010

    trace = build_merkle_path_trace(leaf, siblings, index)
    want_root = compute_root(leaf, siblings, index)
    got_root = [trace.get(4 + i, trace.length - 1) for i in range(4)]
    assert got_root == want_root, "trace does not reproduce the Merkle root"

    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 31)
    prover = MerklePathProver(options, Blake3_256)
    pub_inputs = [prover.get_pub_inputs(trace)]
    proof = prover.prove(1, [trace])
    assert verify(MerklePathAir, proof, pub_inputs, Blake3_256)

    # wrong root must fail
    from starkpack_winterfell_tpu.models.merkle import MerklePathInputs

    bad = [MerklePathInputs([(want_root[0] + 1) % P] + want_root[1:])]
    with pytest.raises(VerifierError):
        verify(MerklePathAir, proof, bad, Blake3_256)


def test_lamport_signature_e2e():
    from starkpack_winterfell_tpu import Sha3_256
    from starkpack_winterfell_tpu.models.lamport import (
        LamportAir,
        LamportInputs,
        LamportProver,
        build_lamport_trace,
        keygen,
        sign,
    )

    k = 7  # message bits -> 64-row trace
    secrets, pk_hashes, pub_key = keygen(k, seed=5)
    message = 0b1011001
    sig = sign(secrets, pk_hashes, message, k)
    trace = build_lamport_trace(message, sig, k)

    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 31)
    # SHA3 transcript per the reference's Lamport config
    prover = LamportProver(options, Sha3_256)
    pub_inputs = [prover.get_pub_inputs(trace)]
    assert pub_inputs[0].message == message
    assert pub_inputs[0].pub_key == pub_key, "trace PK disagrees with host hasher"
    proof = prover.prove(1, [trace])
    assert verify(LamportAir, proof, pub_inputs, Sha3_256)

    # verifying against a different message must fail
    bad = [LamportInputs((message ^ 1), pub_key)]
    with pytest.raises(VerifierError):
        verify(LamportAir, proof, bad, Sha3_256)


def test_lamport_forged_signature_fails():
    from starkpack_winterfell_tpu import Blake3_256 as H
    from starkpack_winterfell_tpu.models.lamport import (
        LamportAir,
        LamportProver,
        build_lamport_trace,
        keygen,
        sign,
    )

    k = 7
    secrets, pk_hashes, pub_key = keygen(k, seed=6)
    message = 0b0110011
    sig = sign(secrets, pk_hashes, message, k)
    # forge: flip one message bit but keep the (now wrong) revealed secret
    forged = message ^ (1 << 3)
    trace = build_lamport_trace(forged, sig, k)
    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 31)
    prover = LamportProver(options, H)
    pub_inputs = [prover.get_pub_inputs(trace)]
    # the trace's final B digest no longer equals the real public key
    assert pub_inputs[0].pub_key != pub_key


def test_trace_validate():
    """TraceTable.validate — the reference's debug-mode full trace check
    (prover/src/trace/mod.rs:101-223)."""
    import pytest as _pytest

    from starkpack_winterfell_tpu.air.options import FieldExtension, ProofOptions
    from starkpack_winterfell_tpu.models.do_work import (
        DoWorkAir,
        PublicInputs,
        build_do_work_trace,
    )

    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 7)
    trace = build_do_work_trace(3, 32)
    air = DoWorkAir(
        trace.get_info(), PublicInputs(3, trace.get(0, trace.length - 1)), options
    )
    assert trace.validate(air)

    # corrupt one cell mid-trace: transition constraint must fire
    trace.set(0, 7, trace.get(0, 7) + 1)
    with _pytest.raises(AssertionError, match="transition constraint"):
        trace.validate(air)

    # corrupt the asserted boundary cell: assertion must fire
    trace2 = build_do_work_trace(3, 32)
    trace2.set(0, 0, 999)
    air2 = DoWorkAir(
        trace2.get_info(), PublicInputs(3, trace2.get(0, trace2.length - 1)), options
    )
    with _pytest.raises(AssertionError, match="assertion"):
        trace2.validate(air2)

    # multi-field: f128 fib trace validates
    from starkpack_winterfell_tpu.models.fib_multifield import get_fib_family

    air_class, build_trace, prover_class, _ = get_fib_family("f128")
    t = build_trace(32)
    prover = prover_class(options, None)
    a = air_class(t.get_info(), prover.get_pub_inputs(t), options)
    assert t.validate(a)


def test_rescue_chain_scan_builder_matches_host():
    """The lax.scan device trace builder (rescue_chain.py) is bit-identical
    to the python reference loop."""
    import numpy as np

    from starkpack_winterfell_tpu.models.rescue_chain import build_chain_trace

    th = build_chain_trace([3, 1, 4, 1, 5, 9, 2, 6], 64, device=False)
    td = build_chain_trace([3, 1, 4, 1, 5, 9, 2, 6], 64, device=True)
    assert np.array_equal(th._columns, td._columns)


def test_rescue_chain_device_expander_bit_exact():
    """The device trace expander (upload 1/8th, re-derive rounds on device)
    must reproduce the host-built trace planes bit-for-bit."""
    import numpy as np

    from starkpack_winterfell_tpu.models.rescue_chain import build_chain_trace

    trace = build_chain_trace([7] * 8, (1 << 14) // 8)
    built = trace.device_planes()
    assert built is not None, "expander not attached at length 2^14"
    host = trace.main_segment_limbs()[0]
    np.testing.assert_array_equal(np.asarray(built[0]), np.asarray(host[0]))
    np.testing.assert_array_equal(np.asarray(built[1]), np.asarray(host[1]))
