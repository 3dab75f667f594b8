"""Standalone FRI prove -> serialize -> deserialize -> verify cycles
(mirrors fri/src/prover/tests.rs)."""

import numpy as np
import pytest

from starkpack_winterfell_tpu.crypto.hashers import Blake3_256
from starkpack_winterfell_tpu.crypto.random_coin import RandomCoin
from starkpack_winterfell_tpu.fri import (
    DefaultProverChannel,
    FriOptions,
    FriProof,
    FriProver,
    FriVerifier,
    VerifierChannelFri,
)
from starkpack_winterfell_tpu.math import scalar as fs
from starkpack_winterfell_tpu.ops import gl64 as gl, ntt
from starkpack_winterfell_tpu.utils.serde import ByteWriter, SliceReader

rng = np.random.default_rng(21)


def build_evaluations(trace_length: int, lde_blowup: int):
    """Random poly of degree < trace_length evaluated over the offset LDE
    domain (as in fri/src/prover/tests.rs build_evaluations)."""
    p = rng.integers(0, fs.P, size=trace_length, dtype=np.uint64)
    evals = ntt.evaluate_poly_with_offset((gl.from_u64(p),), fs.GENERATOR, lde_blowup)
    return evals


@pytest.mark.parametrize("folding_factor", [2, 4, 8])
def test_fri_prove_verify(folding_factor):
    trace_length = 256
    lde_blowup = 4
    max_remainder_degree = 7
    options = FriOptions(lde_blowup, folding_factor, max_remainder_degree)
    domain_size = trace_length * lde_blowup
    num_queries = 32

    evaluations = build_evaluations(trace_length, lde_blowup)

    channel = DefaultProverChannel(Blake3_256, domain_size, num_queries)
    prover = FriProver(options, Blake3_256, ext_deg=1)
    prover.build_layers(channel, evaluations)
    positions = channel.draw_query_positions()
    proof = prover.build_proof(positions)

    # queried evaluations at the first layer
    queried = [int(gl.to_u64(evaluations[0])[p]) for p in positions]

    # serialization round trip
    w = ByteWriter()
    proof.write_into(w)
    proof2 = FriProof.read_from(SliceReader(w.to_bytes()))
    w2 = ByteWriter()
    proof2.write_into(w2)
    assert w2.to_bytes() == w.to_bytes()

    # verify
    verifier_coin = RandomCoin(Blake3_256, [])
    vchannel = VerifierChannelFri(
        proof2, channel.layer_commitments(), Blake3_256, domain_size, folding_factor, 1
    )
    verifier = FriVerifier(vchannel, verifier_coin, options, trace_length - 1, 1)
    verifier.verify(vchannel, queried, positions)


def test_fri_rejects_tampered_evaluations():
    trace_length = 128
    lde_blowup = 4
    options = FriOptions(lde_blowup, 4, 7)
    domain_size = trace_length * lde_blowup
    evaluations = build_evaluations(trace_length, lde_blowup)

    channel = DefaultProverChannel(Blake3_256, domain_size, 16)
    prover = FriProver(options, Blake3_256, ext_deg=1)
    prover.build_layers(channel, evaluations)
    positions = channel.draw_query_positions()
    proof = prover.build_proof(positions)

    queried = [int(gl.to_u64(evaluations[0])[p]) for p in positions]
    queried[0] = (queried[0] + 1) % fs.P

    verifier_coin = RandomCoin(Blake3_256, [])
    vchannel = VerifierChannelFri(
        proof, channel.layer_commitments(), Blake3_256, domain_size, 4, 1
    )
    verifier = FriVerifier(vchannel, verifier_coin, options, trace_length - 1, 1)
    from starkpack_winterfell_tpu.fri import FriVerificationError

    with pytest.raises(FriVerificationError):
        verifier.verify(vchannel, queried, positions)


def test_fri_quadratic_extension():
    trace_length = 128
    lde_blowup = 4
    options = FriOptions(lde_blowup, 4, 7)
    domain_size = trace_length * lde_blowup

    p0 = rng.integers(0, fs.P, size=trace_length, dtype=np.uint64)
    p1 = rng.integers(0, fs.P, size=trace_length, dtype=np.uint64)
    evals = ntt.evaluate_poly_with_offset(
        (gl.from_u64(p0), gl.from_u64(p1)), fs.GENERATOR, lde_blowup
    )

    channel = DefaultProverChannel(Blake3_256, domain_size, 16, ext_deg=2)
    prover = FriProver(options, Blake3_256, ext_deg=2)
    prover.build_layers(channel, evals)
    positions = channel.draw_query_positions()
    proof = prover.build_proof(positions)

    queried = [
        (int(gl.to_u64(evals[0])[p]), int(gl.to_u64(evals[1])[p])) for p in positions
    ]
    verifier_coin = RandomCoin(Blake3_256, [])
    vchannel = VerifierChannelFri(
        proof, channel.layer_commitments(), Blake3_256, domain_size, 4, 2
    )
    verifier = FriVerifier(vchannel, verifier_coin, options, trace_length - 1, 2)
    verifier.verify(vchannel, queried, positions)
