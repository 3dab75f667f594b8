"""Canonical-bucket rescue chain (models/rescue_chain_pad.py): one
executable shape per bucket serving every n_live <= bucket, exact-length
statements (VERDICT r4 item 2)."""

import pytest

from starkpack_winterfell_tpu import (
    Blake3_256,
    FieldExtension,
    ProofOptions,
    VerifierError,
    verify,
)
from starkpack_winterfell_tpu.models.rescue_chain import (
    RescueChainProver,
    build_chain_trace,
)
from starkpack_winterfell_tpu.models.rescue_chain_pad import (
    PaddedChainInputs,
    RescueChainPadAir,
    RescueChainPadProver,
    build_padded_chain_trace,
)

OPTS = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 7)
SEED = [7] * 8
BUCKET = 16  # permutations -> 128-row trace


def _prove(n_live):
    trace = build_padded_chain_trace(SEED, n_live, BUCKET)
    prover = RescueChainPadProver(OPTS, Blake3_256, n_live)
    proof = prover.prove(1, [trace])
    return proof, prover.get_pub_inputs(trace)


@pytest.mark.parametrize("n_live", [3, 8, 16])
def test_padded_chain_prove_verify(n_live):
    proof, pub = _prove(n_live)
    assert verify(RescueChainPadAir, proof, [pub], Blake3_256)
    # trace shape is bucket-determined: all n_live share it
    assert proof.contexts[0].trace_length == BUCKET * 8


def test_padded_chain_result_matches_exact_chain():
    """The padded statement is the EXACT n_live-length chain: its asserted
    result equals the plain rescue-chain result for the same seed/length."""
    n_live = 4  # plain chain traces must be pow2-length
    _, pub = _prove(n_live)
    plain = build_chain_trace(SEED, n_live)
    plain_prover = RescueChainProver(OPTS, Blake3_256)
    plain_pub = plain_prover.get_pub_inputs(plain)
    assert pub.result == plain_pub.result
    assert pub.seed == plain_pub.seed


def test_padded_chain_wrong_n_live_rejected():
    """n_live is transcript-bound: verifying with a different claimed
    length must fail."""
    proof, pub = _prove(6)
    wrong = PaddedChainInputs(pub.seed, pub.result, 7)
    with pytest.raises(VerifierError):
        verify(RescueChainPadAir, proof, [wrong], Blake3_256)


def test_padded_chain_wrong_result_rejected():
    proof, pub = _prove(6)
    bad = list(pub.result)
    bad[0] ^= 1
    wrong = PaddedChainInputs(pub.seed, bad, 6)
    with pytest.raises(VerifierError):
        verify(RescueChainPadAir, proof, [wrong], Blake3_256)
