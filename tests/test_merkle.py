"""Merkle tree + batch proof tests (mirrors crypto/src/merkle/tests.rs)."""

import numpy as np
import pytest

from starkpack_winterfell_tpu.crypto.hashers import Blake3_192, Blake3_256
from starkpack_winterfell_tpu.crypto.merkle import (
    BatchMerkleProof,
    MerkleTree,
    verify_batch,
)
from starkpack_winterfell_tpu.utils.serde import SliceReader

rng = np.random.default_rng(11)


def rand_leaves(n):
    return rng.integers(0, 1 << 32, size=(n, 8), dtype=np.uint32)


@pytest.mark.parametrize("hasher", [Blake3_256, Blake3_192])
def test_root_matches_manual(hasher):
    leaves = rand_leaves(4)
    t = MerkleTree.from_leaves(leaves, hasher)
    l = [hasher.digest_to_bytes(x) for x in leaves]
    want = hasher.merge(hasher.merge(l[0], l[1]), hasher.merge(l[2], l[3]))
    assert t.root() == want


@pytest.mark.parametrize("hasher", [Blake3_256, Blake3_192])
@pytest.mark.parametrize("n,idxs", [(8, [0]), (8, [1, 2]), (64, [1, 2, 3, 4, 5, 6]),
                                    (64, [0, 63, 32]), (256, [7, 8, 9, 10, 80, 200])])
def test_batch_prove_verify_roundtrip(hasher, n, idxs):
    leaves = rand_leaves(n)
    t = MerkleTree.from_leaves(leaves, hasher)
    proof = t.prove_batch(idxs)
    assert verify_batch(t.root(), idxs, proof)
    # wrong indexes fail
    bad = [(i + 1) % n for i in idxs]
    if sorted(bad) != sorted(idxs):
        assert not verify_batch(t.root(), bad, proof)
    # serialization round trip
    ser = proof.serialize_nodes()
    proof2 = BatchMerkleProof.deserialize(
        SliceReader(ser), proof.leaves, proof.depth, hasher
    )
    assert verify_batch(t.root(), idxs, proof2)
    assert proof2.serialize_nodes() == ser


def test_tamper_fails():
    leaves = rand_leaves(16)
    t = MerkleTree.from_leaves(leaves, Blake3_256)
    proof = t.prove_batch([3, 12])
    proof.leaves[0] = Blake3_256.hash(b"tamper")
    assert not verify_batch(t.root(), [3, 12], proof)


def test_device_build_matches_host():
    import jax
    import jax.numpy as jnp

    from starkpack_winterfell_tpu.crypto.merkle import build_levels

    leaves = rand_leaves(32)
    f = jax.jit(lambda l: build_levels(l, Blake3_256))
    dev_levels = f(jnp.asarray(leaves))
    host = MerkleTree.from_leaves(leaves, Blake3_256)
    for a, b in zip(dev_levels, host.levels):
        assert np.array_equal(np.asarray(a), b)
