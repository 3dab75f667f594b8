"""Keccak/SHA3 device path vs hashlib + e2e with the SHA3 hasher."""

import hashlib

import numpy as np

from starkpack_winterfell_tpu.ops.keccak import sha3_256_words, sha3_merge_words

rng = np.random.default_rng(71)


def test_words_vs_hashlib():
    for nwords in [2, 16, 20, 34, 40, 64]:
        rows = rng.integers(0, 1 << 32, size=(3, nwords), dtype=np.uint32)
        got = sha3_256_words(rows, nwords * 4)
        for r in range(3):
            data = b"".join(int(w).to_bytes(4, "little") for w in rows[r])
            want = hashlib.sha3_256(data).digest()
            gb = b"".join(int(w).to_bytes(4, "little") for w in got[r])
            assert gb == want


def test_jax_matches_numpy():
    import jax
    import jax.numpy as jnp

    rows = rng.integers(0, 1 << 32, size=(4, 20), dtype=np.uint32)
    f = jax.jit(lambda w: sha3_256_words(w, 80))
    got = np.asarray(f(jnp.asarray(rows)))
    want = sha3_256_words(rows, 80)
    assert np.array_equal(got, want)


def test_e2e_with_sha3():
    from starkpack_winterfell_tpu import (
        FieldExtension,
        ProofOptions,
        Sha3_256,
        verify,
    )
    from starkpack_winterfell_tpu.models.do_work import (
        DoWorkAir,
        DoWorkProver,
        build_do_work_trace,
    )

    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 31)
    traces = [build_do_work_trace(3, 64) for _ in range(2)]
    prover = DoWorkProver(options, Sha3_256)
    pub_inputs = [prover.get_pub_inputs(t) for t in traces]
    proof = prover.prove(2, traces)
    assert verify(DoWorkAir, proof, pub_inputs, Sha3_256)
