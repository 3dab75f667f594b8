"""Device (jitted) pipeline vs host pipeline — proofs must be byte-identical
(the moral equivalent of the reference's concurrent==sequential proptest,
SURVEY.md §4)."""

import numpy as np
import pytest

from starkpack_winterfell_tpu import Blake3_256, FieldExtension, ProofOptions, verify
from starkpack_winterfell_tpu.models.do_work import (
    DoWorkAir,
    DoWorkProver,
    build_do_work_trace,
)
from starkpack_winterfell_tpu.models.fibonacci import FibAir, FibProver, build_fib_trace


def test_device_matches_host_do_work():
    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 31)
    traces = [build_do_work_trace(i, 64) for i in range(2)]
    prover = DoWorkProver(options, Blake3_256)
    pub_inputs = [prover.get_pub_inputs(t) for t in traces]

    host_proof = prover.prove(2, [build_do_work_trace(i, 64) for i in range(2)])
    dev_proof = prover.prove(2, traces, device=True)
    assert dev_proof.to_bytes() == host_proof.to_bytes()
    assert verify(DoWorkAir, dev_proof, pub_inputs, Blake3_256)


def test_device_matches_host_quadratic():
    options = ProofOptions(16, 8, 0, FieldExtension.QUADRATIC, 4, 31)
    traces = [build_fib_trace(32)]
    prover = FibProver(options, Blake3_256)
    pub_inputs = [prover.get_pub_inputs(t) for t in traces]
    host_proof = prover.prove(1, [build_fib_trace(32)])
    dev_proof = prover.prove(1, traces, device=True)
    assert dev_proof.to_bytes() == host_proof.to_bytes()
    assert verify(FibAir, dev_proof, pub_inputs, Blake3_256)


def test_device_matches_host_aux_segment():
    """Aux-segment AIR on device=True (routed through the 1-device mesh
    kernels — previously a silent host fallback)."""
    from starkpack_winterfell_tpu.models.permutation import (
        PermAir,
        PermProver,
        build_perm_trace,
    )

    options = ProofOptions(16, 8, 0, FieldExtension.QUADRATIC, 4, 7)
    traces = [build_perm_trace(i + 1, 16) for i in range(2)]
    prover = PermProver(options, Blake3_256)
    host_proof = prover.prove(2, [build_perm_trace(i + 1, 16) for i in range(2)])
    dev_proof = prover.prove(2, traces, device=True)
    assert dev_proof.to_bytes() == host_proof.to_bytes()
    pub_inputs = [prover.get_pub_inputs(t) for t in traces]
    assert verify(PermAir, dev_proof, pub_inputs, Blake3_256)


def test_device_matches_host_f128():
    from starkpack_winterfell_tpu.crypto.hashers import Sha3_256
    from starkpack_winterfell_tpu.models.fib_multifield import get_fib_family

    air_cls, build_trace, prover_cls, _ = get_fib_family("f128")
    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 3)
    traces = [build_trace(16) for _ in range(2)]
    prover = prover_cls(options, Sha3_256)
    host_proof = prover.prove(2, traces)
    dev_proof = prover.prove(2, traces, device=True)
    assert dev_proof.to_bytes() == host_proof.to_bytes()
    pub_inputs = [prover.get_pub_inputs(t) for t in traces]
    assert verify(air_cls, dev_proof, pub_inputs, Sha3_256)


def test_device_matches_host_f62():
    from starkpack_winterfell_tpu.models.fib_multifield import get_fib_family

    air_cls, build_trace, prover_cls, _ = get_fib_family("f62")
    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 3)
    traces = [build_trace(16) for _ in range(2)]
    prover = prover_cls(options, Blake3_256)
    host_proof = prover.prove(2, traces)
    dev_proof = prover.prove(2, traces, device=True)
    assert dev_proof.to_bytes() == host_proof.to_bytes()


def test_device_native_f62_transcript_hasher():
    """f62 + its native Rp62_248 transcript hasher on device=True: the
    jittable limb-permutation words path must reproduce the host proof
    byte for byte (device commits hash with Rescue-Prime in jit)."""
    from starkpack_winterfell_tpu.crypto.rescue62 import Rp62_248
    from starkpack_winterfell_tpu.models.fib_multifield import get_fib_family

    air_cls, build_trace, prover_cls, _ = get_fib_family("f62")
    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 3)
    traces = [build_trace(16)]
    prover = prover_cls(options, Rp62_248)
    host = prover.prove(1, traces)
    dev = prover.prove(1, traces, device=True)
    assert dev.to_bytes() == host.to_bytes()


def test_rp62_words_api_jit_differential():
    """hash_words/merge_words on traced jax arrays == the native numpy
    sponge, for several row widths (absorb-loop chunk boundaries)."""
    import jax
    import jax.numpy as jnp

    from starkpack_winterfell_tpu.crypto.rescue62 import P62, Rp62_248

    rng = np.random.default_rng(5)
    for n_elems in (4, 8, 11, 24):
        vals = rng.integers(0, P62, size=(5, n_elems), dtype=np.uint64)
        words = np.zeros((5, 2 * n_elems), dtype=np.uint32)
        words[:, 0::2] = (vals & 0xFFFFFFFF).astype(np.uint32)
        words[:, 1::2] = (vals >> np.uint64(32)).astype(np.uint32)
        want = Rp62_248.hash_words(words, n_elems * 8)
        got = jax.jit(
            lambda w, n=n_elems: Rp62_248.hash_words(w, n * 8)
        )(jnp.asarray(words))
        np.testing.assert_array_equal(np.asarray(got), want)
    l = np.asarray(want, dtype=np.uint32)
    r = l[::-1].copy()
    want_m = Rp62_248.merge_words(l, r)
    got_m = jax.jit(Rp62_248.merge_words)(jnp.asarray(l), jnp.asarray(r))
    np.testing.assert_array_equal(np.asarray(got_m), want_m)
