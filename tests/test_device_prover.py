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


def test_device_host_backed_hasher_falls_back():
    """Rp62_248's words API is host-backed; device=True must transparently
    produce the (byte-identical) host proof instead of crashing in jit."""
    from starkpack_winterfell_tpu.crypto.rescue62 import Rp62_248
    from starkpack_winterfell_tpu.models.fib_multifield import get_fib_family

    air_cls, build_trace, prover_cls, _ = get_fib_family("f62")
    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 3)
    traces = [build_trace(16)]
    prover = prover_cls(options, Rp62_248)
    host = prover.prove(1, traces)
    dev = prover.prove(1, traces, device=True)
    assert dev.to_bytes() == host.to_bytes()
