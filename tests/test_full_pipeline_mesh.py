"""Multi-chip FULL proving step on a virtual 8-device mesh: byte-identical
to the host pipeline."""

import os

import numpy as np
import pytest

from starkpack_winterfell_tpu.air.options import FieldExtension, ProofOptions
from starkpack_winterfell_tpu.crypto.hashers import Blake3_256
from starkpack_winterfell_tpu.models.do_work import (
    DoWorkAir,
    DoWorkProver,
    build_do_work_trace,
)
from starkpack_winterfell_tpu.parallel.full_pipeline import prove_mesh
from starkpack_winterfell_tpu.parallel.mesh import make_mesh
from starkpack_winterfell_tpu.verifier.verifier import verify


def test_prove_mesh_byte_identical_and_verifies():
    import jax

    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 7)
    n = 8
    traces = [build_do_work_trace(i + 1, 16) for i in range(n)]
    prover = DoWorkProver(options, Blake3_256)

    host_proof = prover.prove(n, traces)
    mesh_proof = prove_mesh(prover, n, traces, mesh)
    assert mesh_proof.to_bytes() == host_proof.to_bytes()

    pub_inputs = [prover.get_pub_inputs(t) for t in traces]
    assert verify(DoWorkAir, mesh_proof, pub_inputs, Blake3_256)


def test_prove_mesh_quadratic_extension():
    import jax

    mesh = make_mesh(8)
    options = ProofOptions(16, 8, 0, FieldExtension.QUADRATIC, 4, 7)
    n = 8
    traces = [build_do_work_trace(i + 5, 16) for i in range(n)]
    prover = DoWorkProver(options, Blake3_256)
    host_proof = prover.prove(n, traces)
    mesh_proof = prove_mesh(prover, n, traces, mesh)
    assert mesh_proof.to_bytes() == host_proof.to_bytes()


def test_prove_mesh_aux_segment():
    """Permutation AIR (aux trace segment + aux rand elements + aux
    transition/boundary constraints) through the sharded pipeline."""
    from starkpack_winterfell_tpu.models.permutation import (
        PermAir,
        PermProver,
        build_perm_trace,
    )

    mesh = make_mesh(8)
    options = ProofOptions(16, 8, 0, FieldExtension.QUADRATIC, 4, 7)
    n = 2
    traces = [build_perm_trace(i + 1, 16) for i in range(n)]
    prover = PermProver(options, Blake3_256)
    host_proof = prover.prove(n, traces)
    mesh_proof = prove_mesh(prover, n, traces, mesh)
    assert mesh_proof.to_bytes() == host_proof.to_bytes()
    pub_inputs = [prover.get_pub_inputs(t) for t in traces]
    assert verify(PermAir, mesh_proof, pub_inputs, Blake3_256)


def test_prove_mesh_n_not_divisible():
    """n=3 on an 8-device mesh: instances zero-pad to the mesh size."""
    mesh = make_mesh(8)
    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 7)
    n = 3
    traces = [build_do_work_trace(i + 2, 16) for i in range(n)]
    prover = DoWorkProver(options, Blake3_256)
    host_proof = prover.prove(n, traces)
    mesh_proof = prove_mesh(prover, n, traces, mesh)
    assert mesh_proof.to_bytes() == host_proof.to_bytes()


def test_prove_mesh_f128():
    """Limb-field (f128) instances through the sharded heavy phases +
    generic host tail."""
    from starkpack_winterfell_tpu.crypto.hashers import Sha3_256
    from starkpack_winterfell_tpu.models.fib_multifield import get_fib_family

    air_cls, build_trace, prover_cls, _ = get_fib_family("f128")
    mesh = make_mesh(8)
    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 3)
    n = 2
    traces = [build_trace(16) for _ in range(n)]
    prover = prover_cls(options, Sha3_256)
    host_proof = prover.prove(n, traces)
    mesh_proof = prove_mesh(prover, n, traces, mesh)
    assert mesh_proof.to_bytes() == host_proof.to_bytes()
    pub_inputs = [prover.get_pub_inputs(t) for t in traces]
    assert verify(air_cls, mesh_proof, pub_inputs, Sha3_256)


def test_prove_mesh_f128_four_step_ntt():
    """Trace length past LimbField.MAX_NTT_TILE routes the limb NTTs through
    the four-step tile decomposition inside the sharded kernels — mesh proof
    must stay byte-identical to the host pipeline."""
    from starkpack_winterfell_tpu.crypto.hashers import Sha3_256
    from starkpack_winterfell_tpu.models.fib_multifield import get_fib_family
    from starkpack_winterfell_tpu.ops.limb_field import F128

    air_cls, build_trace, prover_cls, _ = get_fib_family("f128")
    mesh = make_mesh(4)
    options = ProofOptions(8, 8, 0, FieldExtension.NONE, 4, 3)
    old = F128.MAX_NTT_TILE
    F128.MAX_NTT_TILE = 64  # force the four-step path at test-size shapes
    try:
        n = 2
        traces = [build_trace(256) for _ in range(n)]
        prover = prover_cls(options, Sha3_256)
        host_proof = prover.prove(n, traces)
        mesh_proof = prove_mesh(prover, n, traces, mesh)
    finally:
        F128.MAX_NTT_TILE = old
    assert mesh_proof.to_bytes() == host_proof.to_bytes()
    pub_inputs = [prover.get_pub_inputs(t) for t in traces]
    assert verify(air_cls, mesh_proof, pub_inputs, Sha3_256)


@pytest.mark.skipif(
    not os.environ.get("STARKPACK_SLOW_TESTS"),
    reason="XLA:CPU compiles the limb device-OOD/DEEP kernels in ~12 min "
    "(verified byte-identical; run with STARKPACK_SLOW_TESTS=1, or on TPU "
    "where the remote compiler handles it)",
)
def test_prove_mesh_f128_device_tail():
    """Trace length >= 4096 activates the device OOD/DEEP/composition-iNTT
    tail for limb fields — must stay byte-identical to the host pipeline."""
    from starkpack_winterfell_tpu.crypto.hashers import Sha3_256
    from starkpack_winterfell_tpu.models.fib_multifield import get_fib_family

    air_cls, build_trace, prover_cls, _ = get_fib_family("f128")
    mesh = make_mesh(4)
    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 3)
    n = 3  # n_pad = 4: padded instances must contribute nothing to the tail
    traces = [build_trace(4096) for _ in range(n)]
    prover = prover_cls(options, Sha3_256)
    host_proof = prover.prove(n, traces)
    mesh_proof = prove_mesh(prover, n, traces, mesh)
    assert mesh_proof.to_bytes() == host_proof.to_bytes()
    pub_inputs = [prover.get_pub_inputs(t) for t in traces]
    assert verify(air_cls, mesh_proof, pub_inputs, Sha3_256)


def test_prove_mesh_f62():
    from starkpack_winterfell_tpu.models.fib_multifield import get_fib_family

    air_cls, build_trace, prover_cls, _ = get_fib_family("f62")
    mesh = make_mesh(8)
    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 3)
    n = 2
    traces = [build_trace(16) for _ in range(n)]
    prover = prover_cls(options, Blake3_256)
    host_proof = prover.prove(n, traces)
    mesh_proof = prove_mesh(prover, n, traces, mesh)
    assert mesh_proof.to_bytes() == host_proof.to_bytes()


def test_prove_mesh_device_built_planes():
    """TraceTable.set_device_builder on a limb-field trace: prove_mesh must
    consume the device-built planes (instead of uploading host columns) and
    stay byte-identical to the host pipeline."""
    import jax.numpy as jnp

    from starkpack_winterfell_tpu.crypto.hashers import Sha3_256
    from starkpack_winterfell_tpu.models.fib_multifield import get_fib_family
    from starkpack_winterfell_tpu.ops.backend import get_backend

    air_cls, build_trace, prover_cls, _ = get_fib_family("f128")
    mesh = make_mesh(1)
    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 3)
    traces = [build_trace(16)]
    B = get_backend("f128")
    host_planes = traces[0].main_segment_limbs(B)[0]
    traces[0].set_device_builder(
        lambda: tuple(jnp.asarray(l) for l in host_planes)
    )
    prover = prover_cls(options, Sha3_256)
    host_proof = prover.prove(1, [build_trace(16)])
    mesh_proof = prove_mesh(prover, 1, traces, mesh)
    assert mesh_proof.to_bytes() == host_proof.to_bytes()


@pytest.mark.skipif(
    not os.environ.get("STARKPACK_SLOW_TESTS"),
    reason="XLA:CPU compiles the Rescue128 device trace-builder kernel in "
    "~3 min; run with STARKPACK_SLOW_TESTS=1 (TPU parity is covered by the "
    "round-4 queue evidence)",
)
def test_lamport_agg_device_builder_bit_identical():
    """The on-device agg trace builder (signature elements up, Rescue128
    sponge re-run on device) reproduces the host/native planes bit-for-bit."""
    import numpy as np

    from starkpack_winterfell_tpu.models import lamport128_agg as agg
    from starkpack_winterfell_tpu.ops.backend import get_backend

    n, k = 2, 3
    messages, pub_keys, sigs = agg.make_wallet(n, k, seed=5)
    trace = agg.build_lamport128_agg_trace(messages, sigs, k)
    B = get_backend("f128")
    host = trace.main_segment_limbs(B)[0]
    dev = trace.device_planes()
    assert dev is not None
    for h, d in zip(host, dev):
        assert (np.asarray(h) == np.asarray(d)).all()


def test_prove_mesh_sequence_assertions():
    """Sequence assertions route through prove_mesh's device seq-eval
    kernel (coefficients uploaded, (n, ce) table evaluated on device at
    offset off*g_ce^-step_offset) — must stay byte-identical to the host
    pipeline's evaluate-then-index-shift (constraints.py
    _evaluate_boundary_group)."""
    from starkpack_winterfell_tpu.air import (
        AirContext,
        Assertion,
        TransitionConstraintDegree,
    )

    stride = 4

    class SeqPub:
        def __init__(self, start, result, seq):
            self.start, self.result, self.seq = start, result, list(seq)

        def to_elements(self):
            return [self.start, self.result] + self.seq

    class SeqDoWorkAir(DoWorkAir):
        def __init__(self, trace_info, pub_inputs, options):
            degrees = [TransitionConstraintDegree(3)]
            self.context = AirContext(trace_info, degrees, 3, options)
            self.start = pub_inputs.start
            self.result = pub_inputs.result
            self.seq = pub_inputs.seq

        def get_assertions(self):
            last = self.trace_length() - 1
            return [
                Assertion.single(0, 0, self.start),
                Assertion.single(0, last, self.result),
                # first_step=1 exercises the poly_offset (x-shift) handling
                Assertion.sequence(0, 1, stride, self.seq),
            ]

    class SeqDoWorkProver(DoWorkProver):
        air_class = SeqDoWorkAir

        def get_pub_inputs(self, trace):
            last = trace.length - 1
            seq = [trace.get(0, 1 + i * stride)
                   for i in range(trace.length // stride)]
            return SeqPub(trace.get(0, 0), trace.get(0, last), seq)

    mesh = make_mesh(4)
    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 7)
    n = 2
    traces = [build_do_work_trace(i + 3, 16) for i in range(n)]
    prover = SeqDoWorkProver(options, Blake3_256)
    host_proof = prover.prove(n, traces)
    mesh_proof = prove_mesh(prover, n, traces, mesh)
    assert mesh_proof.to_bytes() == host_proof.to_bytes()
    pub_inputs = [prover.get_pub_inputs(t) for t in traces]
    assert verify(SeqDoWorkAir, mesh_proof, pub_inputs, Blake3_256)


def test_sharded_commit_per_device_memory():
    """The gather-free claim, verified directly: every per-device shard of
    the P1 outputs holds 1/d of the global array (no phase materializes the
    full LDE per device — round-1's all_gather did)."""
    import numpy as np

    from starkpack_winterfell_tpu.ops.backend import get_backend
    from starkpack_winterfell_tpu.parallel.full_pipeline import (
        sharded_segment_commit,
        _stack_segments,
    )

    d = 8
    mesh = make_mesh(d)
    B = get_backend("f64")
    n, w, length, blowup = 8, 4, 64, 8
    L = length * blowup
    rng = np.random.default_rng(0)
    cols = rng.integers(0, B.P, size=(w, length), dtype=np.uint64)
    segs = [B.cmap(lambda l: l, (B.b_from_ints(list(cols.reshape(-1))),))
            for _ in range(n)]
    segs = [
        ((np.asarray(c[0][0]).reshape(w, length),
          np.asarray(c[0][1]).reshape(w, length)),)
        for c in segs
    ]
    stacked = _stack_segments(segs, n)
    k1 = sharded_segment_commit(mesh, B, Blake3_256, n, n, w, length, blowup,
                                7, 1)
    polys, lde_rows, sub_l, top_l = k1(stacked)
    # instance-sharded polys: each device holds n/d instances
    for sh in polys[0][0].addressable_shards:
        assert sh.data.shape == (n // d, w, length)
    # row-block-sharded LDE: each device holds L/d rows for ALL instances
    for sh in lde_rows[0][0].addressable_shards:
        assert sh.data.shape == (n, w, L // d)
    # leaf level is row-sharded too
    for sh in sub_l[0].addressable_shards:
        assert sh.data.shape[0] == L // d // 1
