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
