"""Byte-identity of the fused Pallas constraint kernel (interpret mode).

The kernel (ops/pallas/cons_kernel.py) must be a pure formulation swap:
proofs with it engaged are byte-identical to the XLA constraint path.
Interpret mode runs the kernel body as jax ops on CPU — exactness of the
tile/accumulation schedule is what's under test (the field ops themselves
are the already-differential-tested jnp formulations).
"""

import os

import pytest

from starkpack_winterfell_tpu.air.options import FieldExtension, ProofOptions
from starkpack_winterfell_tpu import verify
from starkpack_winterfell_tpu.crypto.hashers import Sha3_256
from starkpack_winterfell_tpu.ops.pallas import cons_kernel


def _with_kernel(fn):
    old = (cons_kernel.ENABLED, cons_kernel.INTERPRET)
    cons_kernel.ENABLED, cons_kernel.INTERPRET = True, True
    try:
        return fn()
    finally:
        cons_kernel.ENABLED, cons_kernel.INTERPRET = old


def test_pcons_fib_f128_byte_identity():
    from starkpack_winterfell_tpu.models.fib_multifield import get_fib_family

    air_cls, build_trace, prover_cls, _ = get_fib_family("f128")
    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 3)
    traces = [build_trace(512) for _ in range(2)]
    prover = prover_cls(options, Sha3_256)
    host_proof = prover.prove(2, traces)
    dev_proof = _with_kernel(lambda: prover.prove(2, traces, device=True))
    assert dev_proof.to_bytes() == host_proof.to_bytes()
    pubs = [prover.get_pub_inputs(t) for t in traces]
    assert verify(air_cls, dev_proof, pubs, Sha3_256)


def test_pcons_rescue_f64_byte_identity():
    # f64 pairs + n=2 instance accumulation + periodic columns + mds_apply
    from starkpack_winterfell_tpu.crypto.hashers import Blake3_256
    from starkpack_winterfell_tpu.models.rescue_chain import (
        RescueChainProver,
        build_chain_trace,
    )

    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 3)
    traces = [build_chain_trace([i + 1] * 8, 32) for i in range(2)]
    prover = RescueChainProver(options, Blake3_256)
    host_proof = prover.prove(2, traces)
    traces2 = [build_chain_trace([i + 1] * 8, 32) for i in range(2)]
    dev_proof = _with_kernel(lambda: prover.prove(2, traces2, device=True))
    assert dev_proof.to_bytes() == host_proof.to_bytes()


def test_pcons_streamed_byte_identity(monkeypatch):
    # the coset-streamed constraint kernel routed through the fused pallas
    # body (every streamed table kind: periodic slice, in-kernel seq NTT
    # values, divisor slice), pinned against the host prover
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_streamed import (
        StreamTestAir,
        StreamTestProver,
        build_stream_trace,
    )

    from starkpack_winterfell_tpu.parallel.full_pipeline import prove_mesh
    from starkpack_winterfell_tpu.parallel.mesh import make_mesh

    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 3)
    n = 2
    traces = [build_stream_trace(7 + i, 11 + i, 1024) for i in range(n)]
    prover = StreamTestProver(options, Sha3_256)
    host_proof = prover.prove(n, traces)

    monkeypatch.setenv("STARKPACK_HBM_BUDGET", "1")
    mesh = make_mesh(1)
    streamed_proof = _with_kernel(
        lambda: prove_mesh(prover, n, traces, mesh)
    )
    assert streamed_proof.to_bytes() == host_proof.to_bytes()
    pub = [prover.get_pub_inputs(t) for t in traces]
    assert verify(StreamTestAir, streamed_proof, pub, Sha3_256)


@pytest.mark.skipif(
    not os.environ.get("STARKPACK_SLOW_TESTS"),
    reason="lamport-agg constraint graphs are XLA:CPU-compile-hostile "
    "(CLAUDE.md); run with STARKPACK_SLOW_TESTS=1 or validate on TPU",
)
def test_pcons_lamport_agg_byte_identity():
    from starkpack_winterfell_tpu.models import lamport128_agg as agg

    messages, pub_keys, sigs = agg.make_wallet(2, seed=3)
    trace = agg.build_lamport128_agg_trace(messages, sigs)
    options = ProofOptions(28, 8, 0, FieldExtension.NONE, 4, 7)
    prover = agg.Lamport128AggProver(options, Sha3_256, 2)
    host_proof = prover.prove(1, [trace])
    trace2 = agg.build_lamport128_agg_trace(messages, sigs)
    dev_proof = _with_kernel(lambda: prover.prove(1, [trace2], device=True))
    assert dev_proof.to_bytes() == host_proof.to_bytes()


def test_pcons_compiled_trace_no_captured_constants():
    """Trace the NON-interpret kernel (the TPU branch) with a constraint
    body that applies an f128 MDS: pallas_call rejects kernels that
    closure-capture constant arrays, which is exactly how the MXU matvec's
    int8 digit matrices killed every round-4 agg job on the chip
    (.exp/queue/results.jsonl agg64_b192_r4b) while the interpret-mode
    tests stayed green.  jax.eval_shape runs the kernel-to-jaxpr trace
    (where the capture check lives) without Mosaic lowering, so this is
    CPU-cheap."""
    import jax
    import jax.numpy as jnp

    from starkpack_winterfell_tpu.ops import felt as feltmod, mxu_ntt
    from starkpack_winterfell_tpu.ops.backend import get_backend

    B = get_backend("f128")
    w = K = 4
    n, ce, k = 2, 256, 4
    rows = [[i * 7 + j * 3 + 1 for j in range(w)] for i in range(w)]

    class _Ctx:
        @staticmethod
        def num_transition_constraints():
            return K

    class _MdsAir:
        context = _Ctx()

        def evaluate_transition(self, frame, pv, result):
            outs = feltmod.mds_apply(frame.current(), rows)
            nxt = frame.next()
            for i in range(K):
                result[i] = outs[i] - nxt[i]

    groups = [[("main", 0, 1)]]
    call = cons_kernel.build_call(
        B, _MdsAir(), groups, 0, 0, n, w, K, 1, ce, interpret=False
    )
    cur = [
        (tuple(jnp.zeros((n, ce), jnp.uint32) for _ in range(k)),)
        for _ in range(w)
    ]
    div = [
        tuple(jnp.zeros((ce,), jnp.uint32) for _ in range(k))
        for _ in range(1 + len(groups))
    ]
    scal = jnp.zeros((n, K + 1 + 1 + 1, 128), jnp.uint32)
    old = mxu_ntt.ENABLED
    mxu_ntt.ENABLED = True  # force the capture-prone path if unsuppressed
    try:
        jax.eval_shape(call, cur, cur, [], [], div, scal)
    finally:
        mxu_ntt.ENABLED = old


def test_pcons_padded_rescue_byte_identity():
    """The canonical-bucket rescue AIR adds a FULL-period periodic column
    (the n_live selector) — a new table-shape class for the fused kernel;
    the TPU pad-family runs engage pcons, so pin byte identity here."""
    from starkpack_winterfell_tpu.crypto.hashers import Blake3_256
    from starkpack_winterfell_tpu.models.rescue_chain_pad import (
        RescueChainPadProver,
        build_padded_chain_trace,
    )

    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 3)
    trace = build_padded_chain_trace([7] * 8, 10, 16)
    prover = RescueChainPadProver(options, Blake3_256, 10)
    host_proof = prover.prove(1, [trace])
    trace2 = build_padded_chain_trace([7] * 8, 10, 16)
    dev_proof = _with_kernel(lambda: prover.prove(1, [trace2], device=True))
    assert dev_proof.to_bytes() == host_proof.to_bytes()
