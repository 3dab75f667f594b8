"""Coset-streamed proving phases (parallel/streamed.py): byte-identical to
the host pipeline and to the one-shot mesh path.

The streamed kernels engage when the one-shot pipeline's estimated HBM peak
exceeds the budget (the lamport-agg 1024-sig config demanded 27.3 GB of a
15.75 GB chip in round 3); here the budget is forced to 1 byte so a small
config streams, and the proof bytes are pinned against the host prover."""

import os

import numpy as np
import pytest

from starkpack_winterfell_tpu.air import (
    Air,
    AirContext,
    Assertion,
    TransitionConstraintDegree,
)
from starkpack_winterfell_tpu.air.options import FieldExtension, ProofOptions
from starkpack_winterfell_tpu.crypto.hashers import Sha3_256
from starkpack_winterfell_tpu.math.fieldspec import F128_SPEC
from starkpack_winterfell_tpu.parallel import streamed
from starkpack_winterfell_tpu.parallel.full_pipeline import prove_mesh
from starkpack_winterfell_tpu.parallel.mesh import make_mesh
from starkpack_winterfell_tpu.prover.pipeline import Prover
from starkpack_winterfell_tpu.prover.trace import TraceTable
from starkpack_winterfell_tpu.verifier.verifier import verify

PVALS = [3, 1, 4, 1, 5, 9, 2, 6]  # periodic column, period 8
STRIDE = 4


class StreamPub:
    def __init__(self, start, c1, seq):
        self.start, self.c1, self.seq = start, c1, list(seq)

    def to_elements(self):
        return [self.start, self.c1] + self.seq


class StreamTestAir(Air):
    """Width-2 f128 AIR exercising every streamed-kernel table kind:
    a periodic column (compact per-coset slicing), a sequence assertion
    (in-kernel coefficient NTT), and first/last-row singles (divisor
    slicing)."""

    def __init__(self, trace_info, pub_inputs, options):
        degrees = [
            TransitionConstraintDegree.with_cycles(1, [8]),
            TransitionConstraintDegree(1),
        ]
        self.context = AirContext(trace_info, degrees, 3, options,
                                  field=F128_SPEC)
        self.pub = pub_inputs

    def evaluate_transition(self, frame, periodic_values, result):
        cur, nxt = frame.current(), frame.next()
        result[0] = nxt[0] - cur[0] - periodic_values[0]
        result[1] = nxt[1] - cur[1]

    def get_assertions(self):
        L = self.trace_length()
        return [
            Assertion.single(0, 0, self.pub.start),
            Assertion.single(1, 0, self.pub.c1),
            # first_step=1: exercises the sequence poly_offset handling
            Assertion.sequence(0, 1, L // STRIDE, self.pub.seq),
        ]

    def get_periodic_column_values(self):
        return [PVALS]


def build_stream_trace(start: int, c1: int, length: int) -> TraceTable:
    P = F128_SPEC.P
    col0 = [start % P]
    for i in range(length - 1):
        col0.append((col0[-1] + PVALS[i % 8]) % P)
    return TraceTable.init([col0, [c1 % P] * length], field="f128")


class StreamTestProver(Prover):
    air_class = StreamTestAir

    def __init__(self, options, hasher):
        self._options = options
        self.hasher = hasher

    def get_pub_inputs(self, trace):
        L = trace.length
        seq = [trace.get(0, 1 + i * (L // STRIDE)) for i in range(STRIDE)]
        return StreamPub(trace.get(0, 0), trace.get(1, 0), seq)

    def options(self):
        return self._options


def test_stream_gate_calibration():
    # lamport-agg 1024 (the round-3 OOM: 27.3 GB demanded) must stream...
    assert streamed.should_stream(1, 14, 1 << 20, 8, 16, 1)
    # ...agg-64 (ran fine one-shot in round 3) must not
    assert not streamed.should_stream(1, 14, 1 << 16, 8, 16, 1)
    # a mesh with d > 1 keeps the sharded one-shot path (preflight-guarded);
    # aux configs stream like main-only ones since round 5
    assert not streamed.should_stream(1, 14, 1 << 20, 8, 16, 8)
    assert streamed.should_stream(1, 14, 1 << 20, 8, 16, 1, True)


def test_streamed_byte_identical(monkeypatch):
    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 3)
    n = 2
    traces = [build_stream_trace(7 + i, 11 + i, 32) for i in range(n)]
    prover = StreamTestProver(options, Sha3_256)
    host_proof = prover.prove(n, traces)

    mesh = make_mesh(1)
    oneshot_proof = prove_mesh(prover, n, traces, mesh)
    assert oneshot_proof.to_bytes() == host_proof.to_bytes()

    monkeypatch.setenv("STARKPACK_HBM_BUDGET", "1")
    streamed_proof = prove_mesh(prover, n, traces, mesh)
    assert streamed_proof.to_bytes() == host_proof.to_bytes()

    pub = [prover.get_pub_inputs(t) for t in traces]
    assert verify(StreamTestAir, streamed_proof, pub, Sha3_256)


# ---------------------------------------------------------------------------
# Aux-segment streaming (round 5, VERDICT r4 item 3)
# ---------------------------------------------------------------------------

from starkpack_winterfell_tpu.air.trace_info import TraceInfo, TraceLayout
from starkpack_winterfell_tpu.ops.backend import get_backend
from starkpack_winterfell_tpu.ops.felt import Felt

FP = F128_SPEC.P


class AuxPub:
    def __init__(self, a0, b0):
        self.a0, self.b0 = a0, b0

    def to_elements(self):
        return [self.a0, self.b0]


class StreamAuxAir(Air):
    """f128 grand-product permutation AIR (one aux segment, one aux rand
    element) — the limb-field analog of models/permutation.py, used to pin
    the coset-streamed aux path byte-identical to the host pipeline."""

    def __init__(self, trace_info, pub_inputs, options):
        self.context = AirContext(
            trace_info,
            [TransitionConstraintDegree(1)],
            2,
            options,
            aux_transition_constraint_degrees=[TransitionConstraintDegree(2)],
            num_aux_assertions=2,
            field=F128_SPEC,
        )
        self.a0 = pub_inputs.a0
        self.b0 = pub_inputs.b0

    def evaluate_transition(self, frame, periodic_values, result):
        result[0] = frame.next()[1] - frame.current()[0]

    def get_assertions(self):
        return [
            Assertion.single(0, 0, self.a0),
            Assertion.single(1, 0, self.b0),
        ]

    def evaluate_aux_transition(
        self, main_frame, aux_frame, periodic_values, aux_rand_elements,
        result,
    ):
        gamma = aux_rand_elements.get_segment_elements(0)[0]
        if not isinstance(gamma, Felt):
            B = get_backend("f128")
            gamma = Felt(B.scalar_to_limbs(gamma, 1, (1,)), B=B)
        a_next = main_frame.next()[0]
        b_next = main_frame.next()[1]
        p = aux_frame.current()[0]
        p_next = aux_frame.next()[0]
        result[0] = p_next * (b_next + gamma) - p * (a_next + gamma)

    def get_aux_assertions(self, aux_rand_elements):
        gamma = aux_rand_elements.get_segment_elements(0)[0]
        fs = F128_SPEC
        first = fs.fdiv(fs.fadd(self.a0, gamma), fs.fadd(self.b0, gamma))
        return [
            Assertion.single(0, 0, first),
            Assertion.single(0, self.trace_length() - 1, 1),
        ]


class StreamAuxTrace(TraceTable):
    def get_info(self):
        layout = TraceLayout(2, (1,), (1,))
        return TraceInfo.new_multi_segment(layout, self.length, self.meta)

    def num_aux_segments(self):
        return 1

    def build_aux_segment(self, seg_idx, rand_elements):
        assert seg_idx == 0
        gamma = rand_elements[0]
        fs = F128_SPEC
        deg = 1 if isinstance(gamma, int) else len(gamma)
        a = [int(v) for v in self._columns[0]]
        b = [int(v) for v in self._columns[1]]
        if deg == 1:
            # running product with ONE Montgomery-batched inversion (a
            # per-row Fermat inverse is ~5 us x 2^20 rows at the on-chip
            # demo size, .exp/aux_stream_bench.py)
            P = fs.P
            dens = [(v + gamma) % P for v in b]
            prefix = [1] * (self.length + 1)
            for i, v in enumerate(dens):
                prefix[i + 1] = prefix[i] * v % P
            inv = pow(prefix[self.length], P - 2, P)
            p, acc = [0] * self.length, 1
            inv_suffix = [0] * self.length
            for i in range(self.length - 1, -1, -1):
                inv_suffix[i] = inv
                inv = inv * dens[i] % P
            for i in range(self.length):
                inv_d = prefix[i] * inv_suffix[i] % P
                acc = acc * ((a[i] + gamma) % P) % P * inv_d % P
                p[i] = acc
        else:
            p, acc = [], fs.one(deg)
            for i in range(self.length):
                acc = fs.fmul(
                    acc,
                    fs.fdiv(fs.fadd(a[i], gamma), fs.fadd(b[i], gamma)),
                )
                p.append(acc)
        B = get_backend("f128")
        comps = B.elems_to_limbs(p, deg)
        return tuple(
            tuple(np.asarray(l).reshape(1, self.length) for l in c)
            for c in comps
        )


def build_aux_trace(start: int, length: int) -> StreamAuxTrace:
    a, x = [], start % FP
    for _ in range(length):
        a.append(x)
        x = (x * x + 1) % FP
    b = [a[-1]] + a[:-1]
    return StreamAuxTrace.init([a, b], field="f128")


class StreamAuxProver(Prover):
    air_class = StreamAuxAir

    def __init__(self, options, hasher):
        self._options = options
        self.hasher = hasher

    def get_pub_inputs(self, trace):
        return AuxPub(trace.get(0, 0), trace.get(1, 0))

    def options(self):
        return self._options


def test_streamed_aux_byte_identical(monkeypatch):
    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 3)
    n = 2
    traces = [build_aux_trace(5 + i, 32) for i in range(n)]
    prover = StreamAuxProver(options, Sha3_256)
    host_proof = prover.prove(n, traces)

    mesh = make_mesh(1)
    oneshot_proof = prove_mesh(
        prover, n, [build_aux_trace(5 + i, 32) for i in range(n)], mesh
    )
    assert oneshot_proof.to_bytes() == host_proof.to_bytes()

    monkeypatch.setenv("STARKPACK_HBM_BUDGET", "1")
    streamed_proof = prove_mesh(
        prover, n, [build_aux_trace(5 + i, 32) for i in range(n)], mesh
    )
    assert streamed_proof.to_bytes() == host_proof.to_bytes()

    pub = [prover.get_pub_inputs(t) for t in traces]
    assert verify(StreamAuxAir, streamed_proof, pub, Sha3_256)


def test_preflight_fails_fast_on_mesh(monkeypatch):
    """d > 1 cannot stream: an over-budget config must raise BEFORE tracing
    (not OOM after a multi-hour compile)."""
    from starkpack_winterfell_tpu.errors import ProverError

    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 3)
    traces = [build_stream_trace(7, 11, 32)]
    prover = StreamTestProver(options, Sha3_256)
    monkeypatch.setenv("STARKPACK_HBM_BUDGET", "1")
    mesh = make_mesh(2)
    with pytest.raises(ProverError, match="peak HBM"):
        prove_mesh(prover, 1, traces, mesh)
    # explicit override attempts the one-shot path anyway
    monkeypatch.setenv("STARKPACK_HBM_PREFLIGHT", "0")
    monkeypatch.setenv("STARKPACK_HBM_BUDGET", str(10**10))
    proof = prove_mesh(prover, 1, traces, mesh)
    assert verify(
        StreamTestAir, proof, [prover.get_pub_inputs(traces[0])], Sha3_256
    )
