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
    assert streamed.should_stream(1, 14, 1 << 20, 8, 16, 1, False)
    # ...agg-64 (ran fine one-shot in round 3) must not
    assert not streamed.should_stream(1, 14, 1 << 16, 8, 16, 1, False)
    # mesh >1 device and aux configs keep the sharded one-shot path
    assert not streamed.should_stream(1, 14, 1 << 20, 8, 16, 8, False)
    assert not streamed.should_stream(1, 14, 1 << 20, 8, 16, 1, True)


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
