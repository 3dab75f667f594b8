"""do_work example — the reference's shipped batched workload
(examples/src/do_work/{air,prover}.rs): chains of x <- x^3 + 42, width-10
trace with only column 0 meaningful."""

from __future__ import annotations

import numpy as np

from ..air import Air, AirContext, Assertion, TransitionConstraintDegree
from ..math import scalar as fs
from .. import native as _native
from ..prover.pipeline import Prover
from ..prover.trace import TraceTable


class PublicInputs:
    def __init__(self, start: int, result: int):
        self.start = start
        self.result = result

    def to_elements(self):
        return [self.start, self.result]


class DoWorkAir(Air):
    """examples/src/do_work/air.rs:28-66."""

    def __init__(self, trace_info, pub_inputs, options):
        degrees = [TransitionConstraintDegree(3)]
        self.context = AirContext(trace_info, degrees, 2, options)
        self.start = pub_inputs.start
        self.result = pub_inputs.result

    def evaluate_transition(self, frame, periodic_values, result):
        current = frame.current()[0]
        nxt = current**3 + 42
        result[0] = frame.next()[0] - nxt

    def get_assertions(self):
        last_step = self.trace_length() - 1
        return [
            Assertion.single(0, 0, self.start),
            Assertion.single(0, last_step, self.result),
        ]


def build_do_work_trace(start: int, trace_length: int) -> TraceTable:
    """examples/src/do_work/prover.rs:62-79 — width 10, column 0 is the
    chain, the other columns replicate the start value.  Built vectorized."""
    width = 10
    col = np.empty(trace_length, dtype=np.uint64)
    lib = _native.get_builders()
    if lib is not None:
        import ctypes

        lib.do_work_chain(
            start % fs.P, trace_length, col.ctypes.data_as(ctypes.c_void_p)
        )
    else:
        x = start % fs.P
        for i in range(trace_length):
            col[i] = x
            x = (pow(x, 3, fs.P) + 42) % fs.P
    columns = np.broadcast_to(
        np.uint64(start % fs.P), (width, trace_length)
    ).copy()
    columns[0] = col
    return TraceTable.from_u64_columns(columns)


class DoWorkProver(Prover):
    """examples/src/do_work/prover.rs:37-59."""

    air_class = DoWorkAir

    def __init__(self, options, hasher):
        self._options = options
        self.hasher = hasher

    def get_pub_inputs(self, trace: TraceTable) -> PublicInputs:
        last_step = trace.length - 1
        return PublicInputs(trace.get(0, 0), trace.get(0, last_step))

    def options(self):
        return self._options
