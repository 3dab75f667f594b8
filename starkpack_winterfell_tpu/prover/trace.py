"""Execution traces — equivalent of prover/src/trace/{mod,trace_table}.rs.

A trace is stored column-major as u32-limb tuples (the TPU-native layout for
per-column NTTs).  ``TraceTable.fill`` mirrors the reference's sequential
builder for convenience; AIRs that can express their update as a jax-scan can
construct traces directly from arrays (``from_u64_columns``) and stay on
device end-to-end.  The ``field`` name selects the base field (f64 default;
f62/f128 traces stage their columns as python ints since values exceed u64).
"""

from __future__ import annotations

import numpy as np

from ..air.trace_info import TraceInfo, TraceLayout
from ..math import scalar as fs
from ..math.fieldspec import FIELDS
from ..ops import gl64 as gl


class TraceTable:
    """prover/src/trace/trace_table.rs:62 — main-segment-only trace."""

    def __init__(self, width: int, length: int, meta: bytes = b"", field: str = "f64"):
        assert 0 < width <= TraceInfo.MAX_TRACE_WIDTH
        assert length >= TraceInfo.MIN_TRACE_LENGTH and length & (length - 1) == 0
        self.width = width
        self.length = length
        self.meta = meta
        self.field = field
        self.spec = FIELDS[field]
        if field == "f64":
            # column-major u64 staging (filled by host builders)
            self._columns = np.zeros((width, length), dtype=np.uint64)
        else:
            self._columns = [[0] * length for _ in range(width)]

    # -- constructors --------------------------------------------------------

    @classmethod
    def from_u64_columns(cls, columns: np.ndarray, meta: bytes = b"") -> "TraceTable":
        columns = np.asarray(columns, dtype=np.uint64)
        obj = cls(columns.shape[0], columns.shape[1], meta)
        obj._columns = columns.copy()
        return obj

    @classmethod
    def from_u64_pairs(cls, lo: np.ndarray, hi: np.ndarray, field: str,
                       meta: bytes = b"") -> "TraceTable":
        """From (width, length) u64 lo/hi planes of <=128-bit canonical
        elements (filled by native builders) — skips the python-int staging
        entirely; limbs are sliced straight out of the planes."""
        lo = np.asarray(lo, dtype=np.uint64)
        hi = np.asarray(hi, dtype=np.uint64)
        obj = cls(lo.shape[0], lo.shape[1], meta, field=field)
        obj._pair_columns = (lo.copy(), hi.copy())
        obj._columns = None
        return obj

    @classmethod
    def init(cls, columns, field: str = "f64") -> "TraceTable":
        """From a list of per-column python-int lists (trace_table.rs:107)."""
        if field == "f64":
            arr = np.array(columns, dtype=np.uint64)
            return cls.from_u64_columns(arr)
        obj = cls(len(columns), len(columns[0]), field=field)
        P = obj.spec.P
        obj._columns = [[int(v) % P for v in col] for col in columns]
        return obj

    def fill(self, init_fn, update_fn):
        """Sequential builder (trace_table.rs:230-243): ``init_fn(state)``
        seeds row 0, ``update_fn(step, state)`` computes row step+1 from row
        step.  ``state`` is a list of python ints."""
        P = self.spec.P
        state = [0] * self.width
        init_fn(state)
        self._set_row(0, [s % P for s in state])
        for i in range(self.length - 1):
            update_fn(i, state)
            self._set_row(i + 1, [s % P for s in state])

    def _set_row(self, step: int, values):
        if self.field == "f64":
            self._columns[:, step] = values
        else:
            for c, v in enumerate(values):
                self._columns[c][step] = v

    # -- accessors -----------------------------------------------------------

    def get(self, column: int, step: int) -> int:
        if getattr(self, "_pair_columns", None) is not None:
            lo, hi = self._pair_columns
            return int(lo[column, step]) | (int(hi[column, step]) << 64)
        return int(self._columns[column][step]) if self.field != "f64" else int(
            self._columns[column, step]
        )

    def set(self, column: int, step: int, value: int):
        if self.field == "f64":
            self._columns[column, step] = value % fs.P
        else:
            self._columns[column][step] = value % self.spec.P

    def get_info(self) -> TraceInfo:
        return TraceInfo(self.width, self.length, self.meta)

    def layout(self) -> TraceLayout:
        return self.get_info().layout

    def main_segment_limbs(self, backend=None):
        """Main segment as a tuple-of-1 component of u32 limb arrays shaped
        (width, length)."""
        if self.field == "f64":
            return (gl.from_u64(self._columns),)
        from ..ops.backend import get_backend

        B = backend if backend is not None else get_backend(self.field)
        if getattr(self, "_pair_columns", None) is not None:
            lo, hi = self._pair_columns
            mask = np.uint64(0xFFFFFFFF)
            sh = np.uint64(32)
            planes = [lo & mask, lo >> sh, hi & mask, hi >> sh]
            n_limbs = B.spec.ELEMENT_BYTES // 4
            comp = tuple(planes[i].astype(np.uint32) for i in range(n_limbs))
            return (comp,)
        flat = [v for col in self._columns for v in col]
        comp = B.b_from_ints(flat)
        return (B.cmap(lambda l: l.reshape(self.width, self.length), comp),)

    def main_columns_u64(self) -> np.ndarray:
        assert self.field == "f64"
        return self._columns

    # -- device-resident trace planes ----------------------------------------
    # The tunneled TPU moves ~10-20 MB/s, so uploading a full trace (100 MB
    # at rescue 2^20) dominates the proof.  Models whose traces expand from
    # a small skeleton (chain boundary states, signature bits) attach a
    # builder that recreates the full planes ON DEVICE bit-identically; the
    # device provers then upload only the skeleton.

    def set_device_builder(self, fn):
        """fn() -> (lo, hi) device uint32 arrays shaped (width, length),
        bit-identical to main_segment_limbs (f64 only)."""
        self._device_builder = fn
        self._device_planes = None

    def device_planes(self):
        """Device (lo, hi) planes via the attached builder, memoized; None
        if no builder is attached (caller uploads the host columns)."""
        fn = getattr(self, "_device_builder", None)
        if fn is None:
            return None
        if getattr(self, "_device_planes", None) is None:
            self._device_planes = fn()
        return self._device_planes

    def num_aux_segments(self) -> int:
        return 0

    def build_aux_segment(self, aux_segments, rand_elements):
        """Multi-segment traces override this (trace/mod.rs:60-77)."""
        return None

    def read_row(self, step: int):
        if self.field == "f64":
            return [int(v) for v in self._columns[:, step]]
        return [col[step] for col in self._columns]

    def validate(self, air):
        """Debug-mode full trace validation (prover/src/trace/mod.rs:101-223):
        every assertion holds against the trace, and every main transition
        constraint evaluates to zero at each non-exempt step.  Vectorized:
        one ``evaluate_transition`` call over the whole trace domain."""
        from ..ops.backend import get_backend
        from ..ops.felt import Felt

        B = get_backend(self.field)
        spec = B.spec
        L = self.length

        for a in air.get_assertions():
            if a.is_single():
                checks = [(a.first_step, a.values[0])]
            elif a.is_periodic():
                checks = [
                    (a.first_step + i * a.stride, a.values[0])
                    for i in range(L // a.stride)
                ]
            else:  # sequence
                checks = [
                    (a.first_step + i * a.stride, v) for i, v in enumerate(a.values)
                ]
            for step, v in checks:
                want = spec.components(spec.embed(v, spec.deg_of(v)))[0] if not isinstance(v, int) else v % spec.P
                got = self.get(a.column, step)
                if got != want:
                    raise AssertionError(
                        f"trace does not satisfy assertion "
                        f"trace({a.column}, {step}) == {v}, got {got}"
                    )

        seg = self.main_segment_limbs(B)[0]
        cur = [
            Felt((B.cmap(lambda l: l[w_i, : L - 1], seg),), B=B)
            for w_i in range(self.width)
        ]
        nxt = [
            Felt((B.cmap(lambda l: l[w_i, 1:], seg),), B=B)
            for w_i in range(self.width)
        ]
        from ..air.transition import EvaluationFrame

        frame = EvaluationFrame(cur, nxt)
        pv = []
        for col in air.get_periodic_column_values():
            vals = [col[i % len(col)] for i in range(L - 1)]
            pv.append(Felt((B.b_from_ints(vals),), B=B))
        k = air.context.num_main_transition_constraints()
        result = [None] * k
        air.evaluate_transition(frame, pv, result)
        n_exempt = air.context.num_transition_exemptions
        for ci, ev in enumerate(result):
            vals = ev.to_elems()
            for step in range(L - 1 - (n_exempt - 1)):
                if not spec.is_zero(vals[step]):
                    raise AssertionError(
                        f"transition constraint {ci} did not evaluate to "
                        f"zero at step {step} (got {vals[step]})"
                    )
        return True
