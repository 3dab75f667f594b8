"""Execution traces — equivalent of prover/src/trace/{mod,trace_table}.rs.

A trace is stored column-major as u32-limb pairs (the TPU-native layout for
per-column NTTs).  ``TraceTable.fill`` mirrors the reference's sequential
builder for convenience; AIRs that can express their update as a jax-scan can
construct traces directly from arrays (``from_u64_columns``) and stay on
device end-to-end.
"""

from __future__ import annotations

import numpy as np

from ..air.trace_info import TraceInfo, TraceLayout
from ..math import scalar as fs
from ..ops import gl64 as gl


class TraceTable:
    """prover/src/trace/trace_table.rs:62 — main-segment-only trace."""

    def __init__(self, width: int, length: int, meta: bytes = b""):
        assert 0 < width <= TraceInfo.MAX_TRACE_WIDTH
        assert length >= TraceInfo.MIN_TRACE_LENGTH and length & (length - 1) == 0
        self.width = width
        self.length = length
        self.meta = meta
        # column-major u64 staging (filled by host builders)
        self._columns = np.zeros((width, length), dtype=np.uint64)

    # -- constructors --------------------------------------------------------

    @classmethod
    def from_u64_columns(cls, columns: np.ndarray, meta: bytes = b"") -> "TraceTable":
        columns = np.asarray(columns, dtype=np.uint64)
        obj = cls(columns.shape[0], columns.shape[1], meta)
        obj._columns = columns.copy()
        return obj

    @classmethod
    def init(cls, columns) -> "TraceTable":
        """From a list of per-column python-int lists (trace_table.rs:107)."""
        arr = np.array(columns, dtype=np.uint64)
        return cls.from_u64_columns(arr)

    def fill(self, init_fn, update_fn):
        """Sequential builder (trace_table.rs:230-243): ``init_fn(state)``
        seeds row 0, ``update_fn(step, state)`` computes row step+1 from row
        step.  ``state`` is a list of python ints."""
        state = [0] * self.width
        init_fn(state)
        self._columns[:, 0] = [s % fs.P for s in state]
        for i in range(self.length - 1):
            update_fn(i, state)
            self._columns[:, i + 1] = [s % fs.P for s in state]

    # -- accessors -----------------------------------------------------------

    def get(self, column: int, step: int) -> int:
        return int(self._columns[column, step])

    def set(self, column: int, step: int, value: int):
        self._columns[column, step] = value % fs.P

    def get_info(self) -> TraceInfo:
        return TraceInfo(self.width, self.length, self.meta)

    def layout(self) -> TraceLayout:
        return self.get_info().layout

    def main_segment_limbs(self):
        """Main segment as tuple-of-1 component: (lo, hi) pair of shape
        (width, length)."""
        return (gl.from_u64(self._columns),)

    def main_columns_u64(self) -> np.ndarray:
        return self._columns

    def num_aux_segments(self) -> int:
        return 0

    def build_aux_segment(self, aux_segments, rand_elements):
        """Multi-segment traces override this (trace/mod.rs:60-77)."""
        return None

    def read_row(self, step: int):
        return [int(v) for v in self._columns[:, step]]
