"""Trace/constraint commitments — equivalent of prover/src/matrix/row_matrix.rs
commit_to_rows / commit_to_comb_rows and prover/src/trace/commitment.rs.

LDE evaluations live column-major as limb tuples; the combined-row leaf
(row_matrix.rs:204-238: leaf_i = H(trace0.row(i) || trace1.row(i) || ...))
is built by interleaving limb planes into the hash word layout and hashing
all rows in one vectorized call.  Field-generic via FieldBackend.
"""

from __future__ import annotations

import numpy as np

from ..air.proof import JointTraceQueries, Queries
from ..crypto.merkle import MerkleTree, build_levels
from ..ops.backend import get_backend


def _backend(backend):
    return backend if backend is not None else get_backend("f64")


def interpolate_and_lde(segments, domain_offset: int, blowup: int, backend=None):
    """Per trace: iNTT columns -> coset-evaluate to the LDE domain.
    segments: list of component tuples shaped (w, n).  Returns (polys, ldes).
    (ColMatrix::interpolate_columns + RowMatrix::evaluate_polys_over,
    col_matrix.rs:196, row_matrix.rs:82)."""
    B = _backend(backend)
    polys = []
    ldes = []
    for seg in segments:
        p = B.interpolate_poly(seg)
        polys.append(p)
        ldes.append(B.evaluate_poly_with_offset(p, domain_offset, blowup))
    return polys, ldes


def commit_to_comb_rows(ldes, hasher, ext_deg: int, backend=None) -> MerkleTree:
    """One tree over concatenated per-trace rows (row_matrix.rs:204-238)."""
    B = _backend(backend)
    word_blocks = []
    total_width = 0
    for lde in ldes:
        w, L = lde[0][0].shape
        total_width += w
        # (w, L) -> (L, w) row-major
        rows = tuple(B.cmap(lambda l: l.T, c) for c in lde)
        word_blocks.append(B.rows_to_words(rows, ext_deg))
    words = np.concatenate(word_blocks, axis=-1)
    byte_len = total_width * ext_deg * B.ELEMENT_BYTES
    leaves = hasher.hash_words(words, byte_len)
    return MerkleTree(build_levels(np.asarray(leaves), hasher), hasher)


def commit_to_rows(lde, hasher, ext_deg: int, backend=None) -> MerkleTree:
    """Single-matrix row commitment (row_matrix.rs:183-203)."""
    return commit_to_comb_rows([lde], hasher, ext_deg, backend)


def build_segment_queries(segments_lde, segment_tree, positions, ext_deg: int,
                          backend=None, gathered: bool = False):
    """prover/src/trace/commitment.rs:135-190 — joint rows + per-trace rows.

    gathered=True: segments_lde entries hold only the queried columns
    (w, len(positions)), already aligned with ``positions`` (the mesh
    pipeline gathers them on device instead of shipping full LDEs)."""
    B = _backend(backend)
    idxs = range(len(positions)) if gathered else positions
    traces_states = []
    for lde in segments_lde:
        rows = []
        for pos in idxs:
            row_limbs = tuple(B.cmap(lambda l: l[:, pos], c) for c in lde)
            rows.append(B.limbs_to_elems(row_limbs, ext_deg))
        traces_states.append(rows)
    comb_states = []
    for i in range(len(positions)):
        row = []
        for ts in traces_states:
            row.extend(ts[i])
        comb_states.append(row)
    proof = segment_tree.prove_batch(positions)
    return JointTraceQueries.new(proof, comb_states, traces_states, B.spec)


def build_constraint_queries(lde, tree, positions, ext_deg: int,
                             backend=None, gathered: bool = False) -> Queries:
    """prover/src/constraints/commitment.rs:54-70."""
    B = _backend(backend)
    rows = []
    for pos in (range(len(positions)) if gathered else positions):
        row_limbs = tuple(B.cmap(lambda l: l[:, pos], c) for c in lde)
        rows.append(B.limbs_to_elems(row_limbs, ext_deg))
    proof = tree.prove_batch(positions)
    return Queries.new(proof, rows, ext_deg, B.spec)
