"""Serde-layout audit: every proof struct's byte layout asserted against
hand-derived offsets, so a refactor cannot silently change the wire format.

Layouts cited from the reference:
  StarkProof::to_bytes order      air/src/proof/mod.rs:133-147
  Context                         air/src/proof/context.rs:147-161
  TraceLayout                     air/src/trace/info.rs (u8 widths/rands)
  ProofOptions                    air/src/options.rs:240-248 (6 u8s)
  Commitments                     air/src/proof/commitments.rs (u16 len + bytes)
  JointTraceQueries               air/src/proof/queries.rs:327-359 — the fork
                                  DROPS value_vec: only (u32 values, u32 paths)
  Queries                         air/src/proof/queries.rs:327-359 (same drop)
  OodFrame                        air/src/proof/ood_frame.rs:46-67
  FriProof / FriProofLayer        fri/src/proof.rs:340-356
  pow_nonce                       air/src/proof/mod.rs:146 (u64 LE)
"""

import struct

from starkpack_winterfell_tpu.air.options import FieldExtension, ProofOptions
from starkpack_winterfell_tpu.crypto.hashers import Blake3_256
from starkpack_winterfell_tpu.models.do_work import DoWorkProver, build_do_work_trace
from starkpack_winterfell_tpu.models.permutation import PermProver, build_perm_trace


def _u16(b, off):
    return struct.unpack_from("<H", b, off)[0]


def _u32(b, off):
    return struct.unpack_from("<I", b, off)[0]


class Walker:
    def __init__(self, data):
        self.b = data
        self.off = 0

    def u8(self):
        v = self.b[self.off]
        self.off += 1
        return v

    def u16(self):
        v = _u16(self.b, self.off)
        self.off += 2
        return v

    def u32(self):
        v = _u32(self.b, self.off)
        self.off += 4
        return v

    def take(self, n):
        v = self.b[self.off : self.off + n]
        self.off += n
        return v


def _walk_context(w, *, main_width, aux_widths, aux_rands, log_len, modulus,
                  options):
    """Context = TraceLayout + u8 log2(len) + u16 meta len + meta +
    u8 modulus-byte-count + modulus LE bytes + 6-u8 ProofOptions
    (context.rs:147-161)."""
    assert w.u8() == main_width
    for aw in aux_widths:
        assert w.u8() == aw
    for ar in aux_rands:
        assert w.u8() == ar
    assert w.u8() == log_len
    assert w.u16() == 0  # no trace meta in any example
    n_mod = w.u8()
    mod_bytes = w.take(n_mod)
    assert int.from_bytes(mod_bytes, "little") == modulus
    assert w.u8() == options.num_queries
    assert w.u8() == options.blowup_factor
    assert w.u8() == options.grinding_factor
    assert w.u8() == options.field_extension
    assert w.u8() == options.fri_folding_factor
    assert w.u8() == options.fri_remainder_max_degree


def _walk_tail(w, proof, *, n, ext_deg, trace_width, aux_width, num_aux_rows,
               digest_size, num_segments, lde_size, options, field_bytes):
    """Commitments through pow_nonce (mod.rs:133-147)."""
    num_queries = options.num_queries
    num_fri_layers = len(proof.fri_proof.layers)

    # Commitments: u16 byte-count, then one digest per tree in commit order:
    # trace segment trees, constraint tree, FRI layer trees, FRI remainder
    # poly hash (commitments.rs:72-85)
    n_comm = w.u16()
    num_trees = num_segments + 1 + num_fri_layers + 1
    assert n_comm == num_trees * digest_size
    w.take(n_comm)

    # JointTraceQueries per segment: u32 values-byte-count + values +
    # u32 paths-byte-count + paths (queries.rs:327-359; value_vec dropped)
    for seg in range(num_segments):
        nv = w.u32()
        width = trace_width * n if seg == 0 else aux_width * n * ext_deg
        assert nv == num_queries * width * field_bytes
        w.take(nv)
        npaths = w.u32()
        w.take(npaths)

    # constraint Queries: same frame, rows are ext elements
    nv = w.u32()
    num_cols = len(proof.ood_frames[0].evaluations) // (ext_deg * field_bytes)
    assert nv == num_queries * num_cols * ext_deg * field_bytes
    w.take(nv)
    w.take(w.u32())

    # OodFrame per instance: u16 + trace states (current||next for main+aux),
    # u16 + composition evaluations (ood_frame.rs:46-67)
    for i in range(n):
        nt = w.u16()
        # u8 frame size (=2) then two interleaved rows (z and z*g), each
        # (main_width + aux_width) E-elements (ood_frame.rs:46-67)
        assert nt == 1 + 2 * (trace_width + aux_width) * ext_deg * field_bytes
        body = w.take(nt)
        assert body[0] == 2
        ne = w.u16()
        assert ne == num_cols * ext_deg * field_bytes
        w.take(ne)

    # FriProof: u8 layer count, per layer u32+values+u32+paths, u16 remainder
    # byte-count + remainder, u8 log2(num_partitions) (proof.rs:340-356)
    assert w.u8() == num_fri_layers
    folding = options.fri_folding_factor
    layer_size = lde_size
    for _ in range(num_fri_layers):
        nv = w.u32()
        layer_size //= folding
        # one (folding)-element coset row per DISTINCT folded position
        # (fri/src/prover/mod.rs fold_positions dedup) — bounded by queries
        row_bytes = folding * ext_deg * field_bytes
        assert nv % row_bytes == 0
        assert 0 < nv <= num_queries * row_bytes
        w.take(nv)
        w.take(w.u32())
    nr = w.u16()
    assert nr % (ext_deg * field_bytes) == 0
    rem_len = nr // (ext_deg * field_bytes)
    assert rem_len <= options.fri_remainder_max_degree + 1
    w.take(nr)
    assert w.u8() == 0  # num_partitions hook, always 1 partition -> log = 0

    # trailing u64 LE pow nonce (mod.rs:146)
    nonce = int.from_bytes(w.take(8), "little")
    assert nonce == proof.pow_nonce
    assert w.off == len(w.b), "no trailing bytes"


def test_layout_do_work_main_only():
    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 7)
    n = 2
    traces = [build_do_work_trace(i + 1, 16) for i in range(n)]
    prover = DoWorkProver(options, Blake3_256)
    proof = prover.prove(n, traces)
    data = proof.to_bytes()
    w = Walker(data)
    for _ in range(n):
        _walk_context(
            w, main_width=10, aux_widths=(0,), aux_rands=(0,), log_len=4,
            modulus=2**64 - 2**32 + 1, options=options,
        )
    _walk_tail(
        w, proof, n=n, ext_deg=1, trace_width=10, aux_width=0,
        num_aux_rows=0, digest_size=32, num_segments=1,
        lde_size=16 * 8, options=options, field_bytes=8,
    )


def test_layout_permutation_aux_quadratic():
    options = ProofOptions(16, 8, 0, FieldExtension.QUADRATIC, 4, 7)
    n = 2
    traces = [build_perm_trace(i + 1, 16) for i in range(n)]
    prover = PermProver(options, Blake3_256)
    proof = prover.prove(n, traces)
    data = proof.to_bytes()
    w = Walker(data)
    for _ in range(n):
        _walk_context(
            w, main_width=2, aux_widths=(1,), aux_rands=(1,), log_len=4,
            modulus=2**64 - 2**32 + 1, options=options,
        )
    _walk_tail(
        w, proof, n=n, ext_deg=2, trace_width=2, aux_width=1,
        num_aux_rows=1, digest_size=32, num_segments=2,
        lde_size=16 * 8, options=options, field_bytes=8,
    )
