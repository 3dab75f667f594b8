"""Pallas TPU kernel: fused whole-AIR constraint evaluation.

The mesh/device pipeline evaluates transition + boundary constraints by
tracing the AIR's ``evaluate_transition`` into one XLA graph over the
(n, ce) evaluation domain (parallel/full_pipeline.py
``sharded_constraint_phase``).  For the limb fields that graph is a chain
of hundreds of u32 elementwise ops per field multiply — XLA splits it into
many fusions, each paying a full HBM round trip on every (ce,)-sized
intermediate, so the phase is HBM-bound at ~1% of VPU throughput (round-3
agg64 profile: ~4.2 s of a 6.07 s prove was this phase; the arithmetic is
~10 ms of VPU work).

This kernel runs the SAME Python constraint code (the AIR's
``evaluate_transition`` plus the boundary-group walk of
``sharded_constraint_phase.local``) inside one ``pallas_call`` body, so a
(BS, 128) tile of the domain stays resident in VMEM for the entire
evaluation: one HBM read per input plane, one write per output plane.
Byte-identity is exactness of values — every field op is the identical
jnp formulation (ops/gl64.py / ops/limb_field.py traced with xp=jnp), so
canonical outputs match the XLA path bit for bit
(tests/test_cons_kernel.py pins proofs with the kernel on vs off).

Layout: per-point planes are reshaped (n, ce) -> (n, S, 128) with
S = ce // 128 and blocked (1, BS, 128) over a (S // BS, n) grid —
j (domain chunk) outer and parallel, i (instance) inner; the output block
is revisited per instance and accumulates final_power[i] * acc_i, which
reproduces the XLA path's cross-instance final-coeff combination exactly
(field addition is associative and the accumulation order matches
``B.vsum(axis=0)``'s row order).

Reference analog: the fragment-parallel ConstraintEvaluator
(/root/reference/prover/src/constraints/evaluator.rs) — here the fragment
is a VMEM tile and the "thread pool" is the VPU.
"""

from __future__ import annotations

import functools

import numpy as np

LANES = 128

#: sublane rows of the (BS, 128) tile each grid step keeps in VMEM.  The
#: lamport-agg body holds ~210 input planes + ~30 mul temporaries; at
#: BS=128 a plane is 64 KB -> ~16 MB resident, comfortably under VMEM.
DEFAULT_BS = 128

# None = auto (enabled on TPU backends only); tests force True/False.
ENABLED = None

INTERPRET = False


def enabled() -> bool:
    import os

    env = os.environ.get("STARKPACK_PCONS")
    if env is not None:
        return env not in ("0", "false", "")
    if ENABLED is not None:
        return ENABLED
    import jax

    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:  # backend init failure -> stay on the XLA path
        return False


def _as2d(plane, S):
    """(..., ce) -> (..., S, LANES) without copying."""
    return plane.reshape(plane.shape[:-1] + (S, LANES))


def eval_block(B, air0, plan_groups, K, frame, pv, t_coefs, singles, seqs,
               ccs, div_vals):
    """The per-tile constraint math — shared verbatim between this kernel's
    body and any caller that wants the XLA formulation.  All Felts carry
    same-shaped planes (or scalar 0-d constants); returns acc comps
    (tuple over ext components of limb-plane tuples)."""
    t_result = [None] * K
    air0.evaluate_transition(frame, pv, t_result)
    combined = None
    for k_i, ev in enumerate(t_result):
        term = B.vmul(t_coefs[k_i], ev.c)
        combined = term if combined is None else B.vadd(combined, term)

    columns = [combined]
    sv = sq = ci = 0
    cur_f = frame.current()
    for group in plan_groups:
        acc = None
        for seg, column, poly_len in group:
            assert seg == "main"
            state = cur_f[column].c
            if poly_len == 1:
                value = singles[sv]
                sv += 1
            else:
                value = seqs[sq]
                sq += 1
            diff = B.vsub(state, value)
            term = B.vmul(ccs[ci], diff)
            acc = term if acc is None else B.vadd(acc, term)
            ci += 1
        columns.append(acc)

    out = None
    for col, zt in zip(columns, div_vals):
        term = B.vmul(col, zt)
        out = term if out is None else B.vadd(out, term)
    return out


def pack_scalar_bank(B, t_main, singles, ccs, fp_stack, n, K):
    """(n, NS, 128) u32 bank in kernel row order: t_coefs, singles, ccs,
    final_power (all ext degree 1; trailing dim LANES-padded for Mosaic
    tiling, only lanes [0, k) populated)."""
    k = len(B.b_zeros((), np))
    rows = []
    for k_i in range(K):
        rows.append([np.asarray(l)[:, k_i] for l in t_main[0]])
    for s in singles:
        rows.append([np.asarray(l)[:, 0] for l in s[0]])
    for c in ccs:
        rows.append([np.asarray(l)[:, 0] for l in c[0]])
    rows.append([np.asarray(l) for l in fp_stack[0]])
    NS = len(rows)
    scal = np.zeros((n, NS, LANES), dtype=np.uint32)
    for r, planes in enumerate(rows):
        for l in range(k):
            scal[:, r, l] = planes[l]
    return scal


def build_call(B, air0, plan_groups, periodic_count, seq_count, n, w, K,
               n_singles, ce, BS=None, interpret=None):
    """Returns call(cur, nxt, periodic, seqs, div, scal) -> comps (ce,).

    cur/nxt: per-column lists of limb-plane tuples shaped (n, ce)
    periodic: per-column limb-plane tuples shaped (ce,) (ce-expanded)
    seqs:     per-table limb-plane tuples shaped (n, ce)
    div:      per-column limb-plane tuples shaped (ce,)
    scal:     (n, NS, k) u32 — rows of k-limb scalars per instance in the
              order [t_coefs (K), singles (n_singles), ccs (n_ccs),
              final_power (1)]
    All ext degrees 1 (gated by the caller)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from ..felt import Felt
    from ...air.transition import EvaluationFrame

    if interpret is None:
        interpret = INTERPRET
    if BS is None:
        BS = DEFAULT_BS
    S = ce // LANES
    k = len(B.b_zeros((), np))  # limb planes per element
    n_ccs = sum(len(g) for g in plan_groups)
    NS = K + n_singles + n_ccs + 1
    n_div = 1 + len(plan_groups)
    # scoped-VMEM plan: Mosaic's default 16 MB limit counts every input
    # block plus the body's live temporaries — the lamport-agg body
    # (268 input planes) measured 19.77 MB at BS=128 and OOMed it.  The
    # compiler params below raise the limit to 96 MB (same as ntt4), and
    # BS additionally halves until the input blocks fit 32 MB (any BS is
    # byte-identical: the grid only re-chunks the domain axis; the
    # per-point math and instance-accumulation order are unchanged).
    in_planes = (2 * w + periodic_count + seq_count + n_div + 1) * k
    while BS > 8 and in_planes * BS * LANES * 4 > 32 * 1024 * 1024:
        BS //= 2
    while BS > 1 and S % BS:
        BS //= 2
    grid = (S // BS, n)

    inst_spec = pl.BlockSpec((1, BS, LANES), lambda j, i: (i, j, 0))
    shared_spec = pl.BlockSpec((BS, LANES), lambda j, i: (j, 0))
    # scalar bank rides with a LANES-padded trailing dim (Mosaic wants
    # 128-lane tiles); only lanes [0, k) are populated
    scal_spec = pl.BlockSpec((1, NS, LANES), lambda j, i: (i, 0, 0))
    out_spec = pl.BlockSpec((BS, LANES), lambda j, i: (j, 0))

    def kernel(*refs):
        pos = 0

        def take(cnt):
            nonlocal pos
            r = refs[pos : pos + cnt]
            pos += cnt
            return r

        cur_refs = take(w * k)
        nxt_refs = take(w * k)
        per_refs = take(periodic_count * k)
        seq_refs = take(seq_count * k)
        div_refs = take(n_div * k)
        (scal_ref,) = take(1)
        out_refs = refs[pos:]
        assert len(out_refs) == k

        def inst_felt(group, idx):
            return Felt(
                (tuple(group[idx * k + l][0] for l in range(k)),), B=B
            )

        def shared_felt(group, idx):
            return Felt(
                (tuple(group[idx * k + l][:] for l in range(k)),), B=B
            )

        def scal_comps(row):
            return (tuple(scal_ref[0, row, l] for l in range(k)),)

        cur_f = [inst_felt(cur_refs, c) for c in range(w)]
        nxt_f = [inst_felt(nxt_refs, c) for c in range(w)]
        pv = [shared_felt(per_refs, c) for c in range(periodic_count)]
        seq_vals = [inst_felt(seq_refs, t).c for t in range(seq_count)]
        div_vals = [shared_felt(div_refs, d).c for d in range(n_div)]
        t_coefs = [scal_comps(r) for r in range(K)]
        singles = [scal_comps(K + r) for r in range(n_singles)]
        ccs = [scal_comps(K + n_singles + r) for r in range(n_ccs)]
        fp = scal_comps(K + n_singles + n_ccs)

        acc = eval_block(
            B, air0, plan_groups, K, EvaluationFrame(cur_f, nxt_f), pv,
            t_coefs, singles, seq_vals, ccs, div_vals,
        )
        acc = B.vmul(acc, fp)

        # accumulate across instances in the FIELD (carries couple the
        # limb planes, so the previous value is zeroed as a whole element)
        first = pl.program_id(1) == 0
        prev_c = (
            tuple(
                jnp.where(first, jnp.zeros_like(o[:]), o[:])
                for o in out_refs
            ),
        )
        summed = B.vadd(prev_c, acc)
        for o, plane in zip(out_refs, summed[0]):
            o[:] = plane

    def call(cur, nxt, periodic, seqs, div, scal):
        ops = []
        in_specs = []
        for col in cur:
            for plane in col[0]:
                ops.append(_as2d(plane, S))
                in_specs.append(inst_spec)
        for col in nxt:
            for plane in col[0]:
                ops.append(_as2d(plane, S))
                in_specs.append(inst_spec)
        for col in periodic:  # bare plane tuples (ce,)
            for plane in col:
                ops.append(_as2d(plane, S))
                in_specs.append(shared_spec)
        for tab in seqs:  # comps (n, ce), ext degree 1
            for plane in tab[0]:
                ops.append(_as2d(plane, S))
                in_specs.append(inst_spec)
        for tab in div:  # bare plane tuples (ce,)
            for plane in tab:
                ops.append(_as2d(plane, S))
                in_specs.append(shared_spec)
        ops.append(scal)
        in_specs.append(scal_spec)

        out_shape = [
            jax.ShapeDtypeStruct((S, LANES), np.uint32) for _ in range(k)
        ]
        out_specs = [out_spec] * k

        kwargs = {}
        if not interpret:
            from jax.experimental.pallas import tpu as pltpu

            # jax renamed TPUCompilerParams -> CompilerParams; support both
            cp = getattr(pltpu, "CompilerParams", None) or getattr(
                pltpu, "TPUCompilerParams"
            )
            kwargs["compiler_params"] = cp(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=96 * 1024 * 1024,
            )
        # the kernel body must not closure-capture constant arrays
        # (pallas_call rejects them); suppress the MXU matvec path, whose
        # int8 digit matrices would be exactly that, for the trace.  The
        # contextvar scope is reentrant/thread-safe (advisor r4); fall back
        # to the module global if an older mxu_ntt is loaded mid-upgrade.
        import contextlib

        from .. import mxu_ntt

        scope = getattr(mxu_ntt, "suppressed", None)
        if scope is None:
            @contextlib.contextmanager
            def scope():
                saved = mxu_ntt.SUPPRESS
                mxu_ntt.SUPPRESS = True
                try:
                    yield
                finally:
                    mxu_ntt.SUPPRESS = saved

        with scope():
            res = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_specs,
                out_shape=out_shape,
                interpret=interpret,
                **kwargs,
            )(*ops)
        return (tuple(r.reshape(ce) for r in res),)

    return call
