"""Multi-chip full proving pipeline — the distributed prover the reference
left as a hook (fri/src/proof.rs:93 num_partitions, README.md:43) built over
a jax.sharding.Mesh.

Gather-free design (round 2): no phase ever materializes an O(total)
array per device —

  P1 trace/aux commitment: instances ride the 'dp' axis for the local
     iNTT + coset LDE, then ONE all_to_all re-shards the LDE from
     instance-sharded to row-block-sharded (the six-step transpose of
     prover/src/matrix/segments.rs:232-271 lifted to ICI).  Each device
     hashes its contiguous row block into a Merkle subtree; only the d
     subtree roots are all_gathered (merkle/concurrent.rs:22-70 as
     collectives).  Per-device memory: O(n·w·L/d).
  P2/P5 constraint evaluation: runs directly on the row-sharded LDE —
     evaluation frames need only a ppermute of each block's first
     `blowup` rows from the ring neighbour.  Aux segments, periodic
     columns and per-instance boundary values are supported; the
     cross-instance final-coeff combination happens on-device (sum over
     the unsharded instance axis), which is byte-identical to the host's
     combine-after-interpolate because the iNTT is linear.
  P3 composition / DEEP LDE: coefficient columns are evaluated coset-by-
     coset (each device computes blowup/d cosets = length-sized NTTs),
     then one all_to_all interleaves cosets into contiguous natural-order
     row blocks (`sharded_lde_blocks`).
  P5/P6/P11 DEEP LDE + FRI (f64): the DEEP polynomial's LDE reuses the
     coset-sharded `sharded_lde_blocks`, and every FRI layer runs as one
     distributed transpose (GSPMD reshape+swapaxes — the blocked->strided
     reshard of fri/src/folding/mod.rs:85-117) followed by row-local
     hash/subtree/DRP-fold in a shard_map (`MeshFriProver`); tiny tail
     layers fall back to the host prover.

The remaining tail (OOD evaluation, DEEP coefficient build, queries) is
O(n·w·length) host work; the Fiat-Shamir channel is host-side (inherently
sequential, tiny).  f62/f128 run the sharded heavy phases and the generic
host tail (prover/pipeline.finish_proof).  Proof bytes are identical to
the host pipeline for every supported config (asserted in
tests/test_full_pipeline_mesh.py).
"""

from __future__ import annotations

import logging
import time
import warnings

import numpy as np

from ..air.transition import EvaluationFrame
from ..errors import ProverError
from ..ops.backend import get_backend
from ..ops.felt import Felt
from ..utils.transfer import pull_rows

logger = logging.getLogger("starkpack_winterfell_tpu.parallel")

# jitted kernels cached by static config — a fresh closure per prove call
# would miss jax's jit cache and pay a FULL (remote) recompile of every
# phase on every proof (the same pattern as prover/device_big._KERNEL_CACHE)
_KERNEL_CACHE: dict = {}


def _cached(key, make):
    if key not in _KERNEL_CACHE:
        _KERNEL_CACHE[key] = make()
    return _KERNEL_CACHE[key]


def _shard_map():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        from jax.experimental.shard_map import shard_map
    return shard_map


def _tmap(f, *trees):
    import jax

    return jax.tree.map(f, *trees)


def _replicated(mesh, tree):
    """Replicate every leaf across the mesh (one jitted identity with
    out_shardings=P()).  A bare np.asarray on a 'dp'-sharded array works on
    a single-process mesh but raises on a multi-process one (the array
    spans non-addressable devices) — every host pull of sharded state must
    go through this."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    k = _cached(
        ("replicate", mesh),
        lambda: jax.jit(
            lambda t: t, out_shardings=NamedSharding(mesh, P())
        ),
    )
    return k(tree)


class BatchedAuxRand:
    """AuxTraceRandElements stand-in whose segment elements are Felt arrays
    shaped (n, 1) — one row per instance — so AIR code written against
    scalar rand elements (air/src/air/mod.rs:470) runs unchanged inside the
    instance-batched kernels."""

    def __init__(self, segments):
        self._segments = segments

    def get_segment_elements(self, idx):
        return self._segments[idx]


# ---------------------------------------------------------------------------
# P1: sharded interpolate + LDE + combined-row commitment
# ---------------------------------------------------------------------------


def sharded_segment_commit(mesh, B, hasher, n, n_pad, w, length, blowup, offset,
                           deg):
    """Returns a jitted fn: comps (deg-tuple of limb-tuples) shaped
    (n_pad, w, length), sharded on the instance axis ->
      polys     instance-sharded (n_pad, w, length)
      lde_rows  row-block-sharded (n_pad, w, L)
      sub_levels / top_levels (Merkle levels; see assemble_levels)
    Only the first n instances are hashed into the combined rows
    (instances n..n_pad are zero padding so the mesh size divides)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    d = mesh.devices.size
    L = length * blowup
    rpd = L // d
    sub_depth = rpd.bit_length() - 1

    def local(comps):
        polys = B.interpolate_poly(comps)
        lde = B.evaluate_poly_with_offset(polys, offset, blowup)
        rows = _tmap(
            lambda a: jax.lax.all_to_all(a, "dp", split_axis=2, concat_axis=0,
                                         tiled=True),
            lde,
        )  # (n_pad, w, rpd) per device = global row block for all instances
        real = _tmap(lambda a: a[:n], rows)
        rt = _tmap(lambda a: jnp.transpose(a, (2, 0, 1)).reshape(rpd, n * w),
                   real)
        words = B.rows_to_words(rt, deg)
        leaves = hasher.hash_words(words, n * w * deg * B.ELEMENT_BYTES)
        sub_levels = [leaves]
        cur = leaves
        for _ in range(sub_depth):
            cur = hasher.merge_words(cur[0::2], cur[1::2])
            sub_levels.append(cur)
        roots = jax.lax.all_gather(cur[0], "dp", axis=0)  # (d, words) replicated
        top_levels = [roots]
        top = roots
        while top.shape[0] > 1:
            top = hasher.merge_words(top[0::2], top[1::2])
            top_levels.append(top)
        return polys, rows, sub_levels, top_levels

    fn = _shard_map()(
        local,
        mesh=mesh,
        in_specs=(P("dp"),),
        out_specs=(P("dp"), P(None, None, "dp"), [P("dp")] * (sub_depth + 1),
                   P()),
        check_rep=False,
    )
    return jax.jit(fn)


def assemble_levels(sub_levels, top_levels):
    """Per-device subtree levels (gathered along axis 0 by the sharding) and
    the replicated top-of-tree -> full Merkle level list (bottom first).

    Levels are NOT materialized on host: MerkleTree gathers lazily (one
    batched device gather per prove_batch), so committing a 2^23-leaf tree
    never ships ~0.5 GB of digests through the tunnel."""
    levels = list(sub_levels)
    for t in top_levels[1:]:
        levels.append(t)
    return levels


# ---------------------------------------------------------------------------
# P3: sharded coset LDE of coefficient columns (composition / DEEP)
# ---------------------------------------------------------------------------


def sharded_lde_blocks(mesh, B, C, length, blowup, offset, hasher=None,
                       deg=1):
    """Returns a jitted fn: coefficient columns (C, length) comps, replicated
    -> evals (C, L) comps sharded on the last axis by contiguous blocks.

    Each device evaluates blowup/d cosets (natural index i = q*blowup + r is
    coset r element q: x_i = (offset*g_L^r) * g_len^q), then one all_to_all
    interleaves cosets into natural-order row blocks — the reference's
    per-chunk coset evaluation (math/src/fft/serial.rs:26-57) with the
    interleave as ICI communication.

    With hasher set, also row-hashes the blocks into Merkle levels
    (constraint commitment, prover/src/lib.rs:680-715)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    d = mesh.devices.size
    L = length * blowup
    rpd = L // d
    if blowup % d != 0 or length % d != 0:
        raise ProverError(
            f"sharded LDE needs mesh size {d} to divide blowup {blowup} and "
            f"length {length}"
        )
    b_loc = blowup // d
    sub_depth = rpd.bit_length() - 1

    # offsets table: T[r, j] = (offset * g_L^r)^j, sharded on the coset axis
    g_L = B.get_root_of_unity(L.bit_length() - 1)
    rows = []
    for r in range(blowup):
        o_r = (offset * pow(g_L, r, B.P)) % B.P
        rows.append(B.power_series(o_r, length))
    offs_tab = tuple(
        np.stack([rows[r][li] for r in range(blowup)])
        for li in range(len(rows[0]))
    )  # limb tuple of (blowup, length)

    def local(comps, offs):
        # comps: deg-tuple of limb-tuples (C, length), replicated
        # offs: limb tuple (b_loc, length) — this device's cosets
        # scaled = comps * offs with broadcasting -> (b_loc, C, length)
        scaled = tuple(
            B.bmul(
                tuple(l[None, :, :] for l in c),
                tuple(o[:, None, :] for o in offs),
            )
            for c in comps
        )
        evals = B.evaluate_poly_with_offset(scaled, 1, 1)  # plain NTT, last axis
        a2a = _tmap(
            lambda a: jax.lax.all_to_all(a, "dp", split_axis=2, concat_axis=0,
                                         tiled=True),
            evals,
        )  # (blowup, C, length/d)
        # natural-order rows: out[c, q*blowup + r] = a2a[r, c, q]
        out = _tmap(
            lambda a: jnp.transpose(a, (1, 2, 0)).reshape(C, rpd), a2a
        )
        if hasher is None:
            return out
        rt = _tmap(lambda a: a.T, out)  # (rpd, C)
        words = B.rows_to_words(rt, deg)
        leaves = hasher.hash_words(words, C * deg * B.ELEMENT_BYTES)
        sub_levels = [leaves]
        cur = leaves
        for _ in range(sub_depth):
            cur = hasher.merge_words(cur[0::2], cur[1::2])
            sub_levels.append(cur)
        roots = jax.lax.all_gather(cur[0], "dp", axis=0)
        top_levels = [roots]
        top = roots
        while top.shape[0] > 1:
            top = hasher.merge_words(top[0::2], top[1::2])
            top_levels.append(top)
        return out, sub_levels, top_levels

    out_lde = P(None, "dp")
    if hasher is None:
        out_specs = out_lde
    else:
        out_specs = (out_lde, [P("dp")] * (sub_depth + 1), P())
    fn = _shard_map()(
        local,
        mesh=mesh,
        in_specs=(P(), P("dp")),
        out_specs=out_specs,
        check_rep=False,
    )
    jitted = jax.jit(fn)
    # device-resident once — re-uploading the (blowup, length) offsets table
    # per prove call is 100+ MB of host->device traffic at 2^20 limb configs
    from jax.sharding import NamedSharding

    offs_dev = tuple(
        jax.device_put(o, NamedSharding(mesh, P("dp", None)))
        for o in offs_tab
    )
    return lambda comps: jitted(comps, offs_dev)


# ---------------------------------------------------------------------------
# P2/P5: sharded constraint evaluation on the row-sharded LDE
# ---------------------------------------------------------------------------


def _frames_from_rows(comps, shift, blowup, d, w):
    """Evaluation frames from a row-block-sharded LDE: the current frame is a
    local strided slice; the next frame needs the first `blowup` rows of the
    ring neighbour's block (one ppermute — the only communication)."""
    import jax
    import jax.numpy as jnp

    perm = [(i, (i - 1) % d) for i in range(d)]

    def front(a):
        return jax.lax.ppermute(a[:, :, :blowup], "dp", perm=perm)

    nbr = _tmap(front, comps)
    ext = _tmap(lambda a, m: jnp.concatenate([a, m], axis=2), comps, nbr)
    cur = _tmap(lambda a: a[:, :, ::shift], comps)
    nxt = _tmap(lambda a: a[:, :, blowup::shift], ext)
    return cur, nxt


def _felt_columns(comps, w, B):
    """(n, w, pts) comps -> list of per-column Felts shaped (n, pts)."""
    return [
        Felt(tuple(tuple(l[:, wi] for l in c) for c in comps), B=B)
        for wi in range(w)
    ]


def sharded_constraint_phase(mesh, B, air0, domain, ext_deg, n, plan):
    """Returns call(main_rows, aux_rows, stacks) -> final_comb (ce,) comps
    sharded over 'dp'.  `plan` is the static structure from _build_plan.
    The per-device body is the instance-batched evaluator of
    prover/device.py restricted to its ce block."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    d = mesh.devices.size
    ce = domain.ce_size
    shift = domain.ce_to_lde_blowup
    blowup = domain.trace_to_lde_blowup
    ce_loc = ce // d

    K_main = len(plan["t_main_idx"])
    K_aux = len(plan["t_aux_idx"])
    has_aux = plan["has_aux"]
    w_main = plan["w_main"]
    w_aux = plan["w_aux"]

    def local(main_rows, aux_rows, t_main, t_aux, singles, seqs, ccs,
              aux_rand, final_powers, div_tabs, periodic_tabs):
        cur_m, nxt_m = _frames_from_rows(main_rows, shift, blowup, d, w_main)
        cur_f = _felt_columns(cur_m, w_main, B)
        nxt_f = _felt_columns(nxt_m, w_main, B)
        frame = EvaluationFrame(cur_f, nxt_f)
        pv = [
            Felt((tuple(jnp.broadcast_to(l[None, :], (n, ce_loc)) for l in c),),
                 B=B)
            for c in periodic_tabs
        ]

        t_result = [None] * K_main
        air0.evaluate_transition(frame, pv, t_result)
        combined = B.vzeros((n, ce_loc), ext_deg, jnp)
        for k_i, ev in enumerate(t_result):
            coef = tuple(tuple(l[:, k_i : k_i + 1] for l in c) for c in t_main)
            combined = B.vadd(combined, B.vmul(coef, ev.c))

        aux_cur_f = None
        if has_aux:
            cur_a, nxt_a = _frames_from_rows(aux_rows, shift, blowup, d, w_aux)
            aux_cur_f = _felt_columns(cur_a, w_aux, B)
            aux_nxt_f = _felt_columns(nxt_a, w_aux, B)
            aux_frame = EvaluationFrame(aux_cur_f, aux_nxt_f)
            rand = BatchedAuxRand(
                [[Felt(e, B=B) for e in seg] for seg in aux_rand]
            )
            a_result = [None] * K_aux
            air0.evaluate_aux_transition(frame, aux_frame, pv, rand, a_result)
            for k_i, ev in enumerate(a_result):
                coef = tuple(tuple(l[:, k_i : k_i + 1] for l in c)
                             for c in t_aux)
                combined = B.vadd(combined, B.vmul(coef, ev.c))

        columns = [combined]
        sv = sq = ci = 0
        for group in plan["groups"]:
            acc = B.vzeros((n, ce_loc), ext_deg, jnp)
            for seg, column, poly_len in group:
                state = (cur_f if seg == "main" else aux_cur_f)[column].c
                if poly_len == 1:
                    value = singles[sv]
                    sv += 1
                else:
                    value = seqs[sq]
                    sq += 1
                diff = B.vsub(state, value)
                acc = B.vadd(acc, B.vmul(ccs[ci], diff))
                ci += 1
            columns.append(acc)

        acc = B.vzeros((n, ce_loc), ext_deg, jnp)
        for col, zt in zip(columns, div_tabs):
            acc = B.vadd(acc, B.vmul(B.promote(col, ext_deg), (zt,)))

        # cross-instance final-coeff combination (byte-identical to the
        # host's combine-after-interpolate since the iNTT is linear)
        fp = tuple(tuple(l[:, None] for l in c) for c in final_powers)
        weighted = B.vmul(acc, fp)
        return B.vsum(weighted, axis=0)  # (ce_loc,)

    rows_spec = P(None, None, "dp")
    fn = _shard_map()(
        local,
        mesh=mesh,
        in_specs=(rows_spec, rows_spec if has_aux else P(), P(), P(), P(),
                  P(None, "dp"), P(), P(), P(), P("dp"), P("dp")),
        out_specs=P("dp"),
        check_rep=False,
    )
    # replicated output: np.asarray on a 'dp'-sharded XLA:CPU output
    # deadlocks the SPMD runtime (round-1 finding, kept from the previous
    # formulation) — the internal all-gather of a (ce,)-sized vector is free
    from jax.sharding import NamedSharding

    return jax.jit(fn, out_shardings=NamedSharding(mesh, P()))


def _pcons_gate(d, plan, ext_deg, spec, n, domain):
    """Fused-Pallas constraint-kernel eligibility (ops/pallas/cons_kernel):
    single device, main segment only, no field extension, limb field, and
    a ce domain that tiles (BS, 128).  Everything else keeps the XLA
    formulation."""
    from ..ops.pallas import cons_kernel

    return (
        d == 1
        and not plan["has_aux"]
        and ext_deg == 1
        and spec.name in ("f64", "f62", "f128")
        and domain.ce_size % (128 * 8) == 0
        and cons_kernel.enabled()
    )


def pallas_constraint_phase(B, air0, domain, ext_deg, n, plan,
                            interpret=None):
    """Single-device fused constraint evaluation: frame slicing in XLA, the
    whole constraint body as ONE pallas kernel (ops/pallas/cons_kernel).
    Same operands as sharded_constraint_phase's jitted call except the
    per-instance scalars arrive packed as one (n, NS, k) u32 bank.
    Byte-identical to the XLA path (tests/test_cons_kernel.py)."""
    import jax
    import jax.numpy as jnp

    from ..ops.pallas import cons_kernel

    ce = domain.ce_size
    shift = domain.ce_to_lde_blowup
    blowup = domain.trace_to_lde_blowup
    w = plan["w_main"]
    K = len(plan["t_main_idx"])
    groups = [tuple(g) for g in plan["groups"]]
    n_singles = sum(1 for g in groups for (_, _, pl_len) in g if pl_len == 1)
    seq_count = sum(1 for g in groups for (_, _, pl_len) in g if pl_len > 1)
    periodic_count = len(plan["periodic_tabs"])

    call = cons_kernel.build_call(
        B, air0, groups, periodic_count, seq_count, n, w, K, n_singles,
        ce, interpret=interpret,
    )

    def fn(main_rows, seqs, scal, div_tabs, periodic_tabs):
        # frames from the (n, w, L) LDE rows — d == 1, so the ring
        # neighbour of _frames_from_rows is the block itself
        def cols(comps, sl):
            out = []
            for c in range(w):
                planes = []
                for comp in comps:
                    for l in comp:
                        le = jnp.concatenate([l, l[:, :, :blowup]], axis=2)
                        planes.append(sl(le)[:, c])
                out.append((tuple(planes),))
            return out

        cur_cols = cols(main_rows, lambda le: le[:, :, : -blowup : shift])
        nxt_cols = cols(main_rows, lambda le: le[:, :, blowup::shift])
        return call(cur_cols, nxt_cols, periodic_tabs, seqs, div_tabs, scal)

    return jax.jit(fn)


def _pack_scalar_bank(B, t_main, singles, ccs, fp_stack, n, K):
    from ..ops.pallas.cons_kernel import pack_scalar_bank

    return pack_scalar_bank(B, t_main, singles, ccs, fp_stack, n, K)


def _build_plan(air0, template, domain, ext_deg, B, compact_periodic=False):
    """Static constraint structure shared by all instances: boundary groups
    in host-evaluator order (main groups, then aux groups merged into a
    main group with an equal divisor or appended —
    prover/src/constraints/boundary.rs:30-39), plus divisor and periodic
    tables over the ce domain."""
    from ..air.divisors import ConstraintDivisor
    from ..prover.constraints import (
        PeriodicValueTable,
        _exemptions_eval,
        _inv_divisor_numerator,
    )

    ce = domain.ce_size
    groups = []
    divisors = [
        ConstraintDivisor.from_transition(
            domain.trace_length, air0.context.num_transition_exemptions,
            B.spec,
        )
    ]
    for g in template.main_constraints:
        groups.append([("main", c.column, len(c.poly)) for c in g.constraints])
        divisors.append(g.divisor)
    has_aux = bool(template.aux_constraints)
    for g in template.aux_constraints:
        entry = [("aux", c.column, len(c.poly)) for c in g.constraints]
        for gi in range(1, len(divisors)):
            if divisors[gi] == g.divisor:
                groups[gi - 1].extend(entry)
                break
        else:
            groups.append(entry)
            divisors.append(g.divisor)

    div_tables = []
    for dv in divisors:
        z = _inv_divisor_numerator(dv, domain)
        m = z[0].shape[0]
        idx = np.arange(ce) % m
        zfull = tuple(np.asarray(l)[idx] for l in z)
        if dv.exemptions:
            zfull = B.bmul(zfull, _exemptions_eval(dv, domain))
        div_tables.append(tuple(np.asarray(l) for l in zfull))

    if compact_periodic:
        # natural-period tables for the coset-streamed kernels: the (ce,)
        # expansion of the lamport-agg columns is 3.6 GB at ce = 2^23
        from .streamed import compact_periodic_tables

        periodic_tabs = compact_periodic_tables(air0, B)
    else:
        # PeriodicValueTable columns are already expanded to (ce,) tuples
        periodic = PeriodicValueTable(air0, B)
        periodic_tabs = [tuple(np.asarray(l) for l in c)
                         for c in periodic.columns]

    tc = air0.get_transition_constraints(
        [0] * air0.context.num_transition_constraints()
    )
    return {
        "groups": groups,
        "div_tables": div_tables,
        "periodic_tabs": periodic_tabs,
        # content key for caching the device residency of the tables: they
        # are fully determined by the divisor parameters + the AIR's
        # periodic columns (keyed like the PeriodicValueTable cache)
        "tables_key": (
            tuple((tuple(map(tuple, d.numerator)), tuple(d.exemptions))
                  for d in divisors),
            type(air0).__qualname__,
            getattr(air0, "periodic_cache_key", lambda: ())(),
        ),
        "has_aux": has_aux,
        "w_main": None,
        "w_aux": None,
        "t_main_idx": list(range(tc.num_main_constraints())),
        "t_aux_idx": list(range(tc.num_aux_constraints())),
    }


def _stack_elems(B, rows, deg):
    """rows: list (n) of lists (k) of field elements -> comps shaped (n, k)."""
    n, k = len(rows), len(rows[0])
    flat = [e for row in rows for e in row]
    comps = B.elems_to_limbs(flat, deg)
    return tuple(tuple(np.asarray(l).reshape(n, k) for l in c) for c in comps)


def _stack_group_values(plan, per_instance, domain, air0, B, ext_deg,
                        seq_coeffs=False):
    """Per-instance boundary values + composition coefficients stacked in
    kernel walk order.  Values: singles as (n, 1) comps, sequence polys as
    their (n, ce) ce-domain evaluations; ccs as (n, 1) ext comps.

    seq_coeffs=True returns sequence entries as (coeffs (n, m) comps,
    off_eff, m) instead of host-evaluated (n, ce) tables: the caller
    evaluates them ON DEVICE (evaluating at offset off*g_ce^-step_offset is
    exactly the host's evaluate-then-roll — same canonical values).  The
    host eval + upload is O(n_inst * ce) per prove (the polys depend on pub
    inputs, so it cannot be config-cached) — 25 MB per prove at lamport
    agg-64, 400 MB at agg-1024."""
    n = len(per_instance)
    ce = domain.ce_size
    singles, seqs, ccs = [], [], []

    # map plan walk order back to (segment, group index, constraint index):
    # plan groups were built as main groups (extended by merged aux) then
    # appended aux groups; recover per-constraint source by walking the
    # same construction.
    template = per_instance[0]
    plan_positions = []  # parallel to plan["groups"]: list of lists
    for gi, g in enumerate(template.main_constraints):
        plan_positions.append([("main", gi, ci) for ci in range(len(g.constraints))])
    divisors = [None] + [g.divisor for g in template.main_constraints]
    for gi, g in enumerate(template.aux_constraints):
        entry = [("aux", gi, ci) for ci in range(len(g.constraints))]
        for di in range(1, len(divisors)):
            if divisors[di] == g.divisor:
                plan_positions[di - 1].extend(entry)
                break
        else:
            plan_positions.append(entry)
            divisors.append(g.divisor)

    for group in plan_positions:
        for src, gi, ci in group:
            cons = [
                (b.main_constraints if src == "main" else b.aux_constraints)[
                    gi
                ].constraints[ci]
                for b in per_instance
            ]
            val_deg = 1 if src == "main" else ext_deg
            c0 = cons[0]
            if len(c0.poly) == 1:
                singles.append(
                    _stack_elems(B, [[c.poly[0]] for c in cons], val_deg)
                )
            elif seq_coeffs:
                m = len(c0.poly)
                base_off = air0.domain_offset() if m < ce else 1
                so = c0.poly_offset[0] * air0.ce_blowup_factor()
                g_ce = B.get_root_of_unity(ce.bit_length() - 1)
                off_eff = (base_off * pow(g_ce, -so, B.P)) % B.P
                coeffs = _stack_elems(B, [list(c.poly) for c in cons],
                                      val_deg)
                seqs.append((coeffs, off_eff, m))
            else:
                rows = []
                for c in cons:
                    limbs = B.elems_to_limbs(c.poly, val_deg)
                    m = len(c.poly)
                    if m < ce:
                        evals = B.evaluate_poly_with_offset(
                            limbs, air0.domain_offset(), ce // m
                        )
                    else:
                        evals = B.evaluate_poly_with_offset(limbs, 1, 1)
                    step_offset = c.poly_offset[0] * air0.ce_blowup_factor()
                    mlen = evals[0][0].shape[0]
                    idx = (np.arange(ce) - step_offset) % mlen
                    rows.append(
                        tuple(tuple(np.asarray(l)[idx] for l in comp)
                              for comp in evals)
                    )
                # stack instance rows: comps (n, ce)
                deg_here = len(rows[0])
                seqs.append(
                    tuple(
                        tuple(
                            np.stack([rows[i][cd][ld] for i in range(n)])
                            for ld in range(len(rows[0][cd]))
                        )
                        for cd in range(deg_here)
                    )
                )
            ccs.append(_stack_elems(B, [[c.cc] for c in cons], ext_deg))
    return singles, seqs, ccs


# ---------------------------------------------------------------------------
# Orchestration
# ---------------------------------------------------------------------------


def prove_mesh(prover, n: int, traces, mesh):
    """Full StarkPack proof with every heavy phase sharded over the mesh;
    byte-identical to Prover.prove on the host.  Supports aux segments and
    any n (instances are zero-padded to a multiple of the mesh size)."""
    import jax
    import jax.numpy as jnp

    from ..crypto.merkle import MerkleTree
    from ..math import scalar as _fs
    from ..prover.channel import ProverChannel
    from ..prover.domain import StarkDomain
    from ..prover.pipeline import finish_proof
    from ..air.air import AuxTraceRandElements

    _t0 = time.perf_counter()

    def _mark(phase):
        nonlocal _t0
        logger.debug("%s in %.0f ms", phase, (time.perf_counter() - _t0) * 1e3)
        _t0 = time.perf_counter()

    d = mesh.devices.size
    options = prover.options()
    ext_deg = options.field_extension
    hasher = prover.hasher
    pub_inputs_vec = [prover.get_pub_inputs(t) for t in traces]
    pub_elements_vec = [p.to_elements() for p in pub_inputs_vec]
    airs = [
        prover.air_class(t.get_info(), p, options)
        for t, p in zip(traces, pub_inputs_vec)
    ]
    spec = airs[0].field_spec()
    B = get_backend(spec.name)
    channel = ProverChannel(n, airs, pub_elements_vec, hasher, ext_deg, spec)
    domain = StarkDomain(airs[0], B)
    w, length = traces[0].width, traces[0].length
    if any(t.length != length for t in traces):
        raise ProverError("prove_mesh requires equal trace lengths")
    blowup = domain.trace_to_lde_blowup
    L = domain.lde_size
    offset = domain.domain_offset
    n_pad = ((n + d - 1) // d) * d

    # HBM plan: configs whose one-shot pipeline would exceed the chip's
    # memory run the coset-streamed kernels instead (same bytes out)
    from . import streamed as _streamed

    layout = traces[0].get_info().layout
    w_eff = w + sum(layout.aux_segment_widths) * ext_deg
    stream = spec.name != "f64" and _streamed.should_stream(
        n_pad, w_eff, length, blowup, B.ELEMENT_BYTES, d
    )
    # fail fast (pre-trace) when the one-shot path cannot fit the budget
    _streamed.preflight_check(n_pad, w_eff, length, blowup,
                              B.ELEMENT_BYTES, d, stream)
    offs_dev = None

    # ---- P1: sharded main-trace commitment ----
    built = [t.device_planes() for t in traces]
    if all(b is not None for b in built):
        # device-built planes (TraceTable.set_device_builder): only the
        # trace skeleton / signature elements crossed the ~10-20 MB/s
        # tunnel; builders return the limb tuple of (w, length) u32 arrays
        # matching main_segment_limbs()[0]
        nl = len(built[0])
        arrs = [jnp.stack([b[l] for b in built]) for l in range(nl)]
        if n_pad > n:
            arrs = [
                jnp.concatenate(
                    [a, jnp.zeros((n_pad - n,) + a.shape[1:], a.dtype)]
                )
                for a in arrs
            ]
        stacked = (tuple(arrs),)
    else:
        main_segments = [t.main_segment_limbs(B) for t in traces]
        stacked = _stack_segments(main_segments, n_pad)
    if stream:
        commit = _streamed.streamed_segment_commit(
            B, hasher, n, w, length, blowup, offset, 1, _cached
        )
        polys_dev, levels, offs_dev = commit(stacked)
        lde_rows = None
        main_tree = MerkleTree(levels, hasher)
    else:
        k1 = _cached(
            ("seg", mesh, B.spec.name, hasher, n, n_pad, w, length, blowup,
             offset, 1),
            lambda: sharded_segment_commit(mesh, B, hasher, n, n_pad, w,
                                           length, blowup, offset, 1),
        )
        polys_dev, lde_rows, sub_l, top_l = k1(stacked)
        main_tree = MerkleTree(assemble_levels(sub_l, top_l), hasher)
    channel.commit_trace(main_tree.root())
    _mark("P1 sharded main-trace commit")

    # ---- aux segments ----
    aux_trees = []
    aux_rows_list = []
    aux_polys_dev = []
    aux_widths = []
    aux_rand_objs = [AuxTraceRandElements() for _ in range(n)]
    for seg_idx in range(traces[0].num_aux_segments()):
        aux_segments = []
        for i, trace in enumerate(traces):
            rand_elements = channel.get_aux_trace_segment_rand_elements(seg_idx)
            aux_rand_objs[i].add_segment_elements(rand_elements)
            aux_segments.append(trace.build_aux_segment(seg_idx, rand_elements))
        w_aux = aux_segments[0][0][0].shape[0]
        aux_widths.append(w_aux)
        stacked_aux = _stack_segments(aux_segments, n_pad)
        if stream:
            commit_a = _streamed.streamed_segment_commit(
                B, hasher, n, w_aux, length, blowup, offset, ext_deg,
                _cached,
            )
            apolys, alevels, _ = commit_a(stacked_aux)
            aux_tree = MerkleTree(alevels, hasher)
            arows = None
        else:
            k1a = _cached(
                ("seg", mesh, B.spec.name, hasher, n, n_pad, w_aux, length,
                 blowup, offset, ext_deg),
                lambda: sharded_segment_commit(mesh, B, hasher, n, n_pad,
                                               w_aux, length, blowup,
                                               offset, ext_deg),
            )
            apolys, arows, asub, atop = k1a(stacked_aux)
            aux_tree = MerkleTree(assemble_levels(asub, atop), hasher)
        channel.commit_trace(aux_tree.root())
        aux_trees.append(aux_tree)
        aux_rows_list.append(arows)
        aux_polys_dev.append(apolys)
        _mark("P1b sharded aux commit")

    # ---- P2/P5: sharded constraint evaluation ----
    tc_list, boundary_list = [], []
    for i in range(n):
        cc = channel.get_constraint_composition_coeffs()
        tc_list.append(airs[i].get_transition_constraints(cc.transition))
        boundary_list.append(
            airs[i].get_boundary_constraints(aux_rand_objs[i], cc.boundary)
        )
    final_coeff = channel.get_final_polynomial_coeffs()
    final_powers = [spec.fexp(final_coeff, i) for i in range(n)]

    # the plan's group structure and divisor/periodic tables depend only on
    # the configuration (AIR type + sizes), not on pub-input values or the
    # per-prove composition coefficients — rebuilding them cost O(ce) host
    # limb math (power series + batch inversions) on EVERY prove.  The
    # round-4 agg64 profile measured 0.78 s of device time inside a 6 s
    # steady prove: host table building was a top cost.
    plan = _cached(
        ("plan", B.spec.name, type(airs[0]).__qualname__, n, w,
         domain.trace_length, domain.ce_size, ext_deg, stream,
         getattr(airs[0], "periodic_cache_key", lambda: ())()),
        lambda: _build_plan(airs[0], boundary_list[0], domain, ext_deg, B,
                            compact_periodic=stream),
    )
    plan["w_main"] = w
    plan["w_aux"] = aux_widths[0] if aux_widths else None
    singles, seq_specs, ccs = _stack_group_values(
        plan, boundary_list, domain, airs[0], B, ext_deg, seq_coeffs=True
    )
    # sequence-assertion tables are (n, ce)-sized and pub-input-dependent:
    # evaluate them on device from the (n, m) coefficient stacks (the
    # streamed kernels evaluate them per coset in-kernel instead)
    seqs = []
    if not stream:
        for coeffs, off_eff, m in seq_specs:
            k_seq = _cached(
                ("seqeval", mesh, B.spec.name, n, m, domain.ce_size, off_eff,
                 len(coeffs)),
                lambda off_eff=off_eff, m=m: jax.jit(
                    lambda c: B.evaluate_poly_with_offset(
                        c, off_eff, domain.ce_size // m)),
            )
            seqs.append(k_seq(coeffs))
    t_main = _stack_elems(
        B, [t.main_constraint_coef for t in tc_list], ext_deg
    )
    t_aux = (
        _stack_elems(B, [t.aux_constraint_coef for t in tc_list], ext_deg)
        if plan["has_aux"] and tc_list[0].num_aux_constraints()
        else ()
    )
    aux_rand_stacks = []
    if plan["has_aux"]:
        for seg_idx in range(traces[0].num_aux_segments()):
            n_r = len(aux_rand_objs[0].get_segment_elements(seg_idx))
            seg = []
            for e_idx in range(n_r):
                seg.append(
                    _stack_elems(
                        B,
                        [[aux_rand_objs[i].get_segment_elements(seg_idx)[e_idx]]
                         for i in range(n)],
                        ext_deg,
                    )
                )
            aux_rand_stacks.append(seg)
    fp_stack = _stack_elems(B, [[p] for p in final_powers], ext_deg)
    fp_stack = tuple(tuple(l[:, 0] for l in c) for c in fp_stack)  # (n,)

    # the divisor/periodic tables are per-CONFIG constants over the ce
    # domain (tens of MB at 2^16+): keep them device-resident across proofs
    # instead of re-shipping numpy arrays through the ~10-20 MB/s tunnel on
    # every prove
    import jax as _jax

    div_dev, per_dev = _cached(
        ("plantables", mesh, B.spec.name, domain.trace_length,
         domain.ce_size, ext_deg, plan["tables_key"]),
        lambda: (
            [tuple(_jax.device_put(np.asarray(l)) for l in t)
             for t in plan["div_tables"]],
            [tuple(_jax.device_put(np.asarray(l)) for l in t)
             for t in plan["periodic_tabs"]],
        ),
    )

    if stream:
        seq_stacks = [s[0] for s in seq_specs]
        seq_meta = [(s[1], s[2]) for s in seq_specs]
        cons_call = _streamed.streamed_constraint_kernel(
            B, airs[0], domain, ext_deg, n, plan, seq_meta, _cached
        )
        final_comb_dev = cons_call(
            polys_dev, offs_dev, t_main, singles, seq_stacks, ccs,
            fp_stack, div_dev, per_dev,
            aux_polys=tuple(aux_polys_dev), t_aux=t_aux,
            aux_rand_stacks=tuple(tuple(s) for s in aux_rand_stacks),
        )
        main_rows_n = None
    elif _pcons_gate(d, plan, ext_deg, spec, n, domain):
        k2p = _cached(
            ("pcons", mesh, B.spec.name, type(airs[0]).__qualname__,
             domain.trace_length, domain.ce_size, n, w,
             tuple(tuple(g) for g in plan["groups"])),
            lambda: pallas_constraint_phase(B, airs[0], domain, ext_deg, n,
                                            plan),
        )
        scal = _pack_scalar_bank(
            B, t_main, singles, ccs, fp_stack, n,
            len(plan["t_main_idx"]),
        )
        main_rows_n = _tmap(lambda a: a[:n], lde_rows)
        final_comb_dev = k2p(main_rows_n, seqs, scal, div_dev, per_dev)
    else:
        k2 = _cached(
            ("cons", mesh, B.spec.name, type(airs[0]).__qualname__,
             domain.trace_length, domain.ce_size, ext_deg, n, w,
             plan["w_aux"], tuple(tuple(g) for g in plan["groups"])),
            lambda: sharded_constraint_phase(mesh, B, airs[0], domain,
                                             ext_deg, n, plan),
        )
        main_rows_n = _tmap(lambda a: a[:n], lde_rows)
        aux_rows_n = (
            _tmap(lambda a: a[:n], aux_rows_list[0]) if plan["has_aux"]
            else ()
        )
        final_comb_dev = k2(
            main_rows_n, aux_rows_n, t_main, t_aux, singles, seqs, ccs,
            aux_rand_stacks, fp_stack, div_dev, per_dev,
        )
    _mark("P2/P5 sharded constraint evaluation")

    # ---- P3: composition poly + sharded LDE/commitment ----
    ce = domain.ce_size
    trace_length = domain.trace_length
    num_cols = airs[0].context.num_constraint_composition_columns()
    # the device OOD/DEEP tail pays off when the coefficient tables are big
    # (tunnel transfers + host limb math); tiny configs keep the host tail,
    # whose kernels compile instantly (XLA:CPU compiles of the deep-kernel
    # graphs dominate test wall-clock otherwise)
    limb_tail = spec.name != "f64" and domain.trace_length >= 4096
    if limb_tail:
        # interpolate the combined evaluations ON DEVICE (the limb
        # four-step NTT builds its tables in-graph from tiny constants);
        # the coefficient table never leaves the device
        import jax as _jax

        def _comp_cols_kernel(fc):
            coeffs = B.interpolate_poly_with_offset(fc, offset)
            return tuple(
                B.cmap(
                    lambda l: l.reshape(ce // trace_length,
                                        trace_length)[:num_cols], c)
                for c in B.promote(coeffs, ext_deg)
            )

        k2b = _cached(
            ("compcols", mesh, spec.name, ce, trace_length, num_cols,
             ext_deg, offset),
            lambda: _jax.jit(_comp_cols_kernel),
        )
        comp_columns = k2b(final_comb_dev)
    else:
        final_comb = tuple(
            tuple(np.asarray(l) for l in c) for c in final_comb_dev
        )
        coeffs = B.interpolate_poly_with_offset(final_comb, offset)
        comp_columns = tuple(
            B.cmap(
                lambda l: l.reshape(ce // trace_length,
                                    trace_length)[:num_cols], c)
            for c in B.promote(coeffs, ext_deg)
        )
    comp_blowup = L // trace_length
    if stream:
        # comp columns share the main trace's length and blowup, so the
        # P1 offsets table serves the per-coset composition commit too
        assert comp_blowup == blowup and trace_length == length
        comp_levels = _streamed.streamed_comp_commit(
            B, hasher, num_cols, trace_length, comp_blowup, ext_deg,
            _cached, offs_dev,
        )(comp_columns)
        constraint_tree = MerkleTree(comp_levels, hasher)
        comp_lde_rows = None
    else:
        k3 = _cached(
            ("lde", mesh, B.spec.name, num_cols, trace_length, comp_blowup,
             offset, hasher, ext_deg),
            lambda: sharded_lde_blocks(mesh, B, num_cols, trace_length,
                                       comp_blowup, offset, hasher=hasher,
                                       deg=ext_deg),
        )
        comp_lde_rows, csub, ctop = k3(comp_columns)
        constraint_tree = MerkleTree(assemble_levels(csub, ctop), hasher)
    channel.commit_constraints(constraint_tree.root())
    _mark("P3 sharded composition LDE + commit")

    # ---- tail: OOD + DEEP + FRI + queries ----
    ood_fn = deep_fn = None
    traces_polys = None
    if limb_tail:
        # limb fields evaluate OOD states and build the DEEP composition
        # polynomial ON DEVICE (the coefficient tables — hundreds of MB at
        # 2^20 — never cross the tunnel; only the tiny OOD values do).
        # Kernels run over all n_pad instances — slicing the dp-sharded
        # instance axis eagerly deadlocks the SPMD runtime (round-1
        # finding); padded instances have zero polys and zero cc weights,
        # so they contribute exactly nothing
        ood_fn, deep_fn = _limb_tail_kernels(
            mesh, B, spec, ext_deg, n, polys_dev, aux_polys_dev,
            comp_columns, domain, airs,
        )
    else:
        # f64: materialize the coefficient tables to the host exactly once
        # (they feed the host OOD/DEEP math)
        polys_h = _tmap(lambda a: np.asarray(a)[:n],
                        _replicated(mesh, polys_dev))
        aux_polys_h = [
            _tmap(np.asarray, _replicated(mesh, ap)) for ap in aux_polys_dev
        ]
        traces_polys = [
            {
                "main": tuple(tuple(l[i] for l in c) for c in polys_h),
                "aux": [
                    tuple(tuple(l[i] for l in c) for c in ap)
                    for ap in aux_polys_h
                ],
            }
            for i in range(n)
        ]
    aux_rows_dev = [
        _tmap(lambda a: a[:n], x) for x in aux_rows_list if x is not None
    ]

    if stream:
        # queried LDE rows are re-derived from the coefficient tables coset
        # by coset (the LDE was never materialized)
        query_rows = _streamed.streamed_query_rows(
            B, n, w, num_cols, trace_length, blowup, ext_deg, _cached,
            offs_dev, polys_dev, comp_columns,
            aux_polys=aux_polys_dev, aux_widths=aux_widths,
        )
    else:
        def query_rows(positions):
            from ..utils.transfer import pull_rows_many

            pulled = pull_rows_many(
                [(main_rows_n, positions, -1)]
                + [(ar, positions, -1) for ar in aux_rows_dev]
                + [(comp_lde_rows, positions, -1)]
            )  # one dispatch + transfer for main/aux/composition rows
            main_g = pulled[0]  # comps (n, w, q)
            main_ldes_q = [
                tuple(tuple(l[i] for l in c) for c in main_g)
                for i in range(n)
            ]
            aux_list = []
            for g in pulled[1:-1]:
                aux_list.append(
                    [tuple(tuple(l[i] for l in c) for c in g)
                     for i in range(n)]
                )
            comp_g = pulled[-1]
            return main_ldes_q, aux_list, comp_g

    _mark("device->host materialization for the query/tail phase")

    # ---- P5-P6 sharded: DEEP LDE coset-by-coset + sharded FRI ----
    # (all fields; the f64 path uses the Goldilocks kernels, limb fields
    # route through FieldBackend ops — without this the f62/f128 DEEP
    # evaluation + every FRI layer ran on host numpy)
    def deep_fri(deep_coefficients):
        k4 = _cached(
            ("lde", mesh, B.spec.name, 1, trace_length,
             L // trace_length, offset, None, 1),
            lambda: sharded_lde_blocks(mesh, B, 1, trace_length,
                                       L // trace_length, offset),
        )
        # reshape works on host AND device arrays; np.asarray here would
        # pull device DEEP coefficients just to re-upload them to k4
        cols = tuple(
            tuple(l.reshape(1, trace_length) for l in c)
            for c in deep_coefficients
        )
        deep_rows = k4(cols)  # comps (1, L) sharded on the last axis
        deep_evals = _tmap(lambda a: a.reshape(L), deep_rows)
        # thread the field spec so FriOptions.domain_offset() returns the
        # field's generator (3 for f62/f128), not the f64 default
        fri = MeshFriProver(
            options.to_fri_options(
                field=None if spec.name == "f64" else spec
            ),
            hasher, ext_deg, mesh, B=B,
        )
        fri.build_layers(channel, deep_evals)
        return fri

    return finish_proof(
        channel, airs, domain, options, ext_deg, B, spec, hasher,
        traces_polys, None, None, main_tree, aux_trees,
        comp_columns, None, constraint_tree,
        deep_lde_and_fri=deep_fri, query_rows_fn=query_rows,
        ood_fn=ood_fn, deep_fn=deep_fn,
    )


# ---------------------------------------------------------------------------
# P11: sharded FRI (f64)
# ---------------------------------------------------------------------------


def _fri_layer_kernels(mesh, N, m, ext_deg, hasher, domain_offset, B=None):
    """Per-layer kernel pair for a folding step at source size m*N:
      transpose: (L,)-sharded evals -> (m, N) transposed rows, row-blocked
        (GSPMD jit: XLA lowers the global reshape+swapaxes to collectives —
        the blocked->strided reshard of fri/src/folding/mod.rs:85-117)
      fold: row hashing + Merkle subtree + DRP fold, all row-local.
    Cached per (d, N, m, ext_deg, hasher).  B=None is the f64 fast path;
    a limb backend routes the DRP/word math through FieldBackend ops."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..fri.prover import (
        apply_drp_limbs,
        drp_inv_offsets,
        limb_apply_drp,
        limb_drp_inv_offsets,
    )

    d = mesh.devices.size
    m_loc = m // d
    sub_depth = m_loc.bit_length() - 1
    L = m * N
    f64 = B is None or B.spec.name == "f64"
    nl = 2 if f64 else B.F.n
    elem_bytes = 8 if f64 else B.spec.ELEMENT_BYTES

    rows_sh = NamedSharding(mesh, P("dp"))

    def transpose(comps):
        return _tmap(lambda a: jnp.swapaxes(a.reshape(N, m), 0, 1), comps)

    skel = _dummy_comps(ext_deg, nl)
    transpose_fn = jax.jit(
        transpose,
        in_shardings=(_tmap(lambda _: rows_sh, skel),),
        out_shardings=_tmap(
            lambda _: NamedSharding(mesh, P("dp", None)), skel
        ),
    )

    def local(transposed, alpha_l, inv_offs_loc):
        rt = transposed  # comps (m_loc, N)
        if f64:
            from ..utils.convert import rows_to_words

            words = rows_to_words(rt, ext_deg)
        else:
            words = B.rows_to_words(rt, ext_deg)
        leaves = hasher.hash_words(words, N * ext_deg * elem_bytes)
        sub_levels = [leaves]
        cur = leaves
        for _ in range(sub_depth):
            cur = hasher.merge_words(cur[0::2], cur[1::2])
            sub_levels.append(cur)
        roots = jax.lax.all_gather(cur[0], "dp", axis=0)
        top_levels = [roots]
        top = roots
        while top.shape[0] > 1:
            top = hasher.merge_words(top[0::2], top[1::2])
            top_levels.append(top)
        if f64:
            folded = apply_drp_limbs(rt, domain_offset, alpha_l, ext_deg,
                                     inv_offs=inv_offs_loc)
        else:
            folded = limb_apply_drp(B, rt, alpha_l, inv_offs_loc, ext_deg)
        return folded, sub_levels, top_levels

    fold_fn = jax.jit(_shard_map()(
        local,
        mesh=mesh,
        in_specs=(P("dp", None), P(), P("dp")),
        out_specs=(P("dp"), [P("dp")] * (sub_depth + 1), P()),
        check_rep=False,
    ))
    if f64:
        inv_offs = drp_inv_offsets(m, N, domain_offset)
    else:
        inv_offs = limb_drp_inv_offsets(B, m, N, domain_offset)
    return transpose_fn, fold_fn, inv_offs


def _dummy_comps(ext_deg, nl: int = 2):
    """Pytree skeleton matching ext_deg components of nl-limb tuples."""
    return tuple(tuple(0 for _ in range(nl)) for _ in range(ext_deg))


class MeshFriProver:
    """FRI prover with every layer's transpose/hash/fold sharded over
    the mesh (fri/src/prover/mod.rs:172-226 + folding/mod.rs:85-117 as one
    distributed transpose + row-local work per layer).  Byte-identical to
    FriProver / LimbFriProver; layers whose folded size no longer divides
    the mesh fall back to the host prover's per-layer path on materialized
    arrays.  B selects the field: None / f64 = Goldilocks fast path, a
    limb backend (f62/f128) routes all math through FieldBackend ops."""

    def __init__(self, options, hasher, ext_deg: int, mesh, B=None):
        from ..fri.prover import FriProver, LimbFriProver

        self.B = None if (B is None or B.spec.name == "f64") else B
        if self.B is None:
            self._host = FriProver(options, hasher, ext_deg)
        else:
            self._host = LimbFriProver(options, hasher, self.B.F,
                                       self.B.spec, ext_deg)
        self.options = options
        self.hasher = hasher
        self.ext_deg = ext_deg
        self.mesh = mesh

    def build_layers(self, channel, evaluations):
        import os

        from ..ops import device_coin

        d = self.mesh.devices.size
        N = self.options.folding_factor
        total = self.options.num_fri_layers(evaluations[0][0].shape[-1])
        built = 0
        # device-resident coin: the per-layer reseed+draw runs on device so
        # the whole sharded-layer loop is asynchronous dispatches — no root
        # pull / alpha push round trip per layer; the host replays the
        # transcript from ONE batched root pull afterwards
        from ..math.fieldspec import GL64_SPEC

        spec = GL64_SPEC if self.B is None else self.B.spec
        self._dc = (
            os.environ.get("STARKPACK_DEVCOIN", "1") != "0"
            and device_coin.supported(self.hasher, spec, self.ext_deg)
        )
        self._dc_spec = spec
        self._seed_words = None
        self._pending_roots = []
        if self._dc:
            self._seed_words = device_coin.seed_to_words(
                self.hasher, channel.public_coin.seed
            )
        for _ in range(total):
            L = evaluations[0][0].shape[-1]
            m = L // N
            if m % d != 0 or m < 2 * d:
                break  # tiny tail layers: host path below
            evaluations = self._build_layer_sharded(channel, evaluations, m, N)
            built += 1
        if self._pending_roots:
            import jax.numpy as jnp

            roots = np.asarray(jnp.stack(self._pending_roots))  # one pull
            for rw in roots:
                channel.commit_fri_layer(
                    device_coin.words_to_digest(self.hasher, rw)
                )
                channel.draw_fri_alpha()
        # remaining tiny layers + remainder on the host prover (replicate
        # first: the layers are row-sharded and a bare np.asarray raises on
        # multi-process meshes)
        evaluations = tuple(
            tuple(np.asarray(l) for l in c)
            for c in _replicated(self.mesh, evaluations)
        )
        for _ in range(total - built):
            evaluations = self._host._build_layer(channel, evaluations)
        self._host._set_remainder(channel, evaluations)

    def _build_layer_sharded(self, channel, evaluations, m, N):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..crypto.merkle import MerkleTree
        from ..fri.prover import FriLayer
        from ..math import scalar as fs
        from ..utils.convert import scalar_to_limbs

        transpose_fn, fold_fn, inv_offs = _cached(
            ("fri", self.mesh, N, m, self.ext_deg, self.hasher,
             None if self.B is None else self.B.spec.name,
             self.options.domain_offset()),
            lambda: _fri_layer_kernels(
                self.mesh, N, m, self.ext_deg, self.hasher,
                self.options.domain_offset(), self.B,
            ),
        )
        transposed = transpose_fn(evaluations)
        # alpha depends on the layer root, so hash and fold cannot be one
        # pass: run the kernel twice — pass 1's fold output (dummy alpha) is
        # discarded; pass 2 hits the jit cache and redoes O(L/d) local work,
        # negligible next to the commit hashing
        if self.B is None:
            to_limbs = lambda v: scalar_to_limbs(v, self.ext_deg)
        else:
            to_limbs = lambda v: self.B.scalar_to_limbs(v, self.ext_deg)
        zero = fs.zero(self.ext_deg) if self.ext_deg > 1 else 0
        zero_l = to_limbs(zero)
        inv_sh = NamedSharding(self.mesh, P("dp"))
        inv_dev = tuple(jax.device_put(np.asarray(x), inv_sh)
                        for x in inv_offs)
        _, sub_l, top_l = fold_fn(transposed, zero_l, inv_dev)
        tree = MerkleTree(assemble_levels(sub_l, top_l), self.hasher)
        if self._dc:
            from ..ops import device_coin

            coin_fn = device_coin.reseed_draw_fn(
                self.hasher, self._dc_spec, self.ext_deg
            )
            root_words = top_l[-1][0]  # (8,) replicated device digest
            self._seed_words, alpha_l = coin_fn(self._seed_words, root_words)
            self._pending_roots.append(root_words)
        else:
            channel.commit_fri_layer(tree.root())
            alpha = channel.draw_fri_alpha()
            alpha_l = to_limbs(alpha)
        folded, _, _ = fold_fn(transposed, alpha_l, inv_dev)
        # keep the transposed layer device-resident; the proof builder
        # gathers just the queried rows (a full f128 layer at 2^23 is
        # ~130 MB of tunnel traffic otherwise)
        if self.B is None:
            self._host.layers.append(FriLayer(tree, transposed, m, N))
        else:
            self._host.layers.append((transposed, tree, m, N))
        return folded

    def build_proof(self, positions):
        return self._host.build_proof(positions)


def _limb_tail_kernels(mesh, B, spec, ext_deg, n, polys_n, aux_polys_n,
                       comp_columns, domain, airs):
    """Device OOD evaluation + DEEP composition for limb fields (f62/f128):
    byte-identical mirror of prover/pipeline.finish_proof's host math
    (evaluate_trace_polys_at + DeepCompositionPoly) as two jitted kernels,
    so the (n, w, length) coefficient tables never leave the device — only
    the tiny OOD values cross the tunnel.  Returns (ood_fn, deep_fn)."""
    import jax
    import jax.numpy as jnp

    from ..utils.transfer import pull_planes

    length = domain.trace_length
    d = ext_deg
    num_cols = airs[0].context.num_constraint_composition_columns()
    n_pad = polys_n[0][0].shape[0]
    w_main = polys_n[0][0].shape[1]
    w_auxs = tuple(ap[0][0].shape[1] for ap in aux_polys_n)
    W = w_main + sum(w_auxs)

    def ood_kernel(polys, auxs, comp_cols, z_l, zg_l):
        powz = B.power_series_elem(z_l, length)
        powzg = B.power_series_elem(zg_l, length)
        pm = B.promote(polys, d)
        tz_m = B.vsum(B.vmul(powz, pm), axis=-1)      # (n, w_main)
        tzg_m = B.vsum(B.vmul(powzg, pm), axis=-1)
        tz_a = tuple(
            B.vsum(B.vmul(powz, B.promote(a, d)), axis=-1) for a in auxs
        )
        tzg_a = tuple(
            B.vsum(B.vmul(powzg, B.promote(a, d)), axis=-1) for a in auxs
        )
        hz = B.vsum(B.vmul(powz, B.promote(comp_cols, d)), axis=-1)
        return tz_m, tzg_m, tz_a, tzg_a, hz

    def _sub0_batch(t, vals):
        # composer._sub_const_batch, traced: subtract (n,)-shaped scalars
        # from coefficient 0 of (n, length) coefficient tables
        out = []
        for c, v in zip(t, vals):
            first = B.bsub(
                tuple(l[:, :1] for l in c), tuple(l[:, None] for l in v)
            )
            out.append(tuple(
                jnp.concatenate([f, l[:, 1:]], axis=1)
                for f, l in zip(first, c)
            ))
        return tuple(out)

    def deep_kernel(polys, auxs, comp_cols, z_l, zg_l, ccs, cc_cons,
                    c1, c2, hz_c):
        groups = [B.promote(polys, d)] + [B.promote(a, d) for a in auxs]
        stacked = tuple(
            tuple(
                jnp.concatenate([g[c][l] for g in groups], axis=1)
                for l in range(len(groups[0][c]))
            )
            for c in range(d)
        )
        contrib = B.vmul(ccs, stacked)   # (n, W, length)
        t = B.vsum(contrib, axis=1)      # (n, length)
        q1 = B.syn_div_binomial(_sub0_batch(t, c1), z_l)
        q2 = B.syn_div_binomial(_sub0_batch(t, c2), zg_l)
        total = B.vsum(B.vadd(q1, q2), axis=0)  # (length,)
        # composition columns, batched (composer loops col-by-col; modular
        # sums are order-independent so one batched pass is byte-identical)
        cc_p = B.promote(comp_cols, d)
        cols = _sub0_batch(cc_p, hz_c)           # (num_cols, length)
        qc = B.syn_div_binomial(cols, z_l)
        kw = tuple(tuple(l[:, None] for l in c) for c in cc_cons)
        total = B.vadd(total, B.vsum(B.vmul(qc, kw), axis=0))
        return total

    k_ood = _cached(
        ("limbood", mesh, spec.name, n, length, w_main, w_auxs, num_cols, d),
        lambda: jax.jit(ood_kernel),
    )
    k_deep = _cached(
        ("limbdeep", mesh, spec.name, n, length, w_main, w_auxs, num_cols,
         d),
        lambda: jax.jit(deep_kernel),
    )
    auxs_t = tuple(aux_polys_n)

    def ood_fn(z, zg):
        z_l = B.scalar_to_limbs(z, d)
        zg_l = B.scalar_to_limbs(zg, d)
        tz_m, tzg_m, tz_a, tzg_a, hz = k_ood(
            polys_n, auxs_t, comp_columns, z_l, zg_l
        )
        # pull everything in one packed transfer
        all_comps = [tz_m, tzg_m, *tz_a, *tzg_a, hz]
        planes = pull_planes([l for g in all_comps for c in g for l in c])
        it = iter(planes)
        pulled = [
            tuple(tuple(next(it) for _ in range(len(c))) for c in g)
            for g in all_comps
        ]
        p_tz, p_tzg = pulled[0], pulled[1]
        p_tza = pulled[2 : 2 + len(tz_a)]
        p_tzga = pulled[2 + len(tz_a) : 2 + 2 * len(tz_a)]
        p_hz = pulled[-1]

        def rows(comps):  # (n_pad, w) comps -> per-REAL-instance elements
            flatc = tuple(tuple(l.reshape(-1) for l in c) for c in comps)
            elems = B.limbs_to_elems(flatc, d)
            w = comps[0][0].shape[1]
            return [elems[i * w : (i + 1) * w] for i in range(n)]

        main_z, main_zg = rows(p_tz), rows(p_tzg)
        aux_z = [rows(a) for a in p_tza]
        aux_zg = [rows(a) for a in p_tzga]
        states = []
        for i in range(n):
            at_z = list(main_z[i])
            at_zg = list(main_zg[i])
            for az, azg in zip(aux_z, aux_zg):
                at_z.extend(az[i])
                at_zg.extend(azg[i])
            states.append([at_z, at_zg])
        ood_evaluations = B.limbs_to_elems(
            tuple(tuple(l.reshape(-1) for l in c) for c in p_hz), d
        )
        return states, ood_evaluations

    def deep_fn(z, cc, ood_states, ood_evaluations):
        z_l = B.scalar_to_limbs(z, d)
        g_trace = B.get_root_of_unity(length.bit_length() - 1)
        zg_l = B.scalar_to_limbs(spec.fmul(z, g_trace), d)
        zero_e = 0 if d == 1 else spec.zero(d)
        cc_flat = [
            cc.traces[i][j] if i < n else zero_e
            for i in range(n_pad) for j in range(W)
        ]
        ccs = tuple(
            tuple(np.asarray(l).reshape(n_pad, W, 1) for l in c)
            for c in B.elems_to_limbs(cc_flat, d)
        )
        cc_cons = B.elems_to_limbs(list(cc.constraints), d)

        def consts(row):  # composer.ood_consts, host scalar math
            vals = []
            for i in range(n_pad):
                acc = zero_e
                if i < n:
                    for j in range(W):
                        acc = spec.fadd(
                            acc,
                            spec.fmul(ood_states[i][row][j],
                                      cc.traces[i][j]),
                        )
                vals.append(acc)
            return B.elems_to_limbs(vals, d)

        hz_c = B.elems_to_limbs(list(ood_evaluations), d)
        return k_deep(polys_n, auxs_t, comp_columns, z_l, zg_l, ccs,
                      cc_cons, consts(0), consts(1), hz_c)

    return ood_fn, deep_fn


def _stack_segments(segments, n_pad):
    """List (n) of comps (w, len) -> comps (n_pad, w, len), zero-padded."""
    n = len(segments)
    deg = len(segments[0])

    def stack_limb(c_idx, l_idx):
        arrs = [np.asarray(seg[c_idx][l_idx]) for seg in segments]
        out = np.stack(arrs)
        if n_pad > n:
            pad = np.zeros((n_pad - n,) + out.shape[1:], dtype=out.dtype)
            out = np.concatenate([out, pad])
        return out

    return tuple(
        tuple(stack_limb(c, l) for l in range(len(segments[0][c])))
        for c in range(deg)
    )
