"""Multi-chip full proving step — the distributed prover the reference left
as a hook (fri/src/proof.rs:93 num_partitions, README.md:43) built out over a
jax.sharding.Mesh.

Sharded phases (the asymptotically dominant ones):
  P1 trace commitment — instances ride the 'dp' axis (local iNTT + coset
     LDE per device), the combined-row leaves + Merkle subtrees shard by LDE
     row blocks, subtree roots all_gather and the tiny top of the tree is
     replicated (the rayon fan-out of merkle/concurrent.rs:22-70 as ICI
     collectives).
  P2/P3 constraint evaluation — the O(n_traces · ce_size · n_constraints)
     evaluation + divisor multiply + cross-instance aggregation shards the
     constraint-evaluation domain by contiguous blocks ('dp' reused as the
     domain axis); each device evaluates the user's AIR on its block and the
     (ce,)-sized aggregate is reassembled by the collective output layout.

The remaining phases (composition iNTT, DEEP, FRI) are O(L) with tiny
constants and stay single-device; the Fiat-Shamir channel is host-side and
inherently sequential.  Proof bytes are identical to the host pipeline
(asserted in tests/test_full_pipeline_mesh.py).
"""

from __future__ import annotations

import warnings

import numpy as np

from ..air.transition import EvaluationFrame
from ..math import scalar as fs
from ..ops import gl64 as gl, ntt, vec
from ..ops.felt import Felt


def _shard_map():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        from jax.experimental.shard_map import shard_map
    return shard_map


def sharded_trace_phase(mesh, n, w, length, blowup, offset, hasher):
    """Returns jitted fn: (lo, hi) of shape (n, w, length) sharded on 'dp'
    -> (polys, lde, subtree_levels, top_root_levels)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from ..utils.convert import rows_to_words

    d = mesh.devices.size
    L = length * blowup
    rows_per_dev = L // d
    sub_depth = rows_per_dev.bit_length() - 1

    def local(lo, hi):
        polys = ntt.interpolate_poly(((lo, hi),))
        lde = ntt.evaluate_poly_with_offset(polys, offset, blowup)
        lde_lo, lde_hi = lde[0]
        all_lo = jax.lax.all_gather(lde_lo, "dp", axis=0, tiled=True)  # (n, w, L)
        all_hi = jax.lax.all_gather(lde_hi, "dp", axis=0, tiled=True)
        dev = jax.lax.axis_index("dp")
        start = dev * rows_per_dev
        my_lo = jax.lax.dynamic_slice_in_dim(all_lo, start, rows_per_dev, axis=2)
        my_hi = jax.lax.dynamic_slice_in_dim(all_hi, start, rows_per_dev, axis=2)
        rlo = jnp.transpose(my_lo, (2, 0, 1)).reshape(rows_per_dev, n * w)
        rhi = jnp.transpose(my_hi, (2, 0, 1)).reshape(rows_per_dev, n * w)
        words = rows_to_words(((rlo, rhi),), 1)
        leaves = hasher.hash_words(words, n * w * 8)
        sub_levels = [leaves]
        cur = leaves
        for _ in range(sub_depth):
            cur = hasher.merge_words(cur[0::2], cur[1::2])
            sub_levels.append(cur)
        roots = jax.lax.all_gather(cur[0], "dp", axis=0)  # (d, 8) replicated
        top_levels = [roots]
        top = roots
        while top.shape[0] > 1:
            top = hasher.merge_words(top[0::2], top[1::2])
            top_levels.append(top)
        return polys[0], (all_lo, all_hi), sub_levels, top_levels

    fn = _shard_map()(
        local,
        mesh=mesh,
        in_specs=(P("dp"), P("dp")),
        out_specs=(P("dp"), P(), [P("dp")] * (sub_depth + 1), P()),
        check_rep=False,
    )
    return jax.jit(fn)


def assemble_levels(sub_levels, top_levels):
    """Per-device subtree levels (gathered along axis 0 by the sharding) and
    the replicated top-of-tree -> full Merkle level list (bottom first)."""
    levels = [np.asarray(l) for l in sub_levels]
    # top_levels[0] is the (d, 8) subtree-roots level == levels[-1] gathered;
    # append the strictly higher levels
    for t in top_levels[1:]:
        levels.append(np.asarray(t))
    return levels


def sharded_constraint_phase(mesh, air0, domain, ext_deg, n, boundary_template):
    """Returns fn(main_lde, stacked coefficient arrays) -> final combined ce
    evaluations (ce,), computed with the constraint-evaluation domain sharded
    by contiguous blocks over 'dp'.

    All frame/table slicing happens outside the shard_map (strided numpy
    views + sharded device_put); the per-device body is pure element-wise
    field arithmetic — no dynamic indexing, which keeps the XLA:CPU
    partitioner off its pathological compile paths (see CLAUDE.md)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..air.divisors import ConstraintDivisor
    from ..prover.constraints import (
        PeriodicValueTable,
        _exemptions_eval,
        _inv_divisor_numerator,
    )

    ce = domain.ce_size
    L = domain.lde_size
    shift = domain.ce_to_lde_blowup
    blowup = domain.trace_to_lde_blowup
    K = air0.context.num_transition_constraints()

    periodic = PeriodicValueTable(air0)
    divisors = [
        ConstraintDivisor.from_transition(
            domain.trace_length, air0.context.num_transition_exemptions
        )
    ] + [g.divisor for g in boundary_template.main_constraints]
    div_tables = []
    for dv in divisors:
        z = _inv_divisor_numerator(dv, domain)
        m = z[0].shape[0]
        idx = np.arange(ce) % m
        zfull = (np.asarray(z[0])[idx], np.asarray(z[1])[idx])
        if dv.exemptions:
            zfull = gl.mul(zfull, _exemptions_eval(dv, domain))
        div_tables.append(tuple(np.asarray(x) for x in zfull))
    groups_static = [
        [(c.column, len(c.poly)) for c in g.constraints]
        for g in boundary_template.main_constraints
    ]

    def local(cur_pair, nxt_pair, t_coeffs, b_single_vals, b_seq_vals, b_coeffs,
              div_tabs, periodic_tabs):
        clo, chi = cur_pair
        nlo, nhi = nxt_pair
        wdt = clo.shape[1]
        block = clo.shape[2]
        cur = [Felt(((clo[:, w_i], chi[:, w_i]),)) for w_i in range(wdt)]
        nxt = [Felt(((nlo[:, w_i], nhi[:, w_i]),)) for w_i in range(wdt)]
        frame = EvaluationFrame(cur, nxt)
        pv = [
            Felt((tuple(jnp.broadcast_to(x, (n, block)) for x in c),))
            for c in periodic_tabs
        ]
        t_result = [None] * K
        air0.evaluate_transition(frame, pv, t_result)
        combined = vec.vzeros((n, block), ext_deg, jnp)
        for k_i, ev in enumerate(t_result):
            coef = tuple((c[0][:, k_i : k_i + 1], c[1][:, k_i : k_i + 1]) for c in t_coeffs)
            combined = vec.vadd(combined, vec.vmul(coef, ev.c))

        columns = [combined]
        sv = sq = a_i = 0
        for cons in groups_static:
            acc = vec.vzeros((n, block), ext_deg, jnp)
            for column, poly_len in cons:
                state = cur[column].c
                if poly_len == 1:
                    val = b_single_vals[sv]
                    sv += 1
                    diff = vec.vsub(state, (val,))
                else:
                    diff = vec.vsub(state, (b_seq_vals[sq],))
                    sq += 1
                ccf = tuple((c[0][:, a_i : a_i + 1], c[1][:, a_i : a_i + 1]) for c in b_coeffs)
                a_i += 1
                acc = vec.vadd(acc, vec.vmul(ccf, diff))
            columns.append(acc)

        acc = vec.vzeros((n, block), ext_deg, jnp)
        for col, zt in zip(columns, div_tabs):
            acc = vec.vadd(acc, vec.vmul(vec.promote(col, ext_deg), (zt,)))

        # the cross-instance final-coeff combination happens on the host:
        # instance-row slices of ce-sharded intermediates trip an XLA:CPU
        # SPMD runtime deadlock when n_traces != mesh size (and the
        # reduction is O(n·ce) — negligible)
        return acc  # element tuple, (n, ce) blocks

    # The body is purely element-wise over the ce axis, so GSPMD partitioning
    # (jit + sharded inputs/outputs) expresses the same thing as shard_map
    # with none of the per-device lowering corner cases: XLA propagates the
    # 'dp' sharding of the frame/table arguments through every op and each
    # device executes exactly its ce block.
    # replicated output: np.asarray on a 'dp'-sharded CPU output has been
    # observed to deadlock in the runtime when n_traces != mesh size; the
    # internal all-gather of a (ce,)-sized vector is free
    jitted = jax.jit(local, out_shardings=NamedSharding(mesh, P()))
    div_sh = NamedSharding(mesh, P("dp"))
    div_args = [
        tuple(jax.device_put(x, div_sh) for x in t) for t in div_tables
    ]
    per_args = [
        tuple(jax.device_put(np.asarray(x), div_sh) for x in c)
        for c in periodic.columns
    ]
    frame_sh = NamedSharding(mesh, P(None, None, "dp"))
    seq_sh = NamedSharding(mesh, P(None, "dp"))

    def call(main_lde, t_coeffs, b_single, b_seq, b_coeffs):
        lo = np.asarray(main_lde[0])
        hi = np.asarray(main_lde[1])
        cur_pair = tuple(
            jax.device_put(np.ascontiguousarray(x[:, :, ::shift]), frame_sh)
            for x in (lo, hi)
        )
        nxt_pair = tuple(
            jax.device_put(
                np.ascontiguousarray(np.roll(x, -blowup, axis=-1)[:, :, ::shift]),
                frame_sh,
            )
            for x in (lo, hi)
        )
        b_seq_sharded = [
            tuple(jax.device_put(np.asarray(x), seq_sh) for x in v) for v in b_seq
        ]
        return jitted(
            cur_pair, nxt_pair, t_coeffs, b_single, b_seq_sharded, b_coeffs,
            div_args, per_args,
        )

    return call


def prove_mesh(prover, n: int, traces, mesh):
    """Full StarkPack proof with the heavy phases sharded over the mesh;
    byte-identical to Prover.prove on the host.  f64 main-segment AIRs;
    n must be a multiple of the mesh size (instances shard on 'dp')."""
    assert n % mesh.devices.size == 0, "n_traces must be divisible by mesh size"
    import jax.numpy as jnp

    from ..crypto.merkle import MerkleTree
    from ..fri.prover import FriProver
    from ..prover.channel import ProverChannel
    from ..prover.commitment import (
        build_constraint_queries,
        build_segment_queries,
        commit_to_rows,
    )
    from ..prover.composer import DeepCompositionPoly
    from ..prover.device import _stack_boundary_values, _stack_scalars
    from ..prover.domain import StarkDomain
    from ..prover.pipeline import evaluate_columns_at, evaluate_trace_polys_at
    from ..utils.convert import scalar_to_limbs

    options = prover.options()
    ext_deg = options.field_extension
    hasher = prover.hasher
    pub_inputs_vec = [prover.get_pub_inputs(t) for t in traces]
    pub_elements_vec = [p.to_elements() for p in pub_inputs_vec]
    airs = [
        prover.air_class(t.get_info(), p, options)
        for t, p in zip(traces, pub_inputs_vec)
    ]
    channel = ProverChannel(n, airs, pub_elements_vec, hasher, ext_deg)
    domain = StarkDomain(airs[0])
    w, length = traces[0].width, traces[0].length
    blowup = domain.trace_to_lde_blowup

    # ---- P1: sharded trace commitment ----
    stacked = np.stack([t.main_columns_u64() for t in traces])
    seg = gl.from_u64(stacked)
    k1 = sharded_trace_phase(mesh, n, w, length, blowup, domain.domain_offset, hasher)
    polys_pair, lde_pair, sub_levels, top_levels = k1(
        jnp.asarray(seg[0]), jnp.asarray(seg[1])
    )
    levels = assemble_levels(sub_levels, top_levels)
    main_tree = MerkleTree(levels, hasher)
    channel.commit_trace(main_tree.root())

    # ---- P2/P3: sharded constraint evaluation ----
    t_coeffs_list, b_coeffs_list = [], []
    for _ in range(n):
        cc = channel.get_constraint_composition_coeffs()
        t_coeffs_list.append(cc.transition)
        b_coeffs_list.append(cc.boundary)
    final_coeff = channel.get_final_polynomial_coeffs()
    final_powers = [fs.fexp(final_coeff, i) for i in range(n)]
    dummy_ccs = [fs.zero(ext_deg) if ext_deg > 1 else 0] * airs[0].context.num_assertions()
    boundary_template = airs[0].get_boundary_constraints(None, dummy_ccs)
    per_instance = [air.get_boundary_constraints(None, dummy_ccs) for air in airs]
    b_single, b_seq = _stack_boundary_values(boundary_template, per_instance, domain, airs[0])

    k2 = sharded_constraint_phase(mesh, airs[0], domain, ext_deg, n, boundary_template)
    acc_dev = k2(
        lde_pair,
        _stack_scalars(t_coeffs_list, ext_deg),
        [tuple(jnp.asarray(x) for x in v) for v in b_single],
        [tuple(jnp.asarray(x) for x in v) for v in b_seq],
        _stack_scalars(b_coeffs_list, ext_deg),
    )
    acc_h = tuple(tuple(np.asarray(l) for l in c) for c in acc_dev)
    # cross-instance combination with final_coeff powers (host, O(n*ce))
    final_comb = None
    for i in range(n):
        row = tuple(tuple(l[i] for l in c) for c in acc_h)
        from ..utils.convert import scalar_to_limbs as _stl

        kf = vec.vbroadcast(_stl(final_powers[i], ext_deg), row[0][0].shape)
        term = vec.vmul(row, kf)
        final_comb = term if final_comb is None else vec.vadd(final_comb, term)

    # ---- P3b..P8: host tail (identical to pipeline.py) ----
    ce = domain.ce_size
    trace_length = domain.trace_length
    num_cols = airs[0].context.num_constraint_composition_columns()
    coeffs = ntt.interpolate_poly_with_offset(final_comb, domain.domain_offset)
    comp_columns = tuple(
        (
            c[0].reshape(ce // trace_length, trace_length)[:num_cols],
            c[1].reshape(ce // trace_length, trace_length)[:num_cols],
        )
        for c in vec.promote(coeffs, ext_deg)
    )
    comp_lde = ntt.evaluate_poly_with_offset(
        comp_columns, domain.domain_offset, domain.lde_size // trace_length
    )
    constraint_tree = commit_to_rows(comp_lde, hasher, ext_deg)
    channel.commit_constraints(constraint_tree.root())

    main_polys_h = (np.asarray(polys_pair[0]), np.asarray(polys_pair[1]))
    traces_polys = [
        {"main": ((main_polys_h[0][i], main_polys_h[1][i]),), "aux": []}
        for i in range(n)
    ]
    main_ldes = [
        ((np.asarray(lde_pair[0])[i], np.asarray(lde_pair[1])[i]),) for i in range(n)
    ]

    z = channel.get_ood_point()
    g_trace = fs.get_root_of_unity(trace_length.bit_length() - 1)
    zg = fs.fmul(z, g_trace)
    ood_traces_states = []
    for tp in traces_polys:
        at_z = evaluate_trace_polys_at(tp, z, ext_deg)
        at_zg = evaluate_trace_polys_at(tp, zg, ext_deg)
        ood_traces_states.append([at_z, at_zg])
    channel.send_ood_trace_states(ood_traces_states)
    ood_evaluations = evaluate_columns_at(comp_columns, z, ext_deg)
    channel.send_ood_constraint_evaluations(ood_evaluations)

    deep_coefficients = channel.get_deep_composition_coeffs()
    deep = DeepCompositionPoly(z, deep_coefficients, ext_deg)
    deep.add_trace_polys(traces_polys, ood_traces_states)
    deep.add_composition_poly(comp_columns, ood_evaluations)

    deep_evaluations = ntt.evaluate_poly_with_offset(
        deep.coefficients, domain.domain_offset, domain.trace_to_lde_blowup
    )
    fri_prover = FriProver(options.to_fri_options(), hasher, ext_deg)
    fri_prover.build_layers(channel, deep_evaluations)
    channel.grind_query_seed()
    query_positions = channel.get_query_positions()
    fri_proof = fri_prover.build_proof(query_positions)
    trace_queries = [
        build_segment_queries(main_ldes, main_tree, query_positions, 1)
    ]
    constraint_queries = build_constraint_queries(
        comp_lde, constraint_tree, query_positions, ext_deg
    )
    return channel.build_proof(trace_queries, constraint_queries, fri_proof)
