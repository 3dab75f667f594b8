"""Gather-free device pipeline for large traces (length >= 2^14).

The small-trace device pipeline (device.py) builds its XLA graphs around
``jnp.take`` bit-reversals and index-array frame gathers; at 2^20 those
gathers alone cost the XLA compiler tens of minutes (round-1 finding).
This module re-cuts every phase on the four-step Pallas primitives of
``ops/pallas/ntt4.py`` so the whole prove is permutation-free:

* Phase 1  trace interpolate+LDE through the fused DIF/DIT kernels; the
  permuted K2 intermediates (offset^j-scaled coefficients) are kept for
  out-of-domain evaluation.
* Phase 2  constraint frames are strided slices (not index gathers);
  divisor inverse tables and exemptions are computed IN-graph with
  vectorized Fermat inversion; the composition polynomial is interpolated
  with ``intt_permuted``, split into columns with a strided slice
  (``slice_columns_permuted``) and re-evaluated with ``lde_from_permuted``
  — no natural-order coefficient array ever materializes.
* Phase 4  OOD values are dot products of the permuted coefficients with
  ``permuted_power_series``; the DEEP composition is evaluated POINTWISE
  over the LDE domain, (T(x)-T(z))*inv(x-z) — algebraically identical to
  the reference's coefficient-space synthetic division
  (prover/src/composer.rs:74-155) since both agree with the quotient
  polynomial on every domain point, and exactly byte-identical because
  field arithmetic is exact.
* Phases 5-6 reuse the shared FRI/assembly helpers from device.py.

Supports f64 AIRs (base/quad/cubic extensions), main segment only, all
single-value boundary assertions.  Everything else falls back to the
small-device or host pipelines.
"""

from __future__ import annotations

import numpy as np

from ..math import scalar as fs
from ..ops import gl64 as gl, ntt, vec
from ..ops.pallas import ntt4
from ..utils.convert import limbs_to_elems, rows_to_words, scalar_to_limbs
from .constraints import _inv_divisor_numerator
from ..air.transition import EvaluationFrame
from ..ops.felt import Felt
from .device import (
    _JIT_CACHE,
    _elem_from,
    _jit,
    _stack_scalars,
    _to_dev,
    assemble_proof,
    run_fri_phase,
)

SMALL_DIV_TABLE = 4096  # divisor periods up to this are host tables
CHUNK_SIZE = 1 << 20  # ce-domain chunk for the constraint scan (memory bound)


def supported(air0, boundary_template, length, ext_deg) -> bool:
    """True when the gather-free pipeline can prove this config."""
    if air0.field_spec().name != "f64":
        return False
    if ext_deg not in (1, 2, 3):
        return False
    domain_ce = air0.ce_domain_size()
    L = air0.lde_domain_size()
    if not (ntt4.supported(length, L) and ntt4.supported(domain_ce, L)):
        return False
    nc_total = domain_ce // length
    # the column split must divide the permuted row dimension
    b_ce = ntt4._pick_factors(domain_ce, L)[1]
    if nc_total > 1 and b_ce % nc_total != 0:
        return False
    for g in boundary_template.main_constraints:
        for c in g.constraints:
            if len(c.poly) != 1:
                return False
    return True


def _merkle_levels(rows, hasher, row_elems: int, ext_deg: int):
    """rows: tuple of pairs shaped (L, row_elems) -> list of digest levels."""
    words = rows_to_words(rows, ext_deg)
    leaves = hasher.hash_words(words, row_elems * ext_deg * 8)
    levels = [leaves]
    cur = leaves
    while cur.shape[0] > 1:
        cur = hasher.merge_words(cur[0::2], cur[1::2])
        levels.append(cur)
    return levels


def _strip_ints(consts):
    return {k: v for k, v in consts.items() if isinstance(v, tuple)}


# ---------------------------------------------------------------------------
# Phase 1: trace interpolate + LDE + commitment
# ---------------------------------------------------------------------------


def trace_commit_big(n, w, length, blowup, offset, hasher):
    key = ("big_trace_commit", n, w, length, blowup, offset, hasher.NAME)
    import jax  # noqa: F401

    consts = _strip_ints(ntt4.lde_consts(length, length * blowup, offset))
    L = length * blowup

    def make():
        def fn(seg, consts):
            import jax.numpy as jnp

            lde, pc = ntt4.interpolate_lde(
                seg, blowup, offset, consts=consts, return_permuted=True
            )
            rows = tuple(
                (
                    jnp.transpose(c[0], (2, 0, 1)).reshape(L, n * w),
                    jnp.transpose(c[1], (2, 0, 1)).reshape(L, n * w),
                )
                for c in lde
            )
            return pc[0], lde, _merkle_levels(rows, hasher, n * w, 1)

        return fn

    fn = _jit(key, make)
    return lambda seg: fn(seg, consts)


# ---------------------------------------------------------------------------
# Phase 2+3: constraints -> composition columns (permuted) -> commitment
# ---------------------------------------------------------------------------


def _small_periodic_columns(air):
    """Per-column periodic evaluations over ONE period (m = cycle *
    ce_blowup), to be tiled on device — periodic_table.rs semantics without
    materializing (ce,) arrays on the host."""
    cols = []
    for poly in air.get_periodic_column_polys():
        num_cycles = air.trace_length() // len(poly)
        offset = pow(air.domain_offset(), num_cycles, gl.P)
        limbs = gl.from_u64(np.array(poly, dtype=np.uint64))
        evals = ntt.evaluate_poly_with_offset(
            (limbs,), offset, air.ce_blowup_factor()
        )[0]
        cols.append(evals)
    return cols


def constraint_kernel_big(air0, domain, ext_deg, n, hasher, boundary_template):
    ce = domain.ce_size
    L = domain.lde_size
    shift = domain.ce_to_lde_blowup
    blowup = domain.trace_to_lde_blowup
    trace_length = domain.trace_length
    num_cols = air0.context.num_constraint_composition_columns()
    nc_total = ce // trace_length
    K = air0.context.num_transition_constraints()
    offset = domain.domain_offset

    import jax

    # chunk the ce domain so frame/constraint temporaries stay bounded
    # (the reference's fragment iteration, evaluator.rs:140-241, as a
    # lax.scan — also keeps the compiled graph small)
    CHUNK = min(ce, CHUNK_SIZE)
    C = ce // CHUNK

    # --- static divisor data: (a_exp, b_val, exemptions, host_inv_or_None) ---
    from ..air.divisors import ConstraintDivisor

    divisors = [
        ConstraintDivisor.from_transition(
            trace_length, air0.context.num_transition_exemptions
        )
    ] + [g.divisor for g in boundary_template.main_constraints]
    div_static = []
    for d in divisors:
        a_exp, b_val = d.numerator[0]
        m = ce // a_exp
        host_inv = None
        if m <= SMALL_DIV_TABLE:
            z = _inv_divisor_numerator(d, domain)  # (m,) base pair
            host_inv = tuple(jax.device_put(np.asarray(x)) for x in z)
        div_static.append((a_exp, b_val, tuple(d.exemptions), host_inv))

    groups_static = []
    for g in boundary_template.main_constraints:
        groups_static.append([(c.column, len(c.poly), c.poly_offset)
                              for c in g.constraints])

    g_ce = domain.ce_domain_generator()
    need_x = any(ex for (_, _, ex, _) in div_static)

    consts = {
        "periodic": [
            tuple(jax.device_put(np.asarray(x)) for x in c)
            for c in _small_periodic_columns(air0)
        ],
        "intt": _strip_ints(ntt4.intt_consts(ce, L, offset)),
    }
    b_ce = ntt4._pick_factors(ce, L)[1]
    rows_col = b_ce // nc_total if nc_total > 1 else b_ce
    a_ce = ce // b_ce
    consts["fwd"] = _strip_ints(ntt4.fwd_consts(L, a_ce, offset, rows_col))

    def make():
        def fn(main_lde, t_coeffs, b_single_vals, b_coeffs, final_powers, consts):
            import jax.numpy as jnp

            w = main_lde[0][0].shape[1]
            # wrap-extend the LDE so next-row frames never wrap inside a chunk
            lde_ext = tuple(
                (jnp.concatenate([c[0], c[0][..., :blowup]], axis=-1),
                 jnp.concatenate([c[1], c[1][..., :blowup]], axis=-1))
                for c in main_lde
            )

            def tile(pair, length):
                m = pair[0].shape[0]
                return tuple(
                    jnp.broadcast_to(x[None, :], (length // m, m)).reshape(length)
                    for x in pair
                )

            pv_chunk = [
                Felt((tuple(jnp.broadcast_to(t, (n, CHUNK))
                            for t in tile(c, CHUNK)),))
                for c in consts["periodic"]
            ]

            # carried per-chunk scalars: series over one chunk are computed
            # once; chunk c's values are base_series * carry, and the carry
            # advances by a static factor each step
            x_series = None
            carries_init = []
            factors = []
            if need_x:
                x_series = ntt.power_series(g_ce, CHUNK, jnp)
                carries_init.append(_dev_const(offset, jnp))
                factors.append(_dev_const(pow(g_ce, CHUNK, gl.P), jnp))
            div_series = []
            for a_exp, b_val, exemptions, host_inv in div_static:
                m = ce // a_exp
                if host_inv is not None:
                    div_series.append(tile(host_inv, CHUNK))
                else:
                    g_a = pow(g_ce, a_exp, gl.P)
                    div_series.append(ntt.power_series(g_a, CHUNK, jnp))
                    carries_init.append(
                        _dev_const(pow(offset, a_exp, gl.P), jnp)
                    )
                    factors.append(
                        _dev_const(pow(g_a, CHUNK, gl.P), jnp)
                    )

            def body(carry, _):
                ci = 0  # carry cursor
                x_chunk = None
                if need_x:
                    x_chunk = gl.mul(x_series, carry[ci])
                    ci += 1

                start = carry[-1]  # i32 chunk start (in lde positions)
                sl = tuple(
                    (jax.lax.dynamic_slice(
                        c[0], (0, 0, start), (n, w, CHUNK * shift + blowup)),
                     jax.lax.dynamic_slice(
                        c[1], (0, 0, start), (n, w, CHUNK * shift + blowup)))
                    for c in lde_ext
                )
                cur = [
                    Felt(tuple((c[0][:, w_i, :CHUNK * shift:shift],
                                c[1][:, w_i, :CHUNK * shift:shift])
                               for c in sl))
                    for w_i in range(w)
                ]
                nxt = [
                    Felt(tuple((c[0][:, w_i, blowup::shift][:, :CHUNK],
                                c[1][:, w_i, blowup::shift][:, :CHUNK])
                               for c in sl))
                    for w_i in range(w)
                ]
                frame = EvaluationFrame(cur, nxt)

                t_result = [None] * K
                air0.evaluate_transition(frame, pv_chunk, t_result)
                combined = vec.vzeros((n, CHUNK), ext_deg, jnp)
                for k_i, ev in enumerate(t_result):
                    coef = tuple((c[0][:, k_i : k_i + 1], c[1][:, k_i : k_i + 1])
                                 for c in t_coeffs)
                    combined = vec.vadd(combined, vec.vmul(coef, ev.c))

                columns = [combined]
                sv_idx = 0
                a_idx = 0
                for cons in groups_static:
                    acc_g = vec.vzeros((n, CHUNK), ext_deg, jnp)
                    for column, _poly_len, _poly_offset in cons:
                        diff = vec.vsub(cur[column].c, (b_single_vals[sv_idx],))
                        sv_idx += 1
                        cc = tuple(
                            (c[0][:, a_idx : a_idx + 1], c[1][:, a_idx : a_idx + 1])
                            for c in b_coeffs
                        )
                        a_idx += 1
                        acc_g = vec.vadd(acc_g, vec.vmul(cc, diff))
                    columns.append(acc_g)

                # divisors: chunked inverse tables (vectorized Fermat —
                # exact, so byte-identical to host Montgomery inversion).
                # All k per-group denominators invert in ONE Fermat exp via
                # the Montgomery trick (1 exp + 3(k-1) muls instead of k
                # exps of ~72 muls each — the exps were ~35% of this
                # kernel's multiply count).
                acc_c = vec.vzeros((n, CHUNK), ext_deg, jnp)
                new_carry = list(carry)
                ci2 = 1 if need_x else 0
                dens = []  # (x^a - b) per non-host-table divisor, in order
                for (a_exp, b_val, exemptions, host_inv), series in zip(
                    div_static, div_series
                ):
                    if host_inv is not None:
                        continue
                    xs = gl.mul(series, carry[ci2])
                    dens.append(gl.sub(xs, _dev_const(b_val, jnp)))
                    ci2 += 1
                invs = []
                if dens:
                    prefix = [dens[0]]
                    for d_i in dens[1:]:
                        prefix.append(gl.mul(prefix[-1], d_i))
                    inv_all = gl.inv(prefix[-1])
                    for i in range(len(dens) - 1, 0, -1):
                        invs.append(gl.mul(inv_all, prefix[i - 1]))
                        inv_all = gl.mul(inv_all, dens[i])
                    invs.append(inv_all)
                    invs.reverse()  # invs[i] == 1 / dens[i]
                di = 0
                for (a_exp, b_val, exemptions, host_inv), series in zip(
                    div_static, div_series
                ):
                    if host_inv is not None:
                        z = series  # already tiled, chunk-invariant
                    else:
                        z = invs[di]
                        di += 1
                    for e in exemptions:
                        z = gl.mul(z, gl.sub(x_chunk, _dev_const(e, jnp)))
                    col = columns.pop(0)
                    acc_c = vec.vadd(
                        acc_c, vec.vmul(vec.promote(col, ext_deg), (z,))
                    )

                for i in range(len(carries_init)):
                    new_carry[i] = gl.mul(carry[i], factors[i])
                new_carry[-1] = carry[-1] + CHUNK * shift
                return tuple(new_carry), acc_c

            import jax.numpy as jnp2  # noqa: F401

            init = tuple(carries_init) + (jnp.int32(0),)
            _, ys = jax.lax.scan(body, init, None, length=C)
            # ys: ext tuple of (C, n, CHUNK) pairs -> (n, ce)
            acc = tuple(
                (jnp.transpose(y[0], (1, 0, 2)).reshape(n, ce),
                 jnp.transpose(y[1], (1, 0, 2)).reshape(n, ce))
                for y in ys
            )

            # interpolate (permuted), weight by final powers, sum instances
            pc = tuple(
                ntt4.intt_permuted((comp,), offset, L, consts=consts["intt"])[0]
                for comp in acc
            )  # ext tuple of (n, b, a)
            fp = tuple((c[0][:, None, None], c[1][:, None, None])
                       for c in final_powers)
            weighted = vec.vmul(pc, fp)
            final_pc = vec.vsum(weighted, axis=0)  # ext tuple of (b, a)

            cols_perm = ntt4.slice_columns_permuted(final_pc, nc_total,
                                                    keep=num_cols)
            stacked = tuple(
                (jnp.stack([col[c][0] for col in cols_perm]),
                 jnp.stack([col[c][1] for col in cols_perm]))
                for c in range(ext_deg)
            )  # ext tuple of (num_cols, rows_col, a)
            comp_lde = ntt4.lde_from_permuted(stacked, L, offset,
                                              consts=consts["fwd"])
            rows = tuple((c[0].T, c[1].T) for c in comp_lde)
            levels = _merkle_levels(rows, hasher, num_cols, ext_deg)
            return stacked, comp_lde, levels

        return fn

    key = ("big_constraints", type(air0).__name__, n, ce, L, ext_deg,
           hasher.NAME, CHUNK, tuple(tuple(c) for c in groups_static))
    fn = _jit(key, make)
    return lambda *args: fn(*args, consts)


def _dev_const(v: int, jnp):
    p = gl.from_int(v % gl.P, (1,))
    return (jnp.asarray(p[0]), jnp.asarray(p[1]))


# ---------------------------------------------------------------------------
# Phase 4: OOD via permuted dot products + pointwise DEEP over the LDE
# ---------------------------------------------------------------------------


def ood_kernel_big(n, w, length, tl, ext_deg, num_cols, lay1, lay2):
    key = ("big_ood", n, w, length, tl, ext_deg, num_cols, lay1, lay2)
    a1, b1 = lay1
    a2, b2p = lay2

    def make():
        def fn(pc1, pc_cols, z_over_o, zg_over_o, z):
            # pc1: base pair (n, w, b1, a1) holding offset^j * c_j
            ps_z = ntt4.permuted_power_series(z_over_o, length, a1, b1)
            ps_zg = ntt4.permuted_power_series(zg_over_o, length, a1, b1)
            tz = vec.vsum(vec.vsum(vec.vmul((pc1,), ps_z), axis=-1), axis=-1)
            tzg = vec.vsum(vec.vsum(vec.vmul((pc1,), ps_zg), axis=-1), axis=-1)
            ps2 = ntt4.permuted_power_series(z, tl, a2, b2p)
            hz = vec.vsum(vec.vsum(vec.vmul(pc_cols, ps2), axis=-1), axis=-1)
            return tz, tzg, hz

        return fn

    return _jit(key, make)


def deep_kernel_big(n, w, L, offset, ext_deg, num_cols):
    key = ("big_deep", n, w, L, offset, ext_deg, num_cols)
    w_L = gl.get_root_of_unity(L.bit_length() - 1)

    def make():
        def fn(lde, comp_lde, z, zg, tz, tzg, hz, cc_traces, cc_constraints):
            import jax.numpy as jnp

            xs = ntt.power_series(w_L, L, jnp)
            x = gl.mul(xs, _dev_const(offset, jnp))  # (L,) base
            inv_z = vec.vinv(vec.vsub((x,), z))
            inv_zg = vec.vinv(vec.vsub((x,), zg))

            # accumulate W = sum_ij k_ij * T_ij(x) column by column so the
            # peak temporary is O(L), not O(n*w*L) (order-independent: exact
            # modular adds)
            W = vec.vzeros((L,), ext_deg, jnp)
            for i in range(n):
                for j in range(w):
                    kij = tuple((c[0][i, j : j + 1], c[1][i, j : j + 1])
                                for c in cc_traces)
                    tij = tuple((c[0][i, j], c[1][i, j]) for c in lde)
                    W = vec.vadd(W, vec.vmul(kij, tij))
            c1 = vec.vsum(vec.vsum(vec.vmul(cc_traces, tz), axis=-1), axis=-1)
            c2 = vec.vsum(vec.vsum(vec.vmul(cc_traces, tzg), axis=-1), axis=-1)
            total = vec.vadd(
                vec.vmul(vec.vsub(W, c1), inv_z),
                vec.vmul(vec.vsub(W, c2), inv_zg),
            )
            for i in range(num_cols):
                col = tuple((c[0][i], c[1][i]) for c in comp_lde)
                hz_i = tuple((c[0][i : i + 1], c[1][i : i + 1]) for c in hz)
                q = vec.vmul(vec.vsub(vec.promote(col, ext_deg), hz_i), inv_z)
                kc = tuple((c[0][i : i + 1], c[1][i : i + 1])
                           for c in cc_constraints)
                total = vec.vadd(total, vec.vmul(q, kc))
            return total

        return fn

    return _jit(key, make)


# ---------------------------------------------------------------------------
# Orchestration
# ---------------------------------------------------------------------------


def prove_big(prover, n, traces):
    """Gather-free device prove — same transcript/bytes as the host
    pipeline (pipeline.py), validated by tests/test_device_prover.py.

    Phase timers mirror the host pipeline's (lib.rs:239-263 format); each
    phase ends at a Fiat-Shamir channel interaction that forces a host
    sync (root bytes / OOD values), so the walls are real phase costs."""
    import logging
    import time as _time

    import jax.numpy as jnp  # noqa: F401

    _logger = logging.getLogger("starkpack_winterfell_tpu.prover.device")
    _t0 = _time.perf_counter()

    def _phase(msg):
        nonlocal _t0
        _logger.debug("%s in %.0f ms", msg, (_time.perf_counter() - _t0) * 1e3)
        _t0 = _time.perf_counter()

    from ..crypto.merkle import MerkleTree
    from .channel import ProverChannel
    from .domain import StarkDomain
    from .device import _stack_boundary_values

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
    w = traces[0].width
    length = traces[0].length
    blowup = domain.trace_to_lde_blowup
    L = domain.lde_size
    ce = domain.ce_size
    tl = domain.trace_length
    offset = domain.domain_offset

    # ---- Phase 1 ----
    built = [t.device_planes() for t in traces]
    if all(b is not None for b in built):
        # device-built planes (TraceTable.set_device_builder): only the
        # trace skeleton crossed the ~10-20 MB/s tunnel
        seg = ((jnp.stack([b[0] for b in built]),
                jnp.stack([b[1] for b in built])),)
    else:
        stacked = np.stack([t.main_columns_u64() for t in traces])  # (n, w, len)
        seg = _to_dev((gl.from_u64(stacked),))
    k1 = trace_commit_big(n, w, length, blowup, offset, hasher)
    pc1, lde, levels = k1(seg)
    main_tree = MerkleTree(levels, hasher)
    channel.commit_trace(main_tree.root())
    _phase("P1 trace interpolate+LDE+commit")

    # ---- Phase 2+3 ----
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
    b_single_vals, b_seq_vals = _stack_boundary_values(
        boundary_template, per_instance, domain, airs[0]
    )
    assert not b_seq_vals, "big path requires single-value assertions"

    k2 = constraint_kernel_big(airs[0], domain, ext_deg, n, hasher,
                               boundary_template)
    pc_cols, comp_lde, clevels = k2(
        lde,
        _stack_scalars(t_coeffs_list, ext_deg),
        [_to_dev((v,))[0] for v in b_single_vals],
        _stack_scalars(b_coeffs_list, ext_deg),
        _stack_scalars([[p] for p in final_powers], ext_deg, squeeze=True),
    )
    constraint_tree = MerkleTree(clevels, hasher)
    channel.commit_constraints(constraint_tree.root())
    _phase("P2+3 constraint eval+composition+commit")

    # ---- Phase 4: OOD + DEEP ----
    num_cols = airs[0].context.num_constraint_composition_columns()
    z = channel.get_ood_point()
    g_trace = fs.get_root_of_unity(length.bit_length() - 1)
    zg = fs.fmul(z, g_trace)
    inv_o = pow(offset, fs.P - 2, fs.P)
    z_l = _to_dev(scalar_to_limbs(z, ext_deg))
    zg_l = _to_dev(scalar_to_limbs(zg, ext_deg))
    z_over_o = _to_dev(scalar_to_limbs(fs.fmul(z, inv_o), ext_deg))
    zg_over_o = _to_dev(scalar_to_limbs(fs.fmul(zg, inv_o), ext_deg))

    b1, a1 = (int(s) for s in pc1[0].shape[-2:])
    b2p, a2 = (int(s) for s in pc_cols[0][0].shape[-2:])
    k3 = ood_kernel_big(n, w, length, tl, ext_deg, num_cols,
                        (a1, b1), (a2, b2p))
    tz, tzg, hz = k3(pc1, pc_cols, z_over_o, zg_over_o, z_l)
    tz_h = np.stack([gl.to_u64(c) for c in tz])  # (deg, n, w)
    tzg_h = np.stack([gl.to_u64(c) for c in tzg])
    hz_h = np.stack([gl.to_u64(c) for c in hz])
    ood_traces_states = []
    for i in range(n):
        at_z = [_elem_from(tz_h[:, i, j], ext_deg) for j in range(w)]
        at_zg = [_elem_from(tzg_h[:, i, j], ext_deg) for j in range(w)]
        ood_traces_states.append([at_z, at_zg])
    channel.send_ood_trace_states(ood_traces_states)
    ood_evaluations = [_elem_from(hz_h[:, j], ext_deg) for j in range(num_cols)]
    channel.send_ood_constraint_evaluations(ood_evaluations)
    _phase("P4 OOD")

    cc = channel.get_deep_composition_coeffs()
    cc_traces = _stack_scalars(cc.traces, ext_deg)  # (n, w)
    cc_constraints = _stack_scalars([cc.constraints], ext_deg, squeeze=False)
    cc_constraints = tuple((c[0][0], c[1][0]) for c in cc_constraints)
    k4 = deep_kernel_big(n, w, L, offset, ext_deg, num_cols)
    deep_evals = k4(lde, comp_lde, z_l, zg_l, tz, tzg, hz, cc_traces,
                    cc_constraints)

    # ---- Phase 5-6 ----
    fri_layers, remainder_elements = run_fri_phase(
        channel, deep_evals, options, domain, ext_deg, hasher
    )
    _phase("P5+6 DEEP+FRI")
    channel.grind_query_seed()
    positions = channel.get_query_positions()
    _phase("P7 PoW+positions")
    out = assemble_proof(
        channel, positions, lde, comp_lde, main_tree, constraint_tree,
        fri_layers, remainder_elements, options, domain, n, ext_deg
    )
    _phase("P8 queries+assembly")
    return out
