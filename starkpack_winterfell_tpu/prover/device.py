"""Device-resident proving pipeline.

The host pipeline (pipeline.py) orchestrates numpy arrays; this module runs
the same 8 phases with every bulk computation jitted on the accelerator and
all instances stacked on a leading batch axis (StarkPack's P1 parallel axis,
SURVEY.md §2.9).  The Fiat-Shamir channel stays on the host; device/host
round trips happen only at transcript interaction points (roots, OOD values,
FRI layer roots) — everything between is one compiled XLA program.

Currently covers main-segment-only AIRs (aux segments fall back to the host
pipeline automatically).
"""

from __future__ import annotations

import numpy as np

from ..math import scalar as fs
from ..ops import gl64 as gl, ntt, vec
from ..utils.convert import limbs_to_elems, rows_to_words, scalar_to_limbs
from ..utils.transfer import (
    pull_comps as _pull_comps,
    pull_planes as _pull_planes,
    pull_rows as _pull_rows,
)
from .constraints import PeriodicValueTable, _inv_divisor_numerator, _exemptions_eval
from ..air.transition import EvaluationFrame
from ..ops.felt import Felt

_JIT_CACHE = {}


def _jit(key, make):
    if key not in _JIT_CACHE:
        import jax

        _JIT_CACHE[key] = jax.jit(make())
    return _JIT_CACHE[key]


def _to_dev(pairs):
    import jax.numpy as jnp

    return tuple((jnp.asarray(lo), jnp.asarray(hi)) for lo, hi in pairs)


# ---------------------------------------------------------------------------
# Phase 1: batched trace interpolation + LDE + combined-row commitment
# ---------------------------------------------------------------------------


def trace_commit_kernel(n, w, length, blowup, offset, hasher, ext_deg):
    key = ("trace_commit", n, w, length, blowup, offset, hasher.NAME, ext_deg)
    import jax

    consts = {
        "inv": ntt.ntt_consts(length, True, device=True),
        "fwd": ntt.ntt_consts(length * blowup, False, device=True),
        "offs": tuple(jax.device_put(np.asarray(x)) for x in ntt.power_series(offset, length)),
    }

    def make():
        def fn(seg, consts):  # seg: tuple of ext_deg pairs, each (n, w, length)
            import jax.numpy as jnp

            polys = ntt.interpolate_poly(seg, consts=consts["inv"])
            lde = ntt.evaluate_poly_with_offset(
                polys, offset, blowup, offs=consts["offs"], consts=consts["fwd"]
            )
            L = length * blowup
            # rows: (n, w, L) -> (L, n, w) -> (L, n*w) per component
            rows = tuple(
                (
                    jnp.transpose(c[0], (2, 0, 1)).reshape(L, n * w),
                    jnp.transpose(c[1], (2, 0, 1)).reshape(L, n * w),
                )
                for c in lde
            )
            words = rows_to_words(rows, ext_deg)
            leaves = hasher.hash_words(words, n * w * ext_deg * 8)
            levels = [leaves]
            cur = leaves
            while cur.shape[0] > 1:
                cur = hasher.merge_words(cur[0::2], cur[1::2])
                levels.append(cur)
            return polys, lde, levels

        return fn

    fn = _jit(key, make)
    return lambda seg: fn(seg, consts)


# ---------------------------------------------------------------------------
# Phase 2+3: constraint evaluation -> combined composition poly -> commitment
# ---------------------------------------------------------------------------


def build_constraint_kernel(air0, domain, ext_deg, n, hasher, boundary_template):
    """Returns a jitted fn over:
      main_lde (n, w, L) pairs,
      t_coeffs: ext tuple of (n, K) pairs,
      b_values: list per group of per-constraint stacked data,
      b_coeffs: ext tuple of (n, A) pairs,
      final_powers: ext tuple of (n,) pairs
    producing (comp_columns coeffs (num_cols, len), comp_lde (num_cols, L),
    levels)."""
    ce = domain.ce_size
    L = domain.lde_size
    shift = domain.ce_to_lde_blowup
    blowup = domain.trace_to_lde_blowup
    trace_length = domain.trace_length
    num_cols = air0.context.num_constraint_composition_columns()
    K = air0.context.num_transition_constraints()

    import jax

    idx_cur = np.arange(ce) * shift
    idx_nxt = (idx_cur + blowup) % L

    periodic = PeriodicValueTable(air0)
    # static divisor data (host numpy constants, baked into the jit graph)
    divisors = [None] + [g.divisor for g in boundary_template.main_constraints]
    from ..air.divisors import ConstraintDivisor

    divisors[0] = ConstraintDivisor.from_transition(
        trace_length, air0.context.num_transition_exemptions
    )
    div_tables = []
    for d in divisors:
        z = _inv_divisor_numerator(d, domain)
        m = z[0].shape[0]
        idx = np.arange(ce) % m
        zfull = (z[0][idx], z[1][idx])
        if d.exemptions:
            zfull = gl.mul(zfull, _exemptions_eval(d, domain))
        div_tables.append(zfull)

    groups_static = []
    for g in boundary_template.main_constraints:
        cons = []
        for c in g.constraints:
            cons.append((c.column, len(c.poly), c.poly_offset))
        groups_static.append(cons)

    consts = {
        "idx_cur": jax.device_put(idx_cur),
        "idx_nxt": jax.device_put(idx_nxt),
        "div": [tuple(jax.device_put(np.asarray(x)) for x in t) for t in div_tables],
        "periodic": [
            tuple(jax.device_put(np.asarray(x)) for x in c) for c in periodic.columns
        ],
        "inv_ce": ntt.ntt_consts(ce, True, device=True),
        "inv_offs_ce": tuple(
            jax.device_put(np.asarray(x))
            for x in ntt.power_series(pow(domain.domain_offset, fs.P - 2, fs.P), ce)
        ),
        "fwd_L": ntt.ntt_consts(L, False, device=True),
        "offs_tl": tuple(
            jax.device_put(np.asarray(x))
            for x in ntt.power_series(domain.domain_offset, trace_length)
        ),
    }

    def make():
        def fn(main_lde, t_coeffs, b_single_vals, b_seq_vals, b_coeffs, final_powers, consts):
            import jax.numpy as jnp

            idx_cur = consts["idx_cur"]
            idx_nxt = consts["idx_nxt"]
            # frames over instance axis: Felt arrays shaped (n, ce)
            cur = [
                Felt(tuple((c[0][:, w_i, idx_cur], c[1][:, w_i, idx_cur]) for c in main_lde))
                for w_i in range(main_lde[0][0].shape[1])
            ]
            nxt = [
                Felt(tuple((c[0][:, w_i, idx_nxt], c[1][:, w_i, idx_nxt]) for c in main_lde))
                for w_i in range(main_lde[0][0].shape[1])
            ]
            frame = EvaluationFrame(cur, nxt)
            pv = [
                Felt(((jnp.broadcast_to(c[0], (n, ce)),
                       jnp.broadcast_to(c[1], (n, ce))),))
                for c in consts["periodic"]
            ]

            t_result = [None] * K
            air0.evaluate_transition(frame, pv, t_result)
            combined = vec.vzeros((n, ce), ext_deg, jnp)
            for k_i, ev in enumerate(t_result):
                coef = tuple((c[0][:, k_i : k_i + 1], c[1][:, k_i : k_i + 1]) for c in t_coeffs)
                combined = vec.vadd(combined, vec.vmul(coef, ev.c))

            columns = [combined]
            # boundary groups
            sv_idx = 0
            sq_idx = 0
            a_idx = 0
            for gi, cons in enumerate(groups_static):
                acc = vec.vzeros((n, ce), ext_deg, jnp)
                for column, poly_len, poly_offset in cons:
                    state = cur[column].c  # tuple of pairs (n, ce)
                    if poly_len == 1:
                        val = b_single_vals[sv_idx]  # pair (n, 1) base
                        sv_idx += 1
                        diff = vec.vsub(state, (val,))
                    else:
                        seq = b_seq_vals[sq_idx]  # pair (n, ce) — precomputed values over ce domain
                        sq_idx += 1
                        diff = vec.vsub(state, (seq,))
                    cc = tuple((c[0][:, a_idx : a_idx + 1], c[1][:, a_idx : a_idx + 1]) for c in b_coeffs)
                    a_idx += 1
                    acc = vec.vadd(acc, vec.vmul(cc, diff))
                columns.append(acc)

            # divide by divisors, sum columns
            acc = vec.vzeros((n, ce), ext_deg, jnp)
            for col, zt in zip(columns, consts["div"]):
                acc = vec.vadd(acc, vec.vmul(vec.promote(col, ext_deg), (zt,)))

            # interpolate each instance's combined evaluations
            coeffs = ntt.interpolate_poly_with_offset(
                acc, domain.domain_offset,
                inv_offs=consts["inv_offs_ce"], consts=consts["inv_ce"],
            )
            # combine across instances with final_coeff powers, sum over axis 0
            fp = tuple((c[0][:, None], c[1][:, None]) for c in final_powers)
            weighted = vec.vmul(coeffs, fp)  # (n, ce)
            final_comb = vec.vsum(weighted, axis=0)  # (ce,)

            comp_columns = tuple(
                (
                    c[0].reshape(ce // trace_length, trace_length)[:num_cols],
                    c[1].reshape(ce // trace_length, trace_length)[:num_cols],
                )
                for c in vec.promote(final_comb, ext_deg)
            )
            comp_lde = ntt.evaluate_poly_with_offset(
                comp_columns, domain.domain_offset, L // trace_length,
                offs=consts["offs_tl"], consts=consts["fwd_L"],
            )
            # commit rows
            rows = tuple((c[0].T, c[1].T) for c in comp_lde)
            words = rows_to_words(rows, ext_deg)
            leaves = hasher.hash_words(words, num_cols * ext_deg * 8)
            levels = [leaves]
            curlvl = leaves
            while curlvl.shape[0] > 1:
                curlvl = hasher.merge_words(curlvl[0::2], curlvl[1::2])
                levels.append(curlvl)
            return comp_columns, comp_lde, levels

        return fn

    key = ("constraints", type(air0).__name__, n, ce, L, ext_deg, hasher.NAME,
           tuple(tuple(cons) for cons in groups_static))
    fn = _jit(key, make)
    return lambda *args: fn(*args, consts)


# ---------------------------------------------------------------------------
# Phase 4: OOD evaluation + DEEP composition + LDE
# ---------------------------------------------------------------------------


def ood_eval_kernel(n, w, length, ext_deg, num_cols):
    key = ("ood", n, w, length, ext_deg, num_cols)

    def make():
        def fn(polys, comp_columns, z, zg):
            # polys: (n, w, len); evaluate all trace polys at z and z*g and
            # composition columns at z
            powz = vec.power_series_elem(z, length)
            powzg = vec.power_series_elem(zg, length)
            tz = vec.vsum(vec.vmul(powz, polys), axis=-1)  # (n, w) ext
            tzg = vec.vsum(vec.vmul(powzg, polys), axis=-1)
            hz = vec.vsum(vec.vmul(powz, vec.promote(comp_columns, len(z))), axis=-1)
            return tz, tzg, hz

        return fn

    return _jit(key, make)


def deep_kernel(n, w, length, blowup, offset, ext_deg, num_cols):
    key = ("deep", n, w, length, blowup, offset, ext_deg, num_cols)
    import jax

    consts = {
        "fwd_L": ntt.ntt_consts(length * blowup, False, device=True),
        "offs": tuple(jax.device_put(np.asarray(x)) for x in ntt.power_series(offset, length)),
    }

    def make():
        def fn(polys, comp_columns, z, zg, tz, tzg, hz, cc_traces, cc_constraints, consts):
            import jax.numpy as jnp

            # T1 = sum_{i,j} k_ij P_ij(x): weight polys (n,w,len) by k (n,w)
            k = tuple((c[0][..., None], c[1][..., None]) for c in cc_traces)
            weighted = vec.vmul(k, vec.promote(polys, ext_deg))  # (n, w, len)
            t_poly = vec.vsum(vec.vsum(weighted, axis=0), axis=0)  # (len,)
            # constants: sum_{i,j} k_ij * T_ij(z) (resp z*g)
            c1 = vec.vsum(vec.vsum(vec.vmul(cc_traces, tz), axis=-1), axis=-1)
            c2 = vec.vsum(vec.vsum(vec.vmul(cc_traces, tzg), axis=-1), axis=-1)
            t1 = _sub_const_dev(t_poly, c1)
            t2 = _sub_const_dev(t_poly, c2)
            q1 = vec.syn_div_binomial(t1, z)
            q2 = vec.syn_div_binomial(t2, zg)
            total = vec.vadd(q1, q2)
            # composition columns part
            for i in range(num_cols):
                col = tuple((c[0][i], c[1][i]) for c in comp_columns)
                col = vec.promote(col, ext_deg)
                ood_i = tuple((c[0][i : i + 1], c[1][i : i + 1]) for c in hz)
                col = _sub_const_dev(col, ood_i)
                q = vec.syn_div_binomial(col, z)
                kc = tuple((c[0][i : i + 1], c[1][i : i + 1]) for c in cc_constraints)
                total = vec.vadd(total, vec.vmul(q, kc))
            return ntt.evaluate_poly_with_offset(
                total, offset, blowup, offs=consts["offs"], consts=consts["fwd_L"]
            )

        return fn

    fn = _jit(key, make)
    return lambda *args: fn(*args, consts)


def _sub_const_dev(poly, value):
    """Subtract a (1,)-shaped element from coefficient 0 (device-friendly)."""
    import jax.numpy as jnp

    d = max(len(poly), len(value))
    poly = vec.promote(poly, d)
    value = vec.promote(value, d)
    out = []
    for c, v in zip(poly, value):
        first = gl.sub((c[0][:1], c[1][:1]), (v[0].reshape(1), v[1].reshape(1)))
        out.append(
            (
                jnp.concatenate([first[0], c[0][1:]]),
                jnp.concatenate([first[1], c[1][1:]]),
            )
        )
    return tuple(out)


# ---------------------------------------------------------------------------
# Phase 5: FRI layer step
# ---------------------------------------------------------------------------


def fri_hash_kernel(L, N, ext_deg, hasher):
    """Transpose + row-hash + Merkle levels for one FRI layer (the root must
    reach the transcript before alpha is drawn, so folding is separate)."""
    key = ("fri_hash", L, N, ext_deg, hasher.NAME)

    def make():
        def fn(evals):
            m = L // N
            transposed = tuple((c[0].reshape(N, m).T, c[1].reshape(N, m).T) for c in evals)
            words = rows_to_words(transposed, ext_deg)
            leaves = hasher.hash_words(words, N * ext_deg * 8)
            levels = [leaves]
            cur = leaves
            while cur.shape[0] > 1:
                cur = hasher.merge_words(cur[0::2], cur[1::2])
                levels.append(cur)
            return transposed, levels

        return fn

    return _jit(key, make)


def fri_fold_kernel(L, N, offset, ext_deg):
    key = ("fri_fold", L, N, offset, ext_deg)

    def make():
        def fn(transposed, alpha):
            from ..fri.prover import apply_drp_limbs

            return apply_drp_limbs(transposed, offset, alpha, ext_deg)

        return fn

    return _jit(key, make)


# ---------------------------------------------------------------------------
# Orchestration
# ---------------------------------------------------------------------------


class DeviceProver:
    """Mixin/driver for device-resident proving.  Subclass interface is the
    same as Prover (air_class / hasher / options / get_pub_inputs); aux-
    segment AIRs fall back to the host pipeline."""

    def prove_device(self, n: int, traces):
        pub0 = self.get_pub_inputs(traces[0])
        air_probe = self.air_class(traces[0].get_info(), pub0, self.options())
        if not getattr(self.hasher, "JITTABLE", True):
            # host-backed hasher (Rp62_248): no device commit path exists
            from .pipeline import Prover as _HostProver

            return _HostProver._generate_proof(
                self, n, traces, self.options().field_extension
            )
        if (traces[0].num_aux_segments() > 0
                or air_probe.field_spec().name != "f64"):
            # aux segments and limb fields run the device-resident mesh
            # kernels on a single-device mesh (collectives are no-ops);
            # byte-identical to the host pipeline like every other path
            from ..parallel.full_pipeline import prove_mesh
            from ..parallel.mesh import make_mesh

            return prove_mesh(self, n, traces, make_mesh(1))
        length = traces[0].length
        if length >= 16384:
            # large traces: the gather-free four-step pipeline (device_big)
            from . import device_big
            from ..math import scalar as _fs

            options = self.options()
            ext_deg = options.field_extension
            pub0 = self.get_pub_inputs(traces[0])
            air0 = self.air_class(traces[0].get_info(), pub0, options)
            dummy_ccs = [
                _fs.zero(ext_deg) if ext_deg > 1 else 0
            ] * air0.context.num_assertions()
            bt = air0.get_boundary_constraints(None, dummy_ccs)
            if device_big.supported(air0, bt, length, ext_deg):
                return device_big.prove_big(self, n, traces)
        return DeviceProver._generate_proof_device(self, n, traces)

    def _generate_proof_device(self, n, traces):
        import jax
        import jax.numpy as jnp

        from ..air.proof import Queries
        from ..crypto.merkle import MerkleTree
        from ..fri.prover import fold_positions
        from ..fri.proof import FriProof, FriProofLayer
        from .channel import ProverChannel
        from .commitment import build_segment_queries
        from .domain import StarkDomain

        options = self.options()
        ext_deg = options.field_extension
        hasher = self.hasher

        pub_inputs_vec = [self.get_pub_inputs(t) for t in traces]
        pub_elements_vec = [p.to_elements() for p in pub_inputs_vec]
        airs = [
            self.air_class(t.get_info(), p, options)
            for t, p in zip(traces, pub_inputs_vec)
        ]
        channel = ProverChannel(n, airs, pub_elements_vec, hasher, ext_deg)
        domain = StarkDomain(airs[0])
        w = traces[0].width
        length = traces[0].length
        blowup = domain.trace_to_lde_blowup
        L = domain.lde_size

        # ---- Phase 1: batched trace commitment ----
        stacked = np.stack([t.main_columns_u64() for t in traces])  # (n, w, len)
        seg = _to_dev((gl.from_u64(stacked),))
        k1 = trace_commit_kernel(n, w, length, blowup, domain.domain_offset, hasher, 1)
        polys, lde, levels = k1(seg)
        main_tree = MerkleTree(levels, hasher)
        channel.commit_trace(main_tree.root())

        # ---- Phase 2+3: constraints -> composition commitment ----
        t_coeffs_list, b_coeffs_list = [], []
        for _ in range(n):
            cc = channel.get_constraint_composition_coeffs()
            t_coeffs_list.append(cc.transition)
            b_coeffs_list.append(cc.boundary)
        final_coeff = channel.get_final_polynomial_coeffs()
        final_powers = [fs.fexp(final_coeff, i) for i in range(n)]

        # boundary structure + per-instance values
        dummy_ccs = [fs.zero(ext_deg) if ext_deg > 1 else 0] * airs[0].context.num_assertions()
        boundary_template = airs[0].get_boundary_constraints(None, dummy_ccs)
        per_instance = [air.get_boundary_constraints(None, dummy_ccs) for air in airs]
        b_single_vals, b_seq_vals = _stack_boundary_values(
            boundary_template, per_instance, domain, airs[0]
        )

        k2 = build_constraint_kernel(airs[0], domain, ext_deg, n, hasher, boundary_template)
        comp_columns, comp_lde, clevels = k2(
            lde,
            _stack_scalars(t_coeffs_list, ext_deg),
            [_to_dev((v,))[0] for v in b_single_vals],
            [_to_dev((v,))[0] for v in b_seq_vals],
            _stack_scalars(b_coeffs_list, ext_deg),
            _stack_scalars([[p] for p in final_powers], ext_deg, squeeze=True),
        )
        constraint_tree = MerkleTree(clevels, hasher)
        channel.commit_constraints(constraint_tree.root())

        # ---- Phase 4: OOD + DEEP ----
        num_cols = airs[0].context.num_constraint_composition_columns()
        z = channel.get_ood_point()
        g_trace = fs.get_root_of_unity(length.bit_length() - 1)
        zg = fs.fmul(z, g_trace)
        z_l = _to_dev(scalar_to_limbs(z, ext_deg))
        zg_l = _to_dev(scalar_to_limbs(zg, ext_deg))
        k3 = ood_eval_kernel(n, w, length, ext_deg, num_cols)
        tz, tzg, hz = k3(polys, comp_columns, z_l, zg_l)
        # pull ALL OOD limbs to host in one packed transfer; to_u64 on device
        # arrays would dispatch eager remote ops per limb, and per-array
        # pulls pay a tunnel round trip each
        planes = _pull_planes(
            [l for grp in (tz, tzg, hz) for c in grp for l in c]
        )
        k = len(tz)
        tz_h = np.stack(
            [gl.to_u64((planes[2 * i], planes[2 * i + 1])) for i in range(k)]
        )  # (deg, n, w)
        o = 2 * k
        tzg_h = np.stack(
            [gl.to_u64((planes[o + 2 * i], planes[o + 2 * i + 1]))
             for i in range(len(tzg))]
        )
        o += 2 * len(tzg)
        hz_h = np.stack(
            [gl.to_u64((planes[o + 2 * i], planes[o + 2 * i + 1]))
             for i in range(len(hz))]
        )
        ood_traces_states = []
        for i in range(n):
            at_z = [_elem_from(tz_h[:, i, j], ext_deg) for j in range(w)]
            at_zg = [_elem_from(tzg_h[:, i, j], ext_deg) for j in range(w)]
            ood_traces_states.append([at_z, at_zg])
        channel.send_ood_trace_states(ood_traces_states)
        ood_evaluations = [_elem_from(hz_h[:, j], ext_deg) for j in range(num_cols)]
        channel.send_ood_constraint_evaluations(ood_evaluations)

        cc = channel.get_deep_composition_coeffs()
        cc_traces = _stack_scalars(cc.traces, ext_deg)  # (n, w)
        cc_constraints = _stack_scalars([cc.constraints], ext_deg, squeeze=False)
        cc_constraints = tuple((c[0][0], c[1][0]) for c in cc_constraints)  # (num_cols,)
        k4 = deep_kernel(n, w, length, blowup, domain.domain_offset, ext_deg, num_cols)
        deep_evals = k4(polys, comp_columns, z_l, zg_l, tz, tzg, hz, cc_traces, cc_constraints)

        # ---- Phase 5: FRI ----
        fri_layers, remainder_elements = run_fri_phase(
            channel, deep_evals, options, domain, ext_deg, hasher
        )

        # ---- Phase 6: PoW + queries + assembly ----
        channel.grind_query_seed()
        positions = channel.get_query_positions()
        return assemble_proof(
            channel, positions, lde, comp_lde, main_tree, constraint_tree,
            fri_layers, remainder_elements, options, domain, n, ext_deg
        )


def run_fri_phase(channel, deep_evals, options, domain, ext_deg, hasher):
    """Phase 5: FRI layer commit/fold loop + remainder (shared by the small
    and big device pipelines).  Returns ([(transposed_dev, MerkleTree)],
    remainder_elements)."""
    from ..crypto.merkle import MerkleTree
    from ..ops import ntt

    L = deep_evals[0][0].shape[-1]
    fri_options = options.to_fri_options()
    N = fri_options.folding_factor
    evals = deep_evals
    fri_layers = []
    cur_L = L
    for _ in range(fri_options.num_fri_layers(L)):
        kh = fri_hash_kernel(cur_L, N, ext_deg, hasher)
        transposed, flevels = kh(evals)
        tree = MerkleTree(flevels, hasher)
        channel.commit_fri_layer(tree.root())
        alpha = channel.draw_fri_alpha()
        kf = fri_fold_kernel(cur_L, N, domain.domain_offset, ext_deg)
        evals = kf(transposed, _to_dev(scalar_to_limbs(alpha, ext_deg)))
        fri_layers.append((transposed, tree))
        cur_L //= N

    # materialize the (tiny) final-layer evaluations first: the remainder
    # interpolation would otherwise run EAGERLY on device arrays — dozens of
    # per-op remote dispatches through the tunnel
    evals = _pull_comps(evals)
    coeffs = ntt.interpolate_poly_with_offset(evals, domain.domain_offset)
    rem_size = evals[0][0].shape[-1] // fri_options.blowup_factor
    coeffs_h = tuple(
        (np.asarray(c[0][:rem_size]), np.asarray(c[1][:rem_size])) for c in coeffs
    )
    remainder_elements = limbs_to_elems(coeffs_h, ext_deg)
    channel.commit_fri_layer(hasher.hash_elements(remainder_elements))
    return fri_layers, remainder_elements


def assemble_proof(channel, positions, lde, comp_lde, main_tree, constraint_tree,
                   fri_layers, remainder_elements, options, domain, n, ext_deg):
    """Phase 6 tail: gather ONLY the queried rows off-device and build the
    StarkProof (shared by the small and big device pipelines)."""
    from ..air.proof import JointTraceQueries, Queries
    from ..fri.prover import fold_positions
    from ..fri.proof import FriProof, FriProofLayer

    fri_options = options.to_fri_options()
    N = fri_options.folding_factor
    L = domain.lde_size

    # positions per layer are pure host math: plan every gather up front so
    # all tree prefetches ride ONE dispatch and all row pulls another (each
    # separate pull is a ~100 ms tunnel round trip)
    from ..crypto.merkle import MerkleTree
    from ..utils.transfer import pull_rows_many

    layer_pos = []
    pos = list(positions)
    dsize = L
    for _transposed_dev, _tree in fri_layers:
        pos = fold_positions(pos, dsize, N)
        layer_pos.append(pos)
        dsize //= N
    MerkleTree.prefetch_trees(
        [(tree, lp) for (_, tree), lp in zip(fri_layers, layer_pos)]
        + [(main_tree, positions), (constraint_tree, positions)]
    )
    pulled = pull_rows_many(
        [(t, lp, 0) for (t, _), lp in zip(fri_layers, layer_pos)]
        + [(lde, positions, 2), (comp_lde, positions, 1)]
    )

    proof_layers = []
    for (transposed_dev, tree), pos, gathered in zip(
        fri_layers, layer_pos, pulled
    ):
        mp = tree.prove_batch(pos)
        rows = []
        for i in range(len(pos)):
            row_limbs = tuple((c[0][i], c[1][i]) for c in gathered)
            rows.append(limbs_to_elems(row_limbs, ext_deg))
        proof_layers.append(FriProofLayer.new(rows, mp, ext_deg))
    fri_proof = FriProof.new(proof_layers, remainder_elements, 1)

    main_rows = pulled[-2]  # (n, w, q)
    traces_states = []
    for i in range(n):
        rows = []
        for qi in range(len(positions)):
            row_limbs = tuple((c[0][i, :, qi], c[1][i, :, qi]) for c in main_rows)
            rows.append(limbs_to_elems(row_limbs, 1))
        traces_states.append(rows)
    comb_states = []
    for qi in range(len(positions)):
        row = []
        for ts in traces_states:
            row.extend(ts[qi])
        comb_states.append(row)
    trace_queries = [
        JointTraceQueries.new(main_tree.prove_batch(positions), comb_states, traces_states)
    ]

    comp_rows = pulled[-1]  # (num_cols, q)
    crows = []
    for qi in range(len(positions)):
        row_limbs = tuple((c[0][:, qi], c[1][:, qi]) for c in comp_rows)
        crows.append(limbs_to_elems(row_limbs, ext_deg))
    constraint_queries = Queries.new(constraint_tree.prove_batch(positions), crows, ext_deg)

    return channel.build_proof(trace_queries, constraint_queries, fri_proof)


def _stack_scalars(rows, ext_deg, squeeze=False):
    """rows: list (n) of lists (k) of elements -> ext tuple of (n, k) device
    pairs (or (n,) when squeeze and k == 1)."""
    import jax.numpy as jnp

    n = len(rows)
    k = len(rows[0])
    arr = np.zeros((ext_deg, n, k), dtype=np.uint64)
    for i, row in enumerate(rows):
        for j, e in enumerate(row):
            comps = fs.components(fs.embed(e, ext_deg))
            for c in range(ext_deg):
                arr[c, i, j] = comps[c]
    if squeeze:
        arr = arr[:, :, 0]
    return tuple(
        (jnp.asarray(p[0]), jnp.asarray(p[1]))
        for p in (gl.from_u64(arr[c]) for c in range(ext_deg))
    )


def _stack_boundary_values(template, per_instance, domain, air0):
    """Stack per-instance boundary constraint values.

    Returns (b_single_vals, b_seq_vals): lists in group/constraint order —
    single values as (n,1)-shaped base pairs, sequence/periodic polys as
    (n, ce) base pairs of their ce-domain evaluations."""
    n = len(per_instance)
    ce = domain.ce_size
    singles, seqs = [], []
    for gi, g in enumerate(template.main_constraints):
        for ci, c in enumerate(g.constraints):
            if len(c.poly) == 1:
                vals = np.array(
                    [per_instance[i].main_constraints[gi].constraints[ci].poly[0] for i in range(n)],
                    dtype=np.uint64,
                ).reshape(n, 1)
                singles.append(gl.from_u64(vals))
            else:
                rows = np.zeros((n, ce), dtype=np.uint64)
                for i in range(n):
                    poly = per_instance[i].main_constraints[gi].constraints[ci].poly
                    limbs = (gl.from_u64(np.array(poly, dtype=np.uint64)),)
                    if len(poly) < ce:
                        evals = ntt.evaluate_poly_with_offset(
                            limbs, air0.domain_offset(), ce // len(poly)
                        )
                    else:
                        evals = ntt.evaluate_poly(limbs)
                    step_offset = c.poly_offset[0] * air0.ce_blowup_factor()
                    m = evals[0][0].shape[0]
                    idx = (np.arange(ce) - step_offset) % m
                    rows[i] = gl.to_u64((evals[0][0][idx], evals[0][1][idx]))
                seqs.append(gl.from_u64(rows))
    return singles, seqs


def _elem_from(comps_u64, ext_deg):
    if ext_deg == 1:
        return int(comps_u64[0])
    return tuple(int(comps_u64[c]) for c in range(ext_deg))
