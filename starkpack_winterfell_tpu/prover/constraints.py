"""Vectorized constraint evaluation — equivalent of
prover/src/constraints/{evaluator,boundary,periodic_table,evaluation_table}.rs.

The reference walks the constraint-evaluation domain row by row
(evaluator.rs:140-241); here every constraint is evaluated over the whole ce
domain at once as limb-array operations: the user's ``evaluate_transition``
runs a single time on Felt arrays of shape (ce_size,).  All field arithmetic
goes through the AIR's FieldBackend, so the same evaluator serves f64, f62
and f128 AIRs.
"""

from __future__ import annotations

import numpy as np

from ..air.transition import EvaluationFrame
from ..ops.backend import get_backend
from ..ops.felt import Felt


class PeriodicValueTable:
    """prover/src/constraints/periodic_table.rs — per-column ce-domain values.
    Vectorized: column j's value at ce step i is evals_j[i % len_j]."""

    def __init__(self, air, backend=None):
        self.B = backend if backend is not None else get_backend(
            air.field_spec().name
        )
        B = self.B
        self.columns = []
        polys = air.get_periodic_column_polys()
        if not polys:
            return
        ce = air.ce_domain_size()
        for poly in polys:
            poly_size = len(poly)
            num_cycles = air.trace_length() // poly_size
            offset = pow(air.domain_offset(), num_cycles, B.P)
            limbs = B.elems_to_limbs(poly, 1)
            evals = B.evaluate_poly_with_offset(
                (limbs[0],), offset, air.ce_blowup_factor()
            )[0]
            n = evals[0].shape[0]
            idx = np.arange(ce) % n
            self.columns.append(B.cmap(lambda l: l[idx], evals))

    def as_felts(self):
        return [Felt((c,), B=self.B) for c in self.columns]


class ConstraintEvaluator:
    """prover/src/constraints/evaluator.rs:20 — per-AIR vectorized."""

    def __init__(self, air, aux_rand_elements, composition_coefficients, ext_deg: int,
                 backend=None):
        self.air = air
        self.ext_deg = ext_deg
        self.B = backend if backend is not None else get_backend(
            air.field_spec().name
        )
        self.transition_constraints = air.get_transition_constraints(
            composition_coefficients.transition
        )
        self.periodic_values = PeriodicValueTable(air, self.B)
        self.aux_rand_elements = aux_rand_elements
        self.boundary = air.get_boundary_constraints(
            aux_rand_elements, composition_coefficients.boundary
        )

    def evaluate(self, main_lde, aux_ldes, domain):
        """main_lde: single-component tuple shaped (width, L).  aux_ldes:
        list of component-tuples shaped (width_aux, L).  Returns (columns,
        divisors): columns[0] = combined transition evaluations, columns[1..]
        = boundary groups, each a component tuple of shape (ce_size,)."""
        B = self.B
        ce = domain.ce_size
        L = domain.lde_size
        shift = domain.ce_to_lde_blowup
        blowup = domain.trace_to_lde_blowup

        idx_cur = np.arange(ce) * shift
        idx_nxt = (idx_cur + blowup) % L

        def frame_from(lde_comps, deg):
            comps_cur = tuple(B.cmap(lambda l: l[:, idx_cur], c) for c in lde_comps)
            comps_nxt = tuple(B.cmap(lambda l: l[:, idx_nxt], c) for c in lde_comps)
            width = comps_cur[0][0].shape[0]
            cur = [
                Felt(tuple(B.cmap(lambda l: l[w], c) for c in comps_cur), B=B)
                for w in range(width)
            ]
            nxt = [
                Felt(tuple(B.cmap(lambda l: l[w], c) for c in comps_nxt), B=B)
                for w in range(width)
            ]
            return EvaluationFrame(cur, nxt)

        main_frame = frame_from(main_lde, 1)
        periodic = self.periodic_values.as_felts()

        # transition constraints (combined into column 0)
        n_main = self.transition_constraints.num_main_constraints()
        t_result = [None] * n_main
        self.air.evaluate_transition(main_frame, periodic, t_result)
        combined = B.vzeros((ce,), self.ext_deg)
        for ev, coef in zip(t_result, self.transition_constraints.main_constraint_coef):
            coef_l = B.vbroadcast(B.scalar_to_limbs(coef, self.ext_deg), (ce,))
            combined = B.vadd(combined, B.vmul(coef_l, ev.c))

        aux_frame = None
        if aux_ldes:
            aux_frame = frame_from(aux_ldes[0], self.ext_deg)
            n_aux = self.transition_constraints.num_aux_constraints()
            a_result = [None] * n_aux
            self.air.evaluate_aux_transition(
                main_frame, aux_frame, periodic, self.aux_rand_elements, a_result
            )
            for ev, coef in zip(
                a_result, self.transition_constraints.aux_constraint_coef
            ):
                coef_l = B.vbroadcast(B.scalar_to_limbs(coef, self.ext_deg), (ce,))
                combined = B.vadd(combined, B.vmul(coef_l, ev.c))

        columns = [combined]
        divisors = [self.transition_constraints.divisor]

        # boundary constraint groups
        x = domain.ce_x()  # (ce,) base component
        main_state = main_frame.current()
        for group in self.boundary.main_constraints:
            columns.append(
                _evaluate_boundary_group(group, main_state, x, domain, 1,
                                         self.ext_deg, self.air, B)
            )
            divisors.append(group.divisor)
        if aux_frame is not None:
            aux_state = aux_frame.current()
            for group in self.boundary.aux_constraints:
                # merge into an existing group with the same divisor, like
                # prover/src/constraints/boundary.rs:30-39
                col = _evaluate_boundary_group(
                    group, aux_state, x, domain, self.ext_deg, self.ext_deg,
                    self.air, B
                )
                for gi, d in enumerate(divisors):
                    if gi > 0 and d == group.divisor:
                        columns[gi] = B.vadd(columns[gi], col)
                        break
                else:
                    columns.append(col)
                    divisors.append(group.divisor)
        return columns, divisors


def _evaluate_boundary_group(group, state, x, domain, state_deg, ext_deg, air, B):
    """One boundary group over the whole ce domain: sum of
    cc_k * (state[col_k] - value_poly_k(x))."""
    spec = B.spec
    ce = x[0].shape[0]
    numerator = B.vzeros((ce,), ext_deg)
    for constraint in group.constraints:
        poly = constraint.poly
        poly_deg = 1 if isinstance(poly[0], int) else len(spec.components(poly[0]))
        if len(poly) == 1:
            value = B.vbroadcast(B.scalar_to_limbs(poly[0], poly_deg), (ce,))
        elif len(poly) < 64:
            # Horner at x * x_offset (boundary.rs SmallPolyConstraint)
            xo = constraint.poly_offset[1]
            xs = B.bmul(x, B.b_from_int(xo, (1,)))
            coeff_limbs = B.elems_to_limbs(poly, poly_deg)
            # stack coefficients along a new last axis for horner
            stacked = tuple(
                B.cmap(lambda l: np.broadcast_to(l[None, :], (ce, len(poly))), c)
                for c in coeff_limbs
            )
            value = B.horner(stacked, (xs,))
        else:
            # LargePolyConstraint: LDE of the value poly over the ce domain
            limbs = B.elems_to_limbs(poly, poly_deg)
            evals = B.evaluate_poly_with_offset(
                limbs, air.domain_offset(), air.ce_domain_size() // len(poly)
            )
            step_offset = constraint.poly_offset[0] * air.ce_blowup_factor()
            n = evals[0][0].shape[0]
            idx = (np.arange(ce) - step_offset) % n
            value = tuple(B.cmap(lambda l: l[idx], c) for c in evals)
        evaluation = B.vsub(state[constraint.column].c, value)
        cc = B.vbroadcast(B.scalar_to_limbs(constraint.cc, ext_deg), (ce,))
        numerator = B.vadd(numerator, B.vmul(cc, evaluation))
    return numerator


def apply_divisors(columns, divisors, domain):
    """Divide each ce-domain column by its divisor and sum — equivalent of
    into_comb_poly's acc_column loop (evaluation_table.rs:166-186,336-425).

    Returns the combined evaluations (component tuple, shape (ce,))."""
    B = domain.B
    ce = domain.ce_size
    ext_deg = max(len(c) for c in columns)
    acc = B.vzeros((ce,), ext_deg)
    for column, divisor in zip(columns, divisors):
        z = _inv_divisor_numerator(divisor, domain)  # base component, period
        n = z[0].shape[0]
        idx = np.arange(ce) % n
        zfull = B.cmap(lambda l: l[idx], z)
        if divisor.exemptions:
            e = _exemptions_eval(divisor, domain)
            zfull = B.bmul(zfull, e)
        acc = B.vadd(acc, B.vmul(B.promote(column, ext_deg), (zfull,)))
    return acc


def _inv_divisor_numerator(divisor, domain):
    """Batch-inverted evaluations of (x^a - b) over its period
    (evaluation_table.rs get_inv_evaluation)."""
    B = domain.B
    a, b = divisor.numerator[0]
    n = domain.ce_size // a
    # x^a over the ce domain has period n: (offset*g^i)^a = offset^a * g^(ia)
    g_a = pow(domain.ce_domain_generator(), a, B.P)
    offs_a = pow(domain.domain_offset, a, B.P)
    xs = B.power_series(g_a, n)
    xs = B.bmul(xs, B.b_from_int(offs_a, (1,)))
    b_comp = B.b_from_int(b, (1,))
    vals = B.bsub(xs, B.cmap(lambda l: np.broadcast_to(l, xs[0].shape), b_comp))
    return B.b_batch_inv(vals)


def _exemptions_eval(divisor, domain):
    """prod (x - e_j) over the ce domain (base component, shape (ce,))."""
    B = domain.B
    x = domain.ce_x()
    result = B.b_ones(x[0].shape, np)
    for e in divisor.exemptions:
        ep = B.b_from_int(e, (1,))
        term = B.bsub(x, B.cmap(lambda l: np.broadcast_to(l, x[0].shape), ep))
        result = B.bmul(result, term)
    return result
