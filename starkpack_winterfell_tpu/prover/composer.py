"""DEEP composition polynomial — equivalent of prover/src/composer/mod.rs.

StarkPack semantics: per trace i,
  T1_i = sum_j cc.traces[i][j] * (P_j(x) - P_j(z)),
  T2_i = sum_j cc.traces[i][j] * (P_j(x) - P_j(z*g)),
divided by (x - z) and (x - z*g) respectively, summed across traces
(composer/mod.rs:63-153); then composition columns H_k divided by (x - z)
scaled by cc.constraints[k] added in (mod.rs:168-193).

The sequential synthetic divisions become parallel suffix-scan divisions
(FieldBackend.syn_div_binomial); all arithmetic runs through the backend so
the same composer serves every base field.
"""

from __future__ import annotations

import numpy as np

from ..ops.backend import get_backend


class DeepCompositionPoly:
    def __init__(self, z, cc, ext_deg: int, backend=None):
        self.B = backend if backend is not None else get_backend("f64")
        self.z = z
        self.cc = cc
        self.ext_deg = ext_deg
        self.coefficients = None  # component tuple, shape (n,)

    def add_trace_polys(self, traces_polys, ood_traces_states):
        """traces_polys: list (per trace) of dicts with 'main' -> component
        tuple (w, n) base polys and 'aux' -> list of ext component tuples.
        ood_traces_states[i] = [evals@z, evals@zg] (host element lists)."""
        B = self.B
        s = B.spec
        d = self.ext_deg
        n = traces_polys[0]["main"][0][0].shape[-1]
        g = B.get_root_of_unity(n.bit_length() - 1)
        z = self.z
        next_z = s.fmul(z, g)

        total = None
        for index, polys in enumerate(traces_polys):
            ccs = self.cc.traces[index]
            t1 = B.vzeros((n,), d)
            t2 = B.vzeros((n,), d)
            col = 0

            def accumulate(poly_j, t1, t2, col):
                k = B.vbroadcast(B.scalar_to_limbs(ccs[col], d), (n,))
                contrib = B.vmul(k, poly_j)
                t1 = B.vadd(t1, contrib)
                t2 = B.vadd(t2, contrib)
                t1 = _sub_const(
                    t1, s.fmul(ood_traces_states[index][0][col], ccs[col]), d, B
                )
                t2 = _sub_const(
                    t2, s.fmul(ood_traces_states[index][1][col], ccs[col]), d, B
                )
                return t1, t2

            main = polys["main"]
            w = main[0][0].shape[0]
            for j in range(w):
                poly_j = tuple(B.cmap(lambda l: l[j], c) for c in main)
                t1, t2 = accumulate(poly_j, t1, t2, col)
                col += 1
            for aux in polys.get("aux", []):
                wa = aux[0][0].shape[0]
                for j in range(wa):
                    poly_j = tuple(B.cmap(lambda l: l[j], c) for c in aux)
                    t1, t2 = accumulate(poly_j, t1, t2, col)
                    col += 1

            q1 = B.syn_div_binomial(t1, B.scalar_to_limbs(z, d))
            q2 = B.syn_div_binomial(t2, B.scalar_to_limbs(next_z, d))
            trace_poly = B.vadd(q1, q2)
            total = trace_poly if total is None else B.vadd(total, trace_poly)

        self.coefficients = total
        assert self.degree() == n - 2, f"DEEP degree {self.degree()} != {n - 2}"

    def add_composition_poly(self, composition_columns, ood_evaluations):
        """composition_columns: component tuple (num_cols, n).
        (composer/mod.rs:168-193)."""
        assert self.coefficients is not None
        B = self.B
        d = self.ext_deg
        num_cols, n = composition_columns[0][0].shape
        z = self.z
        for i in range(num_cols):
            col = tuple(B.cmap(lambda l: l[i], c) for c in composition_columns)
            col = B.promote(col, d)
            col = _sub_const(col, ood_evaluations[i], d, B)
            q = B.syn_div_binomial(col, B.scalar_to_limbs(z, d))
            k = B.vbroadcast(B.scalar_to_limbs(self.cc.constraints[i], d), (n,))
            self.coefficients = B.vadd(self.coefficients, B.vmul(q, k))
        assert self.degree() == n - 2

    def degree(self) -> int:
        for i in range(self.coefficients[0][0].shape[-1] - 1, -1, -1):
            for c in self.coefficients:
                if any(int(l[i]) for l in c):
                    return i
        return 0


def _sub_const(poly, value, d, B):
    """Subtract a scalar element from coefficient 0 of a coeff vector."""
    vl = B.scalar_to_limbs(value, d)
    out = []
    for c, v in zip(B.promote(poly, d), vl):
        first = B.bsub(
            B.cmap(lambda l: l[:1], c), B.cmap(np.asarray, v)
        )
        out.append(
            tuple(
                np.concatenate([f, l[1:]]) for f, l in zip(first, c)
            )
        )
    return tuple(out)
