"""DEEP composition polynomial — equivalent of prover/src/composer/mod.rs.

StarkPack semantics: per trace i,
  T1_i = sum_j cc.traces[i][j] * (P_j(x) - P_j(z)),
  T2_i = sum_j cc.traces[i][j] * (P_j(x) - P_j(z*g)),
divided by (x - z) and (x - z*g) respectively, summed across traces
(composer/mod.rs:63-153); then composition columns H_k divided by (x - z)
scaled by cc.constraints[k] added in (mod.rs:168-193).

The sequential synthetic divisions become parallel suffix-scan divisions
(ops/vec.py syn_div_binomial).
"""

from __future__ import annotations

import numpy as np

from ..math import scalar as fs
from ..ops import gl64 as gl, vec
from ..utils.convert import scalar_to_limbs


class DeepCompositionPoly:
    def __init__(self, z, cc, ext_deg: int):
        self.z = z
        self.cc = cc
        self.ext_deg = ext_deg
        self.coefficients = None  # component tuple, shape (n,)

    def add_trace_polys(self, traces_polys, ood_traces_states):
        """traces_polys: list (per trace) of dicts with 'main' -> component
        tuple (w, n) base polys and 'aux' -> list of ext component tuples.
        ood_traces_states[i] = [evals@z, evals@zg] (host element lists)."""
        d = self.ext_deg
        n = traces_polys[0]["main"][0][0].shape[-1]
        g = fs.get_root_of_unity(n.bit_length() - 1)
        z = self.z
        next_z = fs.fmul(z, g)

        total = None
        for index, polys in enumerate(traces_polys):
            ccs = self.cc.traces[index]
            t1 = vec.vzeros((n,), d)
            t2 = vec.vzeros((n,), d)
            col = 0
            # main polys: (w, n) base
            main = polys["main"]
            w = main[0][0].shape[0]
            for j in range(w):
                poly_j = tuple((c[0][j], c[1][j]) for c in main)
                k = vec.vbroadcast(scalar_to_limbs(ccs[col], d), (n,))
                contrib = vec.vmul(k, poly_j)
                t1 = vec.vadd(t1, contrib)
                t2 = vec.vadd(t2, contrib)
                # subtract k * P_j(z) (resp z*g) from constant coefficient
                t1 = _sub_const(t1, fs.fmul(ood_traces_states[index][0][col], ccs[col]), d)
                t2 = _sub_const(t2, fs.fmul(ood_traces_states[index][1][col], ccs[col]), d)
                col += 1
            for aux in polys.get("aux", []):
                wa = aux[0][0].shape[0]
                for j in range(wa):
                    poly_j = tuple((c[0][j], c[1][j]) for c in aux)
                    k = vec.vbroadcast(scalar_to_limbs(ccs[col], d), (n,))
                    contrib = vec.vmul(k, poly_j)
                    t1 = vec.vadd(t1, contrib)
                    t2 = vec.vadd(t2, contrib)
                    t1 = _sub_const(t1, fs.fmul(ood_traces_states[index][0][col], ccs[col]), d)
                    t2 = _sub_const(t2, fs.fmul(ood_traces_states[index][1][col], ccs[col]), d)
                    col += 1

            q1 = vec.syn_div_binomial(t1, scalar_to_limbs(z, d))
            q2 = vec.syn_div_binomial(t2, scalar_to_limbs(next_z, d))
            trace_poly = vec.vadd(q1, q2)
            total = trace_poly if total is None else vec.vadd(total, trace_poly)

        self.coefficients = total
        assert self.degree() == n - 2, f"DEEP degree {self.degree()} != {n - 2}"

    def add_composition_poly(self, composition_columns, ood_evaluations):
        """composition_columns: component tuple (num_cols, n).
        (composer/mod.rs:168-193)."""
        assert self.coefficients is not None
        d = self.ext_deg
        num_cols, n = composition_columns[0][0].shape
        z = self.z
        for i in range(num_cols):
            col = tuple((c[0][i], c[1][i]) for c in composition_columns)
            col = vec.promote(col, d)
            col = _sub_const(col, ood_evaluations[i], d)
            q = vec.syn_div_binomial(col, scalar_to_limbs(z, d))
            k = vec.vbroadcast(scalar_to_limbs(self.cc.constraints[i], d), (n,))
            self.coefficients = vec.vadd(self.coefficients, vec.vmul(q, k))
        assert self.degree() == n - 2

    def degree(self) -> int:
        for i in range(self.coefficients[0][0].shape[-1] - 1, -1, -1):
            for c in self.coefficients:
                if int(c[0][i]) or int(c[1][i]):
                    return i
        return 0


def _sub_const(poly, value, d):
    """Subtract a scalar element from coefficient 0 of a coeff vector."""
    vl = scalar_to_limbs(value, d)
    out = []
    for c, v in zip(vec.promote(poly, d), vl):
        first = gl.sub((c[0][:1], c[1][:1]), (np.asarray(v[0]), np.asarray(v[1])))
        out.append(
            (
                np.concatenate([first[0], c[0][1:]]),
                np.concatenate([first[1], c[1][1:]]),
            )
        )
    return tuple(out)
