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
        ood_traces_states[i] = [evals@z, evals@zg] (host element lists).

        Fully batched over instances AND columns: one (n_tr, W, n) multiply
        + column-sum, two batched synthetic divisions, one instance-sum —
        the per-column loop of composer/mod.rs:63-153 collapses to array
        ops (exact modular arithmetic, so any summation order is
        byte-identical)."""
        B = self.B
        s = B.spec
        d = self.ext_deg
        n = traces_polys[0]["main"][0][0].shape[-1]
        g = B.get_root_of_unity(n.bit_length() - 1)
        z = self.z
        next_z = s.fmul(z, g)
        n_tr = len(traces_polys)

        # stacked column polys: (n_tr, W, n) ext comps (main + aux segments)
        per_inst = []
        for polys in traces_polys:
            groups = [B.promote(polys["main"], d)] + [
                B.promote(a, d) for a in polys.get("aux", [])
            ]
            per_inst.append(tuple(
                tuple(
                    np.concatenate(
                        [np.asarray(grp[c][l]) for grp in groups], axis=0
                    )
                    for l in range(len(groups[0][c]))
                )
                for c in range(d)
            ))
        stacked = tuple(
            tuple(
                np.stack([inst[c][l] for inst in per_inst])
                for l in range(len(per_inst[0][c]))
            )
            for c in range(d)
        )
        W = stacked[0][0].shape[1]

        # composition coefficients: (n_tr, W, 1) ext comps
        cc_flat = [self.cc.traces[i][j] for i in range(n_tr) for j in range(W)]
        ccs = tuple(
            tuple(np.asarray(l).reshape(n_tr, W, 1) for l in c)
            for c in B.elems_to_limbs(cc_flat, d)
        )

        contrib = B.vmul(ccs, stacked)       # (n_tr, W, n)
        t = B.vsum(contrib, axis=1)          # (n_tr, n)

        # per-instance OOD constants: sum_j cc_ij * P_j(z) (resp. z*g)
        def ood_consts(row):
            vals = []
            for i in range(n_tr):
                acc = 0 if d == 1 else s.zero(d)
                for j in range(W):
                    acc = s.fadd(
                        acc,
                        s.fmul(ood_traces_states[i][row][j],
                               self.cc.traces[i][j]),
                    )
                vals.append(acc)
            return tuple(
                tuple(np.asarray(l) for l in c)
                for c in B.elems_to_limbs(vals, d)
            )

        t1 = _sub_const_batch(t, ood_consts(0), B)
        t2 = _sub_const_batch(t, ood_consts(1), B)

        q1 = B.syn_div_binomial(t1, B.scalar_to_limbs(z, d))
        q2 = B.syn_div_binomial(t2, B.scalar_to_limbs(next_z, d))
        total = B.vsum(B.vadd(q1, q2), axis=0)

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


def _sub_const_batch(t, vals, B):
    """Subtract per-row scalars (comps shaped (n_tr,)) from coefficient 0 of
    a batched coeff table (comps shaped (n_tr, n))."""
    out = []
    for c, v in zip(t, vals):
        first = B.bsub(
            tuple(l[:, :1] for l in c), tuple(l[:, None] for l in v)
        )
        out.append(tuple(
            np.concatenate([f, l[:, 1:]], axis=1) for f, l in zip(first, c)
        ))
    return tuple(out)


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
