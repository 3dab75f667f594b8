"""HBM-bounded coset-streamed proving phases (round 4).

The one-shot device pipeline materializes the full blowup-B LDE plus the
four-step NTT temporaries of every column at once — ~14x the LDE bytes at
peak (measured: the lamport-agg 1024-sig config demanded 27.3 GB of a
15.75 GB chip, .exp/agg1024_b192.err).  The reference does the same
workload in 7.6 GB of laptop RAM (/root/reference/README.md:417-426)
because rayon chunks rows; the TPU-native equivalent is COSET streaming:

  x_i at natural LDE index i = q*blowup + r lies on coset r, element q —
  so the LDE decomposes into `blowup` trace-length NTTs
  (math/src/fft/serial.rs:26-57's chunked evaluation, one coset at a time),
  and an evaluation frame's "next" step (x*g_trace) stays ON the same
  coset (element q+1): constraint evaluation per coset is a roll, with no
  cross-coset communication at all.

Streamed phases (single-device, main-segment-only):
  P1  interpolate once -> per-coset {NTT + row-hash} -> interleave leaves
      -> Merkle levels.  Peak memory: polys + ONE coset working set.
  P2  per-coset constraint evaluation directly on the coset NTT output
      (re-evaluated from the polys — the LDE is never materialized).
      Periodic tables ride at their natural period (the (ce,) expansion of
      27 lamport-agg columns would be 3.6 GB at 2^23); sequence-assertion
      values are NTT'd from their (n, m) coefficients in-kernel.
  P3  per-coset composition LDE + commit, same shape as P1.
  P8  query rows are re-derived per needed coset from the polys (the same
      jitted kernel as P1 -> identical values -> Merkle paths check out).

Every kernel takes the coset index as a TRACED scalar (tables are sliced
in-kernel via reshape + dynamic_index), so each phase is ONE compile and
`blowup` calls.  Byte-identity with the host pipeline is exactness of
values: every substituted computation produces the same canonical field
elements, so hashes, transcripts and proof bytes are unchanged
(tests/test_streamed.py pins this against Prover.prove on the host).
"""

from __future__ import annotations

import os

import numpy as np

from ..air.transition import EvaluationFrame
from ..ops.felt import Felt

# ---------------------------------------------------------------------------
# HBM budget
# ---------------------------------------------------------------------------

#: bytes the one-shot path may demand before prove_mesh switches to the
#: streamed kernels.  Default sized for a 16 GB v5e chip with headroom for
#: the resident tables; override with STARKPACK_HBM_BUDGET (bytes).
DEFAULT_BUDGET = 10_000_000_000

#: peak-demand multiplier of the one-shot pipeline in units of LDE bytes,
#: calibrated against the round-3 OOM dump (27.3 GB demanded / 1.9 GB LDE
#: at lamport-agg-1024: four-step temps + a2a copy + row words + leaves).
ONESHOT_PEAK_FACTOR = 14


def budget_bytes() -> int:
    return int(os.environ.get("STARKPACK_HBM_BUDGET", DEFAULT_BUDGET))


def oneshot_peak_estimate(n_pad: int, w: int, length: int, blowup: int,
                          el_bytes: int) -> int:
    """Upper-bound estimate of the one-shot mesh pipeline's peak HBM demand.
    `w` is the EFFECTIVE width: main width + aux widths x ext degree."""
    lde = n_pad * w * length * blowup * el_bytes
    return ONESHOT_PEAK_FACTOR * lde


def should_stream(n_pad, w, length, blowup, el_bytes, d, has_aux=False) -> bool:
    """Aux-segment AIRs stream too (round 5); only a mesh with d > 1 keeps
    the sharded one-shot path (its per-device share is already 1/d of the
    peak — prove_mesh preflight-checks that share against the budget and
    fails fast instead of OOMing after a multi-hour compile)."""
    if d != 1:
        return False
    return oneshot_peak_estimate(n_pad, w, length, blowup,
                                 el_bytes) > budget_bytes()


def preflight_check(n_pad, w_eff, length, blowup, el_bytes, d, stream):
    """Fail fast BEFORE tracing when the chosen path cannot fit the budget
    (VERDICT r4 item 3: should_stream returning False must not mean 'OOM
    after a 2-hour compile').  Override with STARKPACK_HBM_PREFLIGHT=0."""
    if stream or os.environ.get("STARKPACK_HBM_PREFLIGHT") == "0":
        return
    demand = oneshot_peak_estimate(n_pad, w_eff, length, blowup, el_bytes)
    per_device = demand // max(d, 1)
    if per_device > budget_bytes():
        from ..errors import ProverError

        raise ProverError(
            f"one-shot pipeline projects ~{demand / 1e9:.1f} GB peak HBM "
            f"(~{per_device / 1e9:.1f} GB/device over {d} devices) against "
            f"a {budget_bytes() / 1e9:.1f} GB budget; the coset-streamed "
            f"path only runs single-device — use a 1-device mesh, raise "
            f"STARKPACK_HBM_BUDGET, or set STARKPACK_HBM_PREFLIGHT=0 to "
            f"attempt it anyway"
        )


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


def _dyn_row(comps, idx):
    """Row `idx` (traced) of the leading axis of a limb-comps tuple."""
    import jax

    return tuple(
        jax.lax.dynamic_index_in_dim(l, idx, axis=0, keepdims=False)
        for l in comps
    )


def _coset_slice(comps, rc, cb, length):
    """Per-coset values of a period-m table over the ce domain:
    full[j] = tab[j % m], coset rc gives tile(tab[rc::cb], length*cb/m) —
    rc traced, so the slice is a reshape + dynamic column index."""
    import jax
    import jax.numpy as jnp

    m = comps[0].shape[0]
    assert m % cb == 0, "table period must be a multiple of the ce blowup"
    out = []
    for l in comps:
        sl = jax.lax.dynamic_index_in_dim(
            l.reshape(m // cb, cb), rc, axis=1, keepdims=False
        )  # (m//cb,)
        out.append(jnp.tile(sl, length // (m // cb)))
    return tuple(out)


def _offsets_table(B, offset: int, length: int, blowup: int):
    """(blowup, length) power-series table: row r = (offset*g_L^r)^q —
    the same construction as full_pipeline.sharded_lde_blocks."""
    L = length * blowup
    g_L = B.get_root_of_unity(L.bit_length() - 1)
    rows = []
    for r in range(blowup):
        o_r = (offset * pow(g_L, r, B.P)) % B.P
        rows.append(B.power_series(o_r, length))
    return tuple(
        np.stack([rows[r][li] for r in range(blowup)])
        for li in range(len(rows[0]))
    )


def compact_periodic_tables(air0, B):
    """Periodic-column ce evaluations at their NATURAL period
    (prover/constraints.py PeriodicValueTable without the (ce,) index
    expansion): list of (m_p,) limb tuples, m_p = poly_size * ce_blowup."""
    out = []
    for poly in air0.get_periodic_column_polys():
        poly_size = len(poly)
        num_cycles = air0.trace_length() // poly_size
        offset = pow(air0.domain_offset(), num_cycles, B.P)
        limbs = B.elems_to_limbs(poly, 1)
        evals = B.evaluate_poly_with_offset(
            (limbs[0],), offset, air0.ce_blowup_factor()
        )[0]
        out.append(tuple(np.asarray(l) for l in evals))
    return out


def _seq_scale_tables(B, ce: int, cb: int, m: int):
    """(cb, m) table: row rc = (g_ce^rc)^j for j < m.  Scaling a sequence
    poly's coefficients by row rc then evaluating at a static offset o is
    exactly evaluating at offset o*g_ce^rc (the per-coset points)."""
    g_ce = B.get_root_of_unity(ce.bit_length() - 1)
    rows = [B.power_series(pow(g_ce, rc, B.P), m) for rc in range(cb)]
    return tuple(
        np.stack([rows[rc][li] for rc in range(cb)])
        for li in range(len(rows[0]))
    )


def _merkle_levels(hasher, leaves):
    levels = [leaves]
    cur = leaves
    while cur.shape[0] > 1:
        cur = hasher.merge_words(cur[0::2], cur[1::2])
        levels.append(cur)
    return levels


# ---------------------------------------------------------------------------
# P1: streamed trace commitment
# ---------------------------------------------------------------------------


def streamed_segment_commit(B, hasher, n, w, length, blowup, offset, deg,
                            _cached):
    """Returns call(stacked) -> (polys_dev, main_tree_levels).  stacked:
    deg-tuple of limb tuples (n, w, length).  Byte-identical leaves/levels
    to full_pipeline.sharded_segment_commit on one device."""
    import jax
    import jax.numpy as jnp

    spec_name = B.spec.name

    k_interp = _cached(
        ("stream_interp", spec_name, n, w, length, deg),
        lambda: jax.jit(lambda comps: B.interpolate_poly(comps)),
    )

    def make_coset_leaves():
        def fn(polys, offs_full, r):
            offs = tuple(l[None, None, :] for l in _dyn_row(offs_full, r))
            scaled = tuple(B.bmul(c, offs) for c in polys)
            evals = B.evaluate_poly_with_offset(scaled, 1, 1)
            rt = tuple(
                tuple(jnp.transpose(l, (2, 0, 1)).reshape(length, n * w)
                      for l in c)
                for c in evals
            )
            words = B.rows_to_words(rt, deg)
            return hasher.hash_words(words, n * w * deg * B.ELEMENT_BYTES)

        return jax.jit(fn)

    k_leaves = _cached(
        ("stream_coset_leaves", spec_name, hasher, n, w, length, deg),
        make_coset_leaves,
    )

    def make_levels():
        def fn(leaves_list):
            # (blowup, length, words) -> natural-order (L, words)
            stacked = jnp.stack(leaves_list)
            leaves = jnp.transpose(stacked, (1, 0, 2)).reshape(
                length * blowup, -1
            )
            return _merkle_levels(hasher, leaves)

        return jax.jit(fn)

    k_levels = _cached(
        ("stream_levels", hasher, length * blowup, "trace"), make_levels
    )

    offs_dev = _cached(
        ("stream_offs", spec_name, offset, length, blowup),
        lambda: tuple(
            jax.device_put(l)
            for l in _offsets_table(B, offset, length, blowup)
        ),
    )

    def call(stacked):
        polys = k_interp(stacked)
        leaves = [
            k_leaves(polys, offs_dev, jnp.uint32(r)) for r in range(blowup)
        ]
        levels = k_levels(leaves)
        return polys, levels, offs_dev

    return call


# ---------------------------------------------------------------------------
# P2: streamed constraint evaluation
# ---------------------------------------------------------------------------


def streamed_constraint_kernel(B, air0, domain, ext_deg, n, plan, seq_meta,
                               _cached):
    """Returns call(polys, offs_dev, t_main, singles, seq_coeff_stacks, ccs,
    final_powers, div_dev, per_dev) -> (ce,) comps (natural order).

    seq_meta: list of (off_eff, m) per sequence entry (static); the
    coefficient stacks (n, m) comps are per-prove inputs."""
    import jax
    import jax.numpy as jnp

    ce = domain.ce_size
    cb = air0.ce_blowup_factor()
    blowup = domain.trace_to_lde_blowup
    shift = domain.ce_to_lde_blowup
    length = domain.trace_length
    K_main = len(plan["t_main_idx"])
    K_aux = len(plan["t_aux_idx"])
    w = plan["w_main"]
    w_aux = plan["w_aux"]
    has_aux = plan["has_aux"]
    spec_name = B.spec.name

    assert ce == length * cb

    scale_tabs = {
        m: _cached(
            ("stream_seqscale", spec_name, ce, cb, m),
            lambda m=m: tuple(
                jax.device_put(l) for l in _seq_scale_tables(B, ce, cb, m)
            ),
        )
        for _, m in seq_meta
    }

    from ..ops.pallas import cons_kernel

    groups_t = [tuple(g) for g in plan["groups"]]
    n_singles = sum(1 for g in groups_t for (_, _, pl) in g if pl == 1)
    use_pcons = (
        ext_deg == 1
        and not has_aux
        and spec_name in ("f64", "f62", "f128")
        and length % (128 * 8) == 0
        and cons_kernel.enabled()
    )
    pcall = (
        cons_kernel.build_call(
            B, air0, groups_t, len(plan["periodic_tabs"]), len(seq_meta),
            n, w, K_main, n_singles, length,
        )
        if use_pcons
        else None
    )

    def make():
        def fn(polys, offs_full, rc, t_main, singles, seq_stacks, ccs,
               final_powers, div_tabs, periodic_tabs, scal=None,
               aux_polys=(), t_aux=(), aux_rand=()):
            offs = tuple(
                l[None, None, :] for l in _dyn_row(offs_full, rc * shift)
            )
            scaled = tuple(B.bmul(c, offs) for c in polys)
            evals = B.evaluate_poly_with_offset(scaled, 1, 1)  # (n, w, len)
            nxt_e = tuple(
                tuple(jnp.roll(l, -1, axis=2) for l in c) for c in evals
            )

            def seq_value(sq):
                coeffs = seq_stacks[sq]
                off_eff, m = seq_meta[sq]
                scale = _dyn_row(scale_tabs[m], rc)  # (m,)
                sc = tuple(
                    B.bmul(c, tuple(l[None, :] for l in scale))
                    for c in coeffs
                )
                return B.evaluate_poly_with_offset(sc, off_eff, length // m)

            if pcall is not None:
                # the whole constraint body as ONE fused pallas kernel
                # (ops/pallas/cons_kernel) — frames/tables sliced here in
                # XLA, math fused in VMEM; bit-identical to the XLA branch
                cur_cols = [
                    tuple(tuple(l[:, wi] for l in c) for c in evals)
                    for wi in range(w)
                ]
                nxt_cols = [
                    tuple(tuple(l[:, wi] for l in c) for c in nxt_e)
                    for wi in range(w)
                ]
                per_sliced = [
                    tuple(_coset_slice(c, rc, cb, length))
                    for c in periodic_tabs
                ]
                seq_vals = [seq_value(sq) for sq in range(len(seq_meta))]
                div_sliced = [
                    tuple(_coset_slice(zt, rc, cb, length)) for zt in div_tabs
                ]
                return pcall(
                    cur_cols, nxt_cols, per_sliced, seq_vals, div_sliced,
                    scal,
                )

            cur_f = [
                Felt(tuple(tuple(l[:, wi] for l in c) for c in evals), B=B)
                for wi in range(w)
            ]
            nxt_f = [
                Felt(tuple(tuple(l[:, wi] for l in c) for c in nxt_e), B=B)
                for wi in range(w)
            ]
            frame = EvaluationFrame(cur_f, nxt_f)
            pv = [
                Felt((tuple(
                    jnp.broadcast_to(l[None, :], (n, length))
                    for l in _coset_slice(c, rc, cb, length)
                ),), B=B)
                for c in periodic_tabs
            ]

            t_result = [None] * K_main
            air0.evaluate_transition(frame, pv, t_result)
            combined = B.vzeros((n, length), ext_deg, jnp)
            for k_i, ev in enumerate(t_result):
                coef = tuple(tuple(l[:, k_i:k_i + 1] for l in c)
                             for c in t_main)
                combined = B.vadd(combined, B.vmul(coef, ev.c))

            aux_cur_f = None
            if has_aux and aux_polys:
                # aux segment evals per coset, same scheme as main (the aux
                # polys carry ext-degree comps; bmul/NTT map per component)
                from .full_pipeline import BatchedAuxRand

                a_scaled = tuple(B.bmul(c, offs) for c in aux_polys[0])
                a_evals = B.evaluate_poly_with_offset(a_scaled, 1, 1)
                a_nxt = tuple(
                    tuple(jnp.roll(l, -1, axis=2) for l in c)
                    for c in a_evals
                )
                aux_cur_f = [
                    Felt(tuple(tuple(l[:, wi] for l in c) for c in a_evals),
                         B=B)
                    for wi in range(w_aux)
                ]
                aux_nxt_f = [
                    Felt(tuple(tuple(l[:, wi] for l in c) for c in a_nxt),
                         B=B)
                    for wi in range(w_aux)
                ]
                aux_frame = EvaluationFrame(aux_cur_f, aux_nxt_f)
                rand = BatchedAuxRand(
                    [[Felt(e, B=B) for e in seg] for seg in aux_rand]
                )
                a_result = [None] * K_aux
                air0.evaluate_aux_transition(frame, aux_frame, pv, rand,
                                             a_result)
                for k_i, ev in enumerate(a_result):
                    coef = tuple(tuple(l[:, k_i:k_i + 1] for l in c)
                                 for c in t_aux)
                    combined = B.vadd(combined, B.vmul(coef, ev.c))

            columns = [combined]
            sv = sq = ci = 0
            for group in plan["groups"]:
                acc = B.vzeros((n, length), ext_deg, jnp)
                for seg, column, poly_len in group:
                    state = (cur_f if seg == "main" else aux_cur_f)[
                        column
                    ].c
                    if poly_len == 1:
                        value = singles[sv]
                        sv += 1
                    else:
                        value = seq_value(sq)
                        sq += 1
                    diff = B.vsub(state, value)
                    acc = B.vadd(acc, B.vmul(ccs[ci], diff))
                    ci += 1
                columns.append(acc)

            acc = B.vzeros((n, length), ext_deg, jnp)
            for col, zt in zip(columns, div_tabs):
                z_rc = _coset_slice(zt, rc, cb, length)
                acc = B.vadd(
                    acc,
                    B.vmul(B.promote(col, ext_deg),
                           (tuple(l[None, :] for l in z_rc),)),
                )
            fp = tuple(tuple(l[:, None] for l in c) for c in final_powers)
            weighted = B.vmul(acc, fp)
            return B.vsum(weighted, axis=0)  # (length,)

        return jax.jit(fn)

    k_cons = _cached(
        ("stream_cons", spec_name, type(air0).__qualname__, length, ce,
         ext_deg, n, w, w_aux, has_aux,
         tuple(tuple(g) for g in plan["groups"]),
         tuple(seq_meta), use_pcons),
        make,
    )

    def make_interleave():
        import jax

        def fn(parts):
            # list (cb) of (length,) comps -> (ce,) natural order comps
            return tuple(
                tuple(
                    jnp.stack([p[c][l] for p in parts], axis=1).reshape(ce)
                    for l in range(len(parts[0][c]))
                )
                for c in range(len(parts[0]))
            )

        return jax.jit(fn)

    k_inter = _cached(("stream_inter", spec_name, ce, cb, ext_deg),
                      make_interleave)

    def call(polys, offs_dev, t_main, singles, seq_stacks, ccs,
             final_powers, div_dev, per_dev, aux_polys=(), t_aux=(),
             aux_rand_stacks=()):
        import jax.numpy as jnp

        scal = None
        if pcall is not None:
            scal = cons_kernel.pack_scalar_bank(
                B, t_main, singles, ccs, final_powers, n, K_main
            )
        parts = [
            k_cons(polys, offs_dev, jnp.uint32(rc), t_main, singles,
                   seq_stacks, ccs, final_powers, div_dev, per_dev,
                   scal, aux_polys, t_aux, aux_rand_stacks)
            for rc in range(cb)
        ]
        return k_inter(parts)

    return call


# ---------------------------------------------------------------------------
# P3: streamed composition commitment + query re-derivation
# ---------------------------------------------------------------------------


def streamed_comp_commit(B, hasher, num_cols, length, blowup, ext_deg,
                         _cached, offs_dev):
    import jax
    import jax.numpy as jnp

    spec_name = B.spec.name

    def make_coset_leaves():
        def fn(cols, offs_full, r):
            offs = tuple(l[None, :] for l in _dyn_row(offs_full, r))
            scaled = tuple(B.bmul(c, offs) for c in cols)
            evals = B.evaluate_poly_with_offset(scaled, 1, 1)  # (C, len)
            rt = tuple(tuple(l.T for l in c) for c in evals)
            words = B.rows_to_words(rt, ext_deg)
            return hasher.hash_words(
                words, num_cols * ext_deg * B.ELEMENT_BYTES
            )

        return jax.jit(fn)

    k_leaves = _cached(
        ("stream_comp_leaves", spec_name, hasher, num_cols, length, ext_deg),
        make_coset_leaves,
    )

    def make_levels():
        def fn(leaves_list):
            stacked = jnp.stack(leaves_list)
            leaves = jnp.transpose(stacked, (1, 0, 2)).reshape(
                length * blowup, -1
            )
            return _merkle_levels(hasher, leaves)

        return jax.jit(fn)

    k_levels = _cached(
        ("stream_levels", hasher, length * blowup, "comp"), make_levels
    )

    def call(comp_columns):
        leaves = [
            k_leaves(comp_columns, offs_dev, jnp.uint32(r))
            for r in range(blowup)
        ]
        return k_levels(leaves)

    return call


def streamed_query_rows(B, n, w, num_cols, length, blowup, ext_deg, _cached,
                        offs_dev, polys, comp_columns, aux_polys=(),
                        aux_widths=()):
    """Returns query_rows(positions) with the finish_proof contract: the
    queried LDE columns are re-derived from the coefficient tables, coset by
    coset (same kernels as the commit -> identical values -> the Merkle
    paths from the committed trees verify).  aux_polys: per-segment stacked
    coefficient comps (ext degree) re-derived with the same gather."""
    import jax
    import jax.numpy as jnp

    from ..utils.transfer import pull_planes

    spec_name = B.spec.name

    def make_trace_gather(qp):
        def fn(polys, offs_full, r, q_idx):
            offs = tuple(l[None, None, :] for l in _dyn_row(offs_full, r))
            scaled = tuple(B.bmul(c, offs) for c in polys)
            evals = B.evaluate_poly_with_offset(scaled, 1, 1)
            return tuple(
                tuple(jnp.take(l, q_idx, axis=2) for l in c) for c in evals
            )

        return jax.jit(fn)

    def make_comp_gather(qp):
        def fn(cols, offs_full, r, q_idx):
            offs = tuple(l[None, :] for l in _dyn_row(offs_full, r))
            scaled = tuple(B.bmul(c, offs) for c in cols)
            evals = B.evaluate_poly_with_offset(scaled, 1, 1)
            return tuple(
                tuple(jnp.take(l, q_idx, axis=1) for l in c) for c in evals
            )

        return jax.jit(fn)

    def query_rows(positions):
        by_coset = {}
        for pi, pos in enumerate(positions):
            by_coset.setdefault(pos % blowup, []).append((pos // blowup, pi))
        q = len(positions)
        # fixed padded width -> one compile per (config, bucket)
        qp = 8 * ((max(len(v) for v in by_coset.values()) + 7) // 8)
        kt = _cached(
            ("stream_qtrace", spec_name, n, w, length, qp, 1),
            lambda: make_trace_gather(qp),
        )
        kas = [
            _cached(
                ("stream_qtrace", spec_name, n, wa, length, qp, ext_deg),
                lambda: make_trace_gather(qp),
            )
            for wa in aux_widths
        ]
        kc = _cached(
            ("stream_qcomp", spec_name, num_cols, length, ext_deg, qp),
            lambda: make_comp_gather(qp),
        )
        pieces = []
        metas = []
        for r, entries in sorted(by_coset.items()):
            q_idx = np.zeros(qp, dtype=np.int32)
            q_idx[: len(entries)] = [e[0] for e in entries]
            tg = kt(polys, offs_dev, jnp.uint32(r), jnp.asarray(q_idx))
            ags = [
                ka(ap, offs_dev, jnp.uint32(r), jnp.asarray(q_idx))
                for ka, ap in zip(kas, aux_polys)
            ]
            cg = kc(comp_columns, offs_dev, jnp.uint32(r),
                    jnp.asarray(q_idx))
            pieces.append((tg, ags, cg))
            metas.append(entries)
        # ONE packed pull for everything
        flat = []
        for tg, ags, cg in pieces:
            flat.extend(l for c in tg for l in c)
            for ag in ags:
                flat.extend(l for c in ag for l in c)
            flat.extend(l for c in cg for l in c)
        planes = pull_planes(flat)
        it = iter(planes)
        deg_t = len(polys)
        nl = len(polys[0])
        deg_c = len(comp_columns)
        nl_c = len(comp_columns[0])
        main_np = [
            tuple(tuple(np.zeros((w, q), dtype=np.uint32) for l in c)
                  for c in polys)
            for _ in range(n)
        ]
        aux_np = [
            [
                tuple(tuple(np.zeros((wa, q), dtype=np.uint32)
                            for _ in c) for c in ap)
                for _ in range(n)
            ]
            for wa, ap in zip(aux_widths, aux_polys)
        ]
        comp_np = tuple(
            tuple(np.zeros((num_cols, q), dtype=np.uint32)
                  for _ in range(nl_c))
            for _ in range(deg_c)
        )
        for (tg, ags, cg), entries in zip(pieces, metas):
            t_pulled = [[next(it) for _ in range(nl)] for _ in range(deg_t)]
            a_pulled = [
                [[next(it) for _ in range(len(ap[0]))]
                 for _ in range(len(ap))]
                for ap in aux_polys
            ]
            c_pulled = [[next(it) for _ in range(nl_c)]
                        for _ in range(deg_c)]
            for slot, (_q, pi) in enumerate(entries):
                for c in range(deg_t):
                    for l in range(nl):
                        for i in range(n):
                            main_np[i][c][l][:, pi] = \
                                t_pulled[c][l][i, :, slot]
                for si, ap in enumerate(aux_polys):
                    for c in range(len(ap)):
                        for l in range(len(ap[0])):
                            for i in range(n):
                                aux_np[si][i][c][l][:, pi] = \
                                    a_pulled[si][c][l][i, :, slot]
                for c in range(deg_c):
                    for l in range(nl_c):
                        comp_np[c][l][:, pi] = c_pulled[c][l][:, slot]
        return main_np, aux_np, comp_np

    return query_rows
