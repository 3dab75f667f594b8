"""Proof verification — equivalent of verifier/src/lib.rs + composer.rs +
evaluator.rs.  Mirrors the prover transcript step for step (SURVEY.md §3.2)."""

from __future__ import annotations

from ..air.air import AuxTraceRandElements
from ..crypto.random_coin import RandomCoin
from ..fri.verifier import FriVerificationError, FriVerifier
from ..math import polynom, scalar as fs
from .channel import VerifierChannel, VerifierError


def verify(air_class, proof, pub_inputs_vec, hasher):
    """winterfell::verify (verifier/src/lib.rs:83) — one aggregated proof,
    a vector of public inputs."""
    ext_deg = proof.contexts[0].options.field_extension

    # Only contexts[0] is bound into the Fiat-Shamir seed (matching the
    # reference fork, verifier/src/lib.rs:95) — reject proofs whose other
    # per-instance contexts were altered after the challenges were fixed
    # (free post-challenge malleability otherwise; honest bytes unchanged).
    for i, ctx in enumerate(proof.contexts[1:], start=1):
        if not (
            ctx.trace_layout == proof.contexts[0].trace_layout
            and ctx.trace_length == proof.contexts[0].trace_length
            and ctx.field_modulus_bytes == proof.contexts[0].field_modulus_bytes
            and ctx.options == proof.contexts[0].options
        ):
            raise VerifierError(f"proof context {i} differs from context 0")

    airs = []
    for i, pub_inputs in enumerate(pub_inputs_vec):
        trace_info = proof.contexts[i].get_trace_info()
        airs.append(air_class(trace_info, pub_inputs, proof.contexts[i].options))

    spec = airs[0].field_spec()
    if proof.contexts[0].field_modulus_bytes != spec.get_modulus_le_bytes():
        raise VerifierError("proof base field does not match the AIR's field")

    # seed = context[0] elements ++ all public input elements (lib.rs:95-98)
    seed_elements = list(proof.contexts[0].to_elements())
    for pub_inputs in pub_inputs_vec:
        seed_elements.extend(pub_inputs.to_elements())
    public_coin = RandomCoin(hasher, seed_elements, field=spec)

    channel = VerifierChannel(airs, proof, hasher, ext_deg, spec)
    return _perform_verification(airs, channel, public_coin, hasher, ext_deg, spec)


def _perform_verification(airs, channel, public_coin, hasher, ext_deg, spec=None):
    if spec is None:
        from ..math.fieldspec import GL64_SPEC as spec
    fs = spec
    trace_commitments = channel.read_trace_commitments()

    # 1. trace commitment + aux rand elements (lib.rs:162-178)
    #
    # NOTE — fork inconsistency resolved in the prover's favor: the reference
    # PROVER draws aux randomness for ALL instances and then reseeds the
    # shared aux-segment root once (prover/src/lib.rs:296-352: per segment,
    # per-trace get_aux_trace_segment_rand_elements, then one commit_trace),
    # while the reference VERIFIER keeps upstream Winterfell's single-trace
    # shape (verifier/src/lib.rs:168-178: per air, draw then reseed) — so the
    # fork cannot verify its own aggregated proofs for n >= 2 randomized
    # AIRs (its only example, do_work, has no aux segments).  We mirror the
    # prover (segment-outer, one reseed per shared commitment); for n == 1
    # the two orders coincide, so single-instance bytes are unchanged.
    public_coin.reseed(trace_commitments[0])
    aux_traces_rand_elements = [AuxTraceRandElements() for _ in airs]
    for i, commitment in enumerate(trace_commitments[1:]):
        for aux_rand, air in zip(aux_traces_rand_elements, airs):
            rand_elements = air.get_aux_trace_segment_random_elements(
                i, public_coin, ext_deg
            )
            aux_rand.add_segment_elements(rand_elements)
        public_coin.reseed(commitment)

    constraints_coeffs = [
        air.get_constraint_composition_coefficients(public_coin, ext_deg)
        for air in airs
    ]
    # final_coeff drawn BEFORE reseeding the constraint commitment (lib.rs:193)
    final_coeff = public_coin.draw(ext_deg)
    constraint_commitment = channel.read_constraint_commitment()
    public_coin.reseed(constraint_commitment)
    z = public_coin.draw(ext_deg)

    # 2. OOD consistency (lib.rs:210-257)
    ood_traces_frame = channel.read_ood_traces_frame()
    ood_main_frames = [f.main_frame() for f in ood_traces_frame]
    ood_aux_frames = [f.aux_frame() for f in ood_traces_frame]
    ood_constraint_evaluation = fs.zero(ext_deg) if ext_deg > 1 else 0
    # main transition constraints evaluate vectorized across instances (one
    # (n,)-shaped Felt call instead of n scalar calls); aux-segment AIRs use
    # the per-instance path (aux randomness is per-instance scalar data)
    t1_batch = None
    if ood_aux_frames[0] is None and len(airs) > 1 and spec.name == "f64":
        # limb fields take the ScalarFelt (python-int) per-instance path
        # instead — measured: even at n=256 a (n,)-shaped 4-limb batch loses
        # to python mulmod (a limb mul is ~300 numpy ops regardless of size)
        t1_batch = _batch_main_transition_evals(airs, ood_main_frames, z, ext_deg)
    # periodic columns/values are identical across instances (same AIR class,
    # same z) — evaluate once
    shared_pv = _periodic_values_at(airs[0], z, spec)
    # multi-instance no-aux proofs share the whole OOD-combination structure
    # (constraint layout, assertion layout, divisors) — build it once and
    # reduce the per-instance work to value/coefficient dot products
    shared_ood = None
    if ood_aux_frames[0] is None and len(airs) > 1:
        shared_ood = _shared_ood_structure(airs[0], z, ext_deg, spec)
    # all frame digests in one batched hash call; reseed order is unchanged
    hem = getattr(hasher, "hash_elements_many", None)
    frame_digests = (
        hem([f.values() for f in ood_traces_frame], spec.ELEMENT_BYTES)
        if hem is not None
        else [
            hasher.hash_elements(f.values(), spec.ELEMENT_BYTES)
            for f in ood_traces_frame
        ]
    )
    coeff_pow = fs.one(ext_deg) if ext_deg > 1 else 1
    for i in range(len(ood_traces_frame)):
        ev = None
        if shared_ood is not None:
            t1 = t1_batch[i] if t1_batch is not None else _scalar_t1(
                airs[i], ood_main_frames[i], shared_pv, spec
            )
            ev = _fast_ood_eval(
                airs[i], constraints_coeffs[i], ood_main_frames[i], t1,
                ext_deg, fs, shared_ood,
            )
        if ev is None:
            ev = _evaluate_constraints(
                airs[i],
                constraints_coeffs[i],
                ood_main_frames[i],
                ood_aux_frames[i],
                aux_traces_rand_elements[i],
                z,
                ext_deg,
                t1=None if t1_batch is None else t1_batch[i],
                periodic_values=shared_pv,
            )
        public_coin.reseed(frame_digests[i])
        ood_constraint_evaluation = fs.fadd(
            ood_constraint_evaluation, fs.fmul(ev, coeff_pow)
        )
        coeff_pow = fs.fmul(coeff_pow, final_coeff)

    ood_constraint_evaluations = channel.read_ood_constraint_evaluations()
    ood2 = fs.zero(ext_deg) if ext_deg > 1 else 0
    for i, value in enumerate(ood_constraint_evaluations):
        ood2 = fs.fadd(
            ood2, fs.fmul(fs.fexp(z, i * airs[0].trace_length()), value)
        )
    public_coin.reseed(
        hasher.hash_elements(ood_constraint_evaluations, spec.ELEMENT_BYTES)
    )

    if ood_constraint_evaluation != ood2:
        raise VerifierError("inconsistent OOD constraint evaluations")

    # 3. DEEP coefficients + FRI verifier setup (lib.rs:263-278)
    deep_coefficients = airs[0].get_deep_composition_coefficients(
        airs, public_coin, ext_deg
    )
    fri_verifier = FriVerifier(
        channel,
        public_coin,
        airs[0].options().to_fri_options(),
        airs[0].trace_poly_degree(),
        ext_deg,
        field=spec,
    )

    # 4. PoW + query positions (lib.rs:283-303)
    pow_nonce = channel.read_pow_nonce()
    public_coin.reseed_with_int(pow_nonce)
    if public_coin.leading_zeros() < airs[0].options().grinding_factor:
        raise VerifierError("query seed proof-of-work verification failed")
    query_positions = public_coin.draw_integers(
        airs[0].options().num_queries, airs[0].lde_domain_size()
    )

    queried_main_vec, queried_aux = channel.read_queried_trace_states(query_positions)
    queried_constraints = channel.read_constraint_evaluations(query_positions)

    # 5. DEEP composition at the query points (composer.rs)
    composer = DeepComposer(airs[0], query_positions, z, deep_coefficients, ext_deg,
                            spec)
    deep_evaluations = composer.compose_deep_native(
        queried_main_vec, queried_aux, ood_main_frames, ood_aux_frames,
        queried_constraints, ood_constraint_evaluations
    )
    if deep_evaluations is None:
        t_composition = composer.compose_trace_columns(
            queried_main_vec, queried_aux, ood_main_frames, ood_aux_frames
        )
        c_composition = composer.compose_constraint_evaluations(
            queried_constraints, ood_constraint_evaluations
        )
        deep_evaluations = [
            spec.fadd(t, c) for t, c in zip(t_composition, c_composition)
        ]

    # 6. FRI verification
    try:
        fri_verifier.verify(channel, deep_evaluations, query_positions)
    except FriVerificationError as e:
        raise VerifierError(f"FRI verification failed: {e}")
    return True


def _periodic_values_at(air, x, spec):
    pspec = None if spec.name == "f64" else spec
    B = None
    if pspec is not None:
        from ..ops.backend import get_backend

        B = get_backend(spec.name)
    from . import native_scalar as ns

    native = ns.available()
    values = []
    for poly in air.get_periodic_column_polys():
        num_cycles = air.trace_length() // len(poly)
        xp = spec.fexp(x, num_cycles)
        v = None
        if (native and poly and isinstance(poly[0], int)
                and (spec.name != "f64" or len(poly) >= 32)):
            # native Horner; the word pack is identity-cached per poly
            # object (AIRs cache their periodic polys class-level)
            ctx = ns.get_ctx(spec, spec.deg_of(xp))
            v = ns.poly_eval(ctx, ns.pack_base_cached(ctx, poly), xp)
        if v is None and B is not None and isinstance(xp, int):
            v = B.eval_int_poly_at(poly, xp)
        if v is None:
            v = polynom.eval_at(poly, xp, pspec)
        values.append(v)
    return values


def _shared_ood_structure(air0, z, ext_deg, spec):
    """Shared OOD-combination structure for a no-aux aggregated proof: the
    instances of one StarkPack proof share the AIR class, trace length,
    constraint layout and assertion layout — only coefficient and assertion
    *values* are per-instance.  Returns (assertion structure, sorted order,
    transition divisor inverse at z, boundary groups) built once from
    instance 0, or None when per-instance interpolation is required
    (sequence assertions) so the caller keeps the general path."""
    from ..air.divisors import ConstraintDivisor

    assertions0 = air0.get_assertions()
    if any(a.is_sequence() for a in assertions0):
        return None
    ctx = air0.context
    struct = tuple((a.column, a.first_step, a.stride) for a in assertions0)
    order = sorted(
        range(len(assertions0)), key=lambda j: assertions0[j]._key()
    )
    n_exemptions = ctx.num_transition_exemptions
    tdiv = ConstraintDivisor.from_transition(
        ctx.trace_len(), n_exemptions, ctx.field
    )
    t_inv = tdiv.inverse_at(z)
    # group sorted assertions by divisor key; groups ordered by sorted key
    # and paired with coefficients in sorted-assertion order — exactly
    # boundary._group_constraints
    groups, keys = {}, []
    for p, j in enumerate(order):
        a = assertions0[j]
        key = (a.stride, a.first_step)
        if key not in groups:
            groups[key] = []
            keys.append(key)
        groups[key].append((p, j, a.column))
    gdivs = []
    for key in sorted(keys):
        members = groups[key]
        rep = assertions0[members[0][1]]
        d = ConstraintDivisor.from_assertion(rep, ctx.trace_len(), ctx.field)
        gdivs.append((d.inverse_at(z), members))
    return struct, t_inv, gdivs, n_exemptions


def _scalar_t1(air, main_frame, periodic_values, spec):
    """Per-instance main transition evals through the ScalarFelt path."""
    from ..ops.backend import get_backend

    B = get_backend(spec.name)
    t1 = [None] * air.context.num_main_transition_constraints()
    _scalar_evaluate(air, main_frame, periodic_values, t1, B)
    return t1


def _fast_ood_eval(air, coeffs, main_frame, t1, ext_deg, spec, shared):
    """One instance's OOD constraint evaluation against the shared
    structure: transition dot product x shared divisor inverse, plus
    per-group boundary numerators — no per-instance object construction.
    Returns None if this instance's assertion structure deviates from
    instance 0's (caller falls back to the general path)."""
    struct, t_inv, gdivs, n_exemptions = shared
    # an instance whose exemption count or assertion structure deviates from
    # instance 0's (incl. a sequence assertion sharing a single/periodic
    # signature — len(values) != 1 needs polynomial interpolation) must take
    # the general path
    if air.context.num_transition_exemptions != n_exemptions:
        return None
    assertions = air.get_assertions()
    if len(assertions) != len(struct) or any(
        (a.column, a.first_step, a.stride) != s or len(a.values) != 1
        for a, s in zip(assertions, struct)
    ):
        return None
    s = spec.zero(ext_deg)
    for ev, coef in zip(t1, coeffs.transition):
        s = spec.fadd(s, spec.fmul(coef, ev))
    result = spec.fmul(s, t_inv)
    state = main_frame.current()
    bcc = coeffs.boundary
    for g_inv, members in gdivs:
        num = spec.zero(ext_deg)
        for p, j, col in members:
            num = spec.fadd(
                num,
                spec.fmul(
                    spec.fsub(state[col], assertions[j].values[0]), bcc[p]
                ),
            )
        result = spec.fadd(result, spec.fmul(num, g_inv))
    return result


def _batch_main_transition_evals(airs, ood_main_frames, z, ext_deg):
    """Evaluate the (shared) main transition constraints of ALL instances in
    one vectorized call: the per-instance OOD frames stack into (n,)-shaped
    Felts.  Returns t1[i] = per-instance evaluation lists (identical values
    to per-instance scalar evaluation)."""
    from ..ops.backend import get_backend
    from ..ops.felt import Felt

    air0 = airs[0]
    spec = air0.field_spec()
    B = get_backend(spec.name)
    n = len(airs)
    w = len(ood_main_frames[0].current())

    def stack(vals):
        return Felt(B.elems_to_limbs(list(vals), ext_deg), B=B)

    cur = [stack([f.current()[j] for f in ood_main_frames]) for j in range(w)]
    nxt = [stack([f.next()[j] for f in ood_main_frames]) for j in range(w)]
    # periodic values must be array Felts here (they mix into the (n,)-shaped
    # batch), not the ScalarFelt wrappers the per-instance limb path uses
    pv = [
        Felt(B.scalar_to_limbs(v, 1 if isinstance(v, int) else len(v)), B=B)
        for v in _periodic_values_at(air0, z, spec)
    ]

    k = air0.context.num_transition_constraints()
    result = [None] * k

    class _Frame:
        def current(self):
            return cur

        def next(self):
            return nxt

    air0.evaluate_transition(_Frame(), pv, result)
    per_constraint = []
    for r in result:
        if isinstance(r, (int, tuple)):
            per_constraint.append([r] * n)
        else:
            per_constraint.append(
                B.limbs_to_elems(B.promote(r.c, ext_deg), ext_deg)
            )
    return [[per_constraint[c][i] for c in range(k)] for i in range(n)]


def _evaluate_constraints(air, coeffs, main_frame, aux_frame, aux_rand_elements, x,
                          ext_deg, t1=None, periodic_values=None):
    """verifier/src/evaluator.rs:14-82 — symbolic evaluation at z."""
    from ..ops.backend import get_backend

    spec = air.field_spec()
    B = get_backend(spec.name)
    t_constraints = air.get_transition_constraints(coeffs.transition)

    if periodic_values is None:
        periodic_values = _periodic_values_at(air, x, spec)

    if t1 is None:
        t1 = [None] * t_constraints.num_main_constraints()
        _scalar_evaluate(air, main_frame, periodic_values, t1, B)

    t2 = []
    if aux_frame is not None:
        t2 = [None] * t_constraints.num_aux_constraints()
        air.evaluate_aux_transition(
            _ScalarFrame(main_frame, B), _ScalarFrame(aux_frame, B),
            [_felt(v, B) for v in periodic_values], aux_rand_elements, t2,
        )
        t2 = [_unfelt(v) for v in t2]

    result = t_constraints.combine_evaluations(t1, t2, x)

    b_constraints = air.get_boundary_constraints(aux_rand_elements, coeffs.boundary)
    for group in b_constraints.main_constraints:
        result = spec.fadd(result, group.evaluate_at(main_frame.current(), x))
    if aux_frame is not None:
        for group in b_constraints.aux_constraints:
            result = spec.fadd(result, group.evaluate_at(aux_frame.current(), x))
    return result


def _scalar_evaluate(air, frame, periodic_values, result, B):
    """Run the user's vectorized evaluate_transition on scalar values by
    wrapping them in python-int ScalarFelts (a python mulmod is ~1000x
    cheaper than a shape-(1,) limb-array multiply, every field)."""
    air.evaluate_transition(_ScalarFrame(frame, B),
                            [_felt(v, B) for v in periodic_values], result)
    for i, v in enumerate(result):
        result[i] = _unfelt(v)


class ScalarFelt:
    """Python-int field element with Felt's operator surface, for the
    verifier's inherently scalar OOD evaluation over the limb fields."""

    __slots__ = ("v", "spec")

    def __init__(self, v, spec):
        self.v = v
        self.spec = spec

    def _coerce(self, o):
        if isinstance(o, ScalarFelt):
            return o.v
        if isinstance(o, (int, tuple)):
            return o
        if hasattr(o, "to_elems"):  # array Felt constant (Felt.from_int)
            return o.to_elems()[0]
        return NotImplemented

    def __add__(self, o):
        w = self._coerce(o)
        if w is NotImplemented:
            return NotImplemented
        return ScalarFelt(self.spec.fadd(self.v, w), self.spec)

    __radd__ = __add__

    def __sub__(self, o):
        w = self._coerce(o)
        if w is NotImplemented:
            return NotImplemented
        return ScalarFelt(self.spec.fsub(self.v, w), self.spec)

    def __rsub__(self, o):
        w = self._coerce(o)
        if w is NotImplemented:
            return NotImplemented
        return ScalarFelt(self.spec.fsub(w, self.v), self.spec)

    def __mul__(self, o):
        w = self._coerce(o)
        if w is NotImplemented:
            return NotImplemented
        return ScalarFelt(self.spec.fmul(self.v, w), self.spec)

    __rmul__ = __mul__

    def __neg__(self):
        return ScalarFelt(self.spec.fneg(self.v), self.spec)

    def __pow__(self, e: int):
        return ScalarFelt(self.spec.fexp(self.v, int(e)), self.spec)

    def square(self):
        return ScalarFelt(self.spec.fmul(self.v, self.v), self.spec)

    def double(self):
        return ScalarFelt(self.spec.fadd(self.v, self.v), self.spec)

    def inverse(self):
        return ScalarFelt(self.spec.finv(self.v), self.spec)

    def __truediv__(self, o):
        w = self._coerce(o)
        if w is NotImplemented:
            return NotImplemented
        return self * ScalarFelt(w, self.spec).inverse()

    def __eq__(self, o):
        w = self._coerce(o)
        return self.v == w


class _ScalarFrame:
    def __init__(self, frame, B):
        self._current = [_felt(v, B) for v in frame.current()]
        self._next = [_felt(v, B) for v in frame.next()]

    def current(self):
        return self._current

    def next(self):
        return self._next


def _felt(v, B):
    # python-int mulmod beats a shape-(1,) numpy limb multiply by ~1000x for
    # EVERY field incl. f64 (measured: the rescue-chain AIR's 360-mul OOD
    # evaluation is 88 ms on limb Felts, < 1 ms on ScalarFelt)
    return ScalarFelt(v, B.spec)


def _unfelt(f):
    if isinstance(f, (int, tuple)):
        return f
    if isinstance(f, ScalarFelt):
        return f.v
    return f.to_elems()[0]


def _words_comps(words, deg_in: int, B):
    """(q, w, deg*nl) u32 word array -> element comps (tuple of deg
    components, each a tuple of (q, w) limb planes) — LE limb order matches
    the serialization layout, so this is a pure view/copy, no int math."""
    import numpy as np

    nl = B.spec.ELEMENT_BYTES // 4
    return tuple(
        tuple(
            np.ascontiguousarray(words[..., c * nl + li]) for li in range(nl)
        )
        for c in range(deg_in)
    )


class DeepComposer:
    """verifier/src/composer.rs:55-217 — vectorized: the per-query x/row
    loops run as numpy limb-array ops over all queries at once (exact
    modular arithmetic, so results are identical to the scalar form)."""

    def __init__(self, air, query_positions, z, cc, ext_deg, spec=None):
        if spec is None:
            from ..math.fieldspec import GL64_SPEC as spec
        from ..ops.backend import get_backend

        self.fs = spec
        self.B = get_backend(spec.name)
        g_lde = air.lde_domain_generator()
        offset = air.domain_offset()
        self.g_lde = g_lde
        self.offset = offset
        self.positions = list(query_positions)
        self.x_coordinates = [
            pow(g_lde, p, spec.P) * offset % spec.P for p in query_positions
        ]
        self.cc = cc
        self.z = [z, spec.fmul(z, air.trace_domain_generator())]
        self.ext_deg = ext_deg
        d = ext_deg
        B = self.B
        self._x = B.promote(B.elems_to_limbs(self.x_coordinates, 1), d)  # (q,)
        z1 = B.scalar_to_limbs(self.z[0], d)
        z2 = B.scalar_to_limbs(self.z[1], d)
        self._t1_den = B.vsub(self._x, z1)  # (q,)
        self._t2_den = B.vsub(self._x, z2)

    def compose_deep_native(self, queried_main_vec, queried_aux_vec,
                            ood_main_frames, ood_aux_frames,
                            queried_constraints, ood_evaluations):
        """Full DEEP composition (trace + constraint parts fused, one
        batch-inversion chain) through the native scalar kernels
        (verify_scalar.c).  Returns a packed (q, d, 2) u64 array the FRI
        verifier's native path consumes directly, or None to fall back to
        the numpy limb path (library unavailable / tables without word
        backing)."""
        import numpy as np

        from . import native_scalar as ns

        d = self.ext_deg
        if not ns.available() or d > 3:
            return None
        if d == 1 and self.fs.name == "f64":
            # the fused gl_dot numpy path (compose_trace_columns) is
            # measurably faster for the base Goldilocks configs
            return None
        if any(t.words is None for t in queried_main_vec):
            return None
        if queried_constraints.words is None:
            return None
        if queried_aux_vec is not None and any(
            t.words is None for t in queried_aux_vec
        ):
            return None
        q = len(self.positions)
        if q > 1024:
            return None
        ctx = ns.get_ctx(self.fs, d)
        n = len(queried_main_vec)
        Tm = np.stack([t.words for t in queried_main_vec])  # (n, q, w, nl)
        w = Tm.shape[2]
        ood_cur = ctx.pack_elems([v for f in ood_main_frames for v in f.current()])
        ood_nxt = ctx.pack_elems([v for f in ood_main_frames for v in f.next()])
        cc = ctx.pack_elems([c for kk in self.cc.traces for c in kk[:w]])
        t1 = np.zeros((q, d, 2), dtype=np.uint64)
        t2 = np.zeros_like(t1)
        rc = ns.deep_trace(ctx, Tm, n, q, w, 1, ood_cur, ood_nxt, cc, t1, t2,
                           False)
        if rc != 0:
            return None
        if queried_aux_vec is not None:
            wa = len(ood_aux_frames[0].current())
            Ta = np.stack([t.words for t in queried_aux_vec])
            a0 = ctx.pack_elems(
                [v for f in ood_aux_frames for v in f.current()]
            )
            a1 = ctx.pack_elems([v for f in ood_aux_frames for v in f.next()])
            ka = ctx.pack_elems(
                [c for kk in self.cc.traces for c in kk[w : w + wa]]
            )
            rc = ns.deep_trace(ctx, Ta, n, q, wa, d, a0, a1, ka, t1, t2, True)
            if rc != 0:
                return None
        m = queried_constraints.words.shape[1]
        ood_c = ctx.pack_elems(list(ood_evaluations))
        cc2 = ctx.pack_elems(list(self.cc.constraints))
        rc, out = ns.deep_combine(
            ctx, q, self.positions, self.g_lde, self.offset, self.z[0],
            self.z[1], t1, t2, queried_constraints.words, m, ood_c, cc2,
        )
        if rc != 0:
            return None
        return out

    def _table_limbs(self, table, deg_in: int):
        """Table rows -> (q, w) limb comps promoted to ext degree."""
        B = self.B
        if table.words is not None:
            return B.promote(_words_comps(table.words, deg_in, B), self.ext_deg)
        rows = list(table.rows())
        q, w = len(rows), len(rows[0])
        flat = [v for row in rows for v in row]
        comps = B.elems_to_limbs(flat, deg_in)
        comps = B.emap(lambda a: a.reshape(q, w), comps)
        return B.promote(comps, self.ext_deg)

    def _states_limbs(self, states):
        """A width-w list of (ext) elements -> (1, w) limb comps."""
        B = self.B
        comps = B.elems_to_limbs(list(states), self.ext_deg)
        return B.emap(lambda a: a.reshape(1, -1), comps)

    def _cc_limbs(self, coeffs):
        B = self.B
        comps = B.elems_to_limbs(list(coeffs), self.ext_deg)
        return B.emap(lambda a: a.reshape(1, -1), comps)

    def _num_pair(self, T, ood0, ood1, k):
        """sum_i k_i (T[:, i] - ood{0,1}[i]) for all queries -> two (q,)."""
        B = self.B
        t1 = B.vsum(B.vmul(B.vsub(T, ood0), k), axis=-1)
        t2 = B.vsum(B.vmul(B.vsub(T, ood1), k), axis=-1)
        return t1, t2

    def compose_trace_columns(self, queried_main_vec, queried_aux_vec,
                              ood_main_frames, ood_aux_frames):
        # one stacked (n_instances, q, w) op set: instances share shapes in
        # StarkPack, so the per-instance sum collapses into an axis-0 vsum
        B = self.B
        d = self.ext_deg
        n = len(queried_main_vec)
        w = queried_main_vec[0].num_columns()

        # f64 base-field fast path: sum_i sum_j (T[i,:,j] - ood{0,1}[i,j])
        # * k[i,j] distributes into ONE fused native dot over all n*w
        # columns minus two scalar corrections — t1 and t2 share the dot.
        if (d == 1 and self.fs.name == "f64" and queried_aux_vec is None
                and all(t.words is not None for t in queried_main_vec)):
            import numpy as np

            from ..ops import gl64

            P = self.fs.P
            # (n, q, w, 2) -> one contiguous (n*w, 2, q) block
            A = np.stack([t.words for t in queried_main_vec])
            block = A.transpose(0, 2, 3, 1).reshape(n * w, 2, -1)
            vs = [k for kk in self.cc.traces for k in kk[:w]]
            c0 = c1 = 0
            for i, f in enumerate(ood_main_frames):
                kk = self.cc.traces[i]
                cur, nxt = f.current(), f.next()
                for j in range(w):
                    c0 = (c0 + cur[j] * kk[j]) % P
                    c1 = (c1 + nxt[j] * kk[j]) % P
            S = gl64.dot_block(block, vs)
            if S is not None:
                Sc = (S,)
                t1 = B.vsub(Sc, B.scalar_to_limbs(c0, 1))
                t2 = B.vsub(Sc, B.scalar_to_limbs(c1, 1))
                num = B.vadd(
                    B.vmul(t1, self._t2_den), B.vmul(t2, self._t1_den)
                )
                den = B.vmul(self._t1_den, self._t2_den)
                out = B.vmul(num, self._batch_inv_limbs(den))
                return B.limbs_to_elems(out, 1)

        def stack_tables(tables, deg_in):
            if all(t.words is not None for t in tables):
                import numpy as np

                W = np.stack([t.words for t in tables])  # (n, q, wt, deg*nl)
                nl = B.spec.ELEMENT_BYTES // 4
                comps = tuple(
                    tuple(
                        np.ascontiguousarray(W[..., c * nl + li])
                        for li in range(nl)
                    )
                    for c in range(deg_in)
                )
                return B.promote(comps, d)
            flat = [v for t in tables for row in t.rows() for v in row]
            comps = B.elems_to_limbs(flat, deg_in)
            q = len(flat) // (n * len(list(tables[0].rows())[0]))
            wt = len(flat) // (n * q)
            return B.promote(B.emap(lambda a: a.reshape(n, q, wt), comps), d)

        T = stack_tables(queried_main_vec, 1)  # (n, q, w)
        ood0 = B.emap(
            lambda a: a.reshape(n, 1, w),
            B.elems_to_limbs(
                [v for f in ood_main_frames for v in f.current()], d
            ),
        )
        ood1 = B.emap(
            lambda a: a.reshape(n, 1, w),
            B.elems_to_limbs([v for f in ood_main_frames for v in f.next()], d),
        )
        k = B.emap(
            lambda a: a.reshape(n, 1, w),
            B.elems_to_limbs([c for kk in self.cc.traces for c in kk[:w]], d),
        )
        t1_num, t2_num = self._num_pair(T, ood0, ood1, k)  # (n, q)
        if queried_aux_vec is not None:
            wa = len(ood_aux_frames[0].current())
            A = stack_tables(queried_aux_vec, d)
            a0 = B.emap(
                lambda a: a.reshape(n, 1, wa),
                B.elems_to_limbs(
                    [v for f in ood_aux_frames for v in f.current()], d
                ),
            )
            a1 = B.emap(
                lambda a: a.reshape(n, 1, wa),
                B.elems_to_limbs(
                    [v for f in ood_aux_frames for v in f.next()], d
                ),
            )
            ka = B.emap(
                lambda a: a.reshape(n, 1, wa),
                B.elems_to_limbs(
                    [c for kk in self.cc.traces for c in kk[w : w + wa]], d
                ),
            )
            u1, u2 = self._num_pair(A, a0, a1, ka)
            t1_num = B.vadd(t1_num, u1)
            t2_num = B.vadd(t2_num, u2)
        num = B.vadd(
            B.vmul(t1_num, self._t2_den), B.vmul(t2_num, self._t1_den)
        )
        final_num = B.vsum(num, axis=0)  # (q,)
        den = B.vmul(self._t1_den, self._t2_den)
        out = B.vmul(final_num, self._batch_inv_limbs(den))
        return B.limbs_to_elems(out, self.ext_deg)

    def _batch_inv_limbs(self, den):
        """Invert a small (q,)-shaped ext limb array via python-int Montgomery
        batch inversion (B.vinv is a Fermat exp chain — ~64 limb-array squares
        dominate the whole verify at these sizes)."""
        B, spec, d = self.B, self.fs, self.ext_deg
        xs = B.limbs_to_elems(den, d)
        k = len(xs)
        pref = [spec.one(d)] * (k + 1)
        for i, x in enumerate(xs):
            pref[i + 1] = spec.fmul(pref[i], x)
        inv = spec.finv(pref[k])
        out = [None] * k
        for i in range(k - 1, -1, -1):
            out[i] = spec.fmul(pref[i], inv)
            inv = spec.fmul(inv, xs[i])
        return B.promote(B.elems_to_limbs(out, d), d)

    def compose_constraint_evaluations(self, queried_evaluations, ood_evaluations):
        B = self.B
        if (self.ext_deg == 1 and self.fs.name == "f64"
                and queried_evaluations.words is not None):
            from ..ops import gl64

            P = self.fs.P
            Wd = queried_evaluations.words  # (q, ncols, 2)
            block = Wd.transpose(1, 2, 0)
            S = gl64.dot_block(block, list(self.cc.constraints))
            if S is not None:
                c = 0
                for o, k in zip(ood_evaluations, self.cc.constraints):
                    c = (c + o * k) % P
                num = B.vsub((S,), B.scalar_to_limbs(c, 1))
                out = B.vmul(num, self._batch_inv_limbs(self._t1_den))
                return B.limbs_to_elems(out, 1)
        T = self._table_limbs(queried_evaluations, self.ext_deg)
        ood = self._states_limbs(ood_evaluations)
        k = self._cc_limbs(self.cc.constraints)
        num = B.vsum(B.vmul(B.vsub(T, ood), k), axis=-1)
        den = B.vsub(self._x, B.scalar_to_limbs(self.z[0], self.ext_deg))
        out = B.vmul(num, self._batch_inv_limbs(den))
        return B.limbs_to_elems(out, self.ext_deg)
