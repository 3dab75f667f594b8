"""The StarkPack batched proving pipeline — equivalent of
prover/src/lib.rs generate_proof (the 8-phase flow in SURVEY.md §3.1).

``Prover`` is the user-facing trait: subclasses provide the AIR class, proof
options, hash function and public-input extraction; ``prove(n, traces)``
produces one aggregated StarkProof for all traces sharing a single
Fiat-Shamir transcript (prover/src/lib.rs:167).  The base field is whatever
the AIR declares (``Air.context.field``) — the whole pipeline runs through
the matching FieldBackend, mirroring the reference's generic
``Prover<BaseField>`` (prover/src/lib.rs:124).
"""

from __future__ import annotations

import logging
import time

import numpy as np

# per-phase wall-clock instrumentation, mirroring the reference's log::debug!
# lines around every prover phase (prover/src/lib.rs:239-263 etc.); enable
# with logging.basicConfig(level=logging.DEBUG) or the CLI's --verbose
logger = logging.getLogger("starkpack_winterfell_tpu.prover")

from ..air.air import AuxTraceRandElements
from ..errors import ProverError
from ..fri.prover import FriProver, LimbFriProver
from ..ops.backend import get_backend
from .channel import ProverChannel
from .commitment import (
    build_constraint_queries,
    build_segment_queries,
    commit_to_comb_rows,
    commit_to_rows,
    interpolate_and_lde,
)
from .composer import DeepCompositionPoly
from .constraints import ConstraintEvaluator, apply_divisors
from .domain import StarkDomain


class Prover:
    """Subclass interface (prover/src/lib.rs:124):
    - ``air_class``: the Air subclass
    - ``hasher``: a hasher from crypto.hashers
    - ``get_pub_inputs(trace)``: public inputs object with ``to_elements()``
    - ``options()``: ProofOptions
    """

    air_class = None
    hasher = None

    def get_pub_inputs(self, trace):
        raise NotImplementedError

    def options(self):
        raise NotImplementedError

    def prove(self, n: int, traces, device: bool = False):
        """device=True runs the jitted accelerator pipeline (prover/device.py);
        both paths emit byte-identical proofs."""
        if device:
            from .device import DeviceProver

            return DeviceProver.prove_device(self, n, traces)
        ext_deg = self.options().field_extension
        return self._generate_proof(n, traces, ext_deg)

    # -- pipeline ------------------------------------------------------------

    def _generate_proof(self, n: int, traces, ext_deg: int):
        if n != len(traces):
            raise ProverError(
                f"expected {n} traces, got {len(traces)}"
            )
        options = self.options()

        # Phase 0: public inputs, AIRs, channel (lib.rs:205-228)
        pub_inputs_vec = [self.get_pub_inputs(t) for t in traces]
        pub_elements_vec = [p.to_elements() for p in pub_inputs_vec]
        airs = [
            self.air_class(t.get_info(), p, options)
            for t, p in zip(traces, pub_inputs_vec)
        ]
        spec = airs[0].field_spec()
        B = get_backend(spec.name)
        channel = ProverChannel(n, airs, pub_elements_vec, self.hasher, ext_deg, spec)

        # domain from the AIR with the largest trace (lib.rs:241-257)
        max_idx = max(range(n), key=lambda i: airs[i].trace_length())
        domain = StarkDomain(airs[max_idx], B)

        # Phase 1: trace commitment (lib.rs:615-670)
        _t = time.perf_counter()
        main_segments = [t.main_segment_limbs(B) for t in traces]
        main_polys, main_ldes = interpolate_and_lde(
            main_segments, domain.domain_offset, domain.trace_to_lde_blowup, B
        )
        main_tree = commit_to_comb_rows(main_ldes, self.hasher, 1, B)
        channel.commit_trace(main_tree.root())
        logger.debug(
            "committed to %d extended execution trace(s) of %d columns and 2^%d "
            "steps in %.0f ms", n, traces[0].width, domain.lde_size.bit_length() - 1,
            (time.perf_counter() - _t) * 1e3,
        )
        _t = time.perf_counter()

        traces_polys = [{"main": p, "aux": []} for p in main_polys]
        traces_ldes = [{"main": l, "aux": []} for l in main_ldes]
        aux_trees = []
        aux_traces_rand_elements = [AuxTraceRandElements() for _ in range(n)]

        for seg_idx in range(traces[0].num_aux_segments()):
            aux_segments = []
            for i, trace in enumerate(traces):
                rand_elements = channel.get_aux_trace_segment_rand_elements(seg_idx)
                aux_traces_rand_elements[i].add_segment_elements(rand_elements)
                aux_segments.append(trace.build_aux_segment(seg_idx, rand_elements))
            aux_polys, aux_ldes = interpolate_and_lde(
                aux_segments, domain.domain_offset, domain.trace_to_lde_blowup, B
            )
            aux_tree = commit_to_comb_rows(aux_ldes, self.hasher, ext_deg, B)
            channel.commit_trace(aux_tree.root())
            aux_trees.append(aux_tree)
            for i in range(n):
                traces_polys[i]["aux"].append(aux_polys[i])
                traces_ldes[i]["aux"].append(aux_ldes[i])

        # Phase 2: constraint evaluation per AIR (lib.rs:386-410)
        columns_divisors = []
        for i, air in enumerate(airs):
            constraint_coeffs = channel.get_constraint_composition_coeffs()
            evaluator = ConstraintEvaluator(
                air, aux_traces_rand_elements[i], constraint_coeffs, ext_deg, B
            )
            columns, divisors = evaluator.evaluate(
                traces_ldes[i]["main"], traces_ldes[i]["aux"], domain
            )
            columns_divisors.append((columns, divisors))
        logger.debug(
            "evaluated constraints over domain of 2^%d elements in %.0f ms",
            domain.ce_size.bit_length() - 1, (time.perf_counter() - _t) * 1e3,
        )
        _t = time.perf_counter()

        # Phase 3: composition & commitment (lib.rs:422-475)
        comb_polys = []
        for columns, divisors in columns_divisors:
            acc = apply_divisors(columns, divisors, domain)
            coeffs = B.interpolate_poly_with_offset(acc, domain.domain_offset)
            comb_polys.append(coeffs)
        final_coeff = channel.get_final_polynomial_coeffs()
        final_comb = comb_polys[0]
        ce = domain.ce_size
        for i, cp in enumerate(comb_polys[1:], start=1):
            k = B.vbroadcast(
                B.scalar_to_limbs(spec.fexp(final_coeff, i), ext_deg), (ce,)
            )
            final_comb = B.vadd(final_comb, B.vmul(cp, k))

        num_cols = airs[0].context.num_constraint_composition_columns()
        trace_length = domain.trace_length
        # chunk coefficients into num_cols columns of trace_length
        # (composition_poly.rs:86-98)
        comp_columns = tuple(
            B.cmap(
                lambda l: l.reshape(ce // trace_length, trace_length)[:num_cols], c
            )
            for c in B.promote(final_comb, ext_deg)
        )
        comp_lde = B.evaluate_poly_with_offset(
            comp_columns, domain.domain_offset, domain.lde_size // trace_length
        )
        constraint_tree = commit_to_rows(comp_lde, self.hasher, ext_deg, B)
        channel.commit_constraints(constraint_tree.root())
        logger.debug(
            "converted constraint evaluations into %d composition polynomial "
            "columns and committed in %.0f ms", num_cols,
            (time.perf_counter() - _t) * 1e3,
        )
        _t = time.perf_counter()

        return finish_proof(
            channel, airs, domain, options, ext_deg, B, spec, self.hasher,
            traces_polys, traces_ldes, main_ldes, main_tree, aux_trees,
            comp_columns, comp_lde, constraint_tree,
        )


def finish_proof(channel, airs, domain, options, ext_deg, B, spec, hasher,
                 traces_polys, traces_ldes, main_ldes, main_tree, aux_trees,
                 comp_columns, comp_lde, constraint_tree,
                 deep_lde_and_fri=None, query_rows_fn=None, ood_fn=None,
                 deep_fn=None):
    """Phases 4-8 of generate_proof (OOD + DEEP + FRI + queries + assembly),
    shared by the host pipeline and the mesh pipeline's tail
    (prover/src/lib.rs:476-603).

    deep_lde_and_fri: optional override for phases 5-6 — called with the
    DEEP coefficient columns, must run the LDE + FRI layer commits against
    `channel` and return the FriProver to build the proof from (the mesh
    pipeline passes a sharded implementation).

    query_rows_fn: optional override for the Phase-8 row extraction —
    called with the query positions, returns (main_ldes, aux_ldes_list,
    comp_lde) holding ONLY the queried columns (gathered on device; full
    LDEs at 2^23 are GBs of tunnel traffic).  When set, the traces_ldes /
    main_ldes / comp_lde arguments may be None.

    ood_fn(z, zg) -> (ood_traces_states, ood_evaluations): optional device
    override for the Phase-4 out-of-domain evaluations (host element
    lists; the mesh pipeline computes the power-series dots on device so
    the coefficient tables never leave it).

    deep_fn(z, cc, ood_traces_states, ood_evaluations) -> coefficient
    comps: optional device override for the DEEP composition polynomial
    (requires deep_lde_and_fri; the degree sanity assert is covered by the
    host differential tests)."""
    n = len(airs)
    trace_length = domain.trace_length
    _t = time.perf_counter()

    # Phase 4: OOD evaluation + DEEP (lib.rs:476-535)
    z = channel.get_ood_point()
    g_trace = B.get_root_of_unity(trace_length.bit_length() - 1)
    zg = spec.fmul(z, g_trace)
    if ood_fn is not None:
        ood_traces_states, ood_evaluations = ood_fn(z, zg)
    else:
        n_coeffs = traces_polys[0]["main"][0][0].shape[-1]
        powz = B.power_series_elem(B.scalar_to_limbs(z, ext_deg), n_coeffs)
        powzg = B.power_series_elem(B.scalar_to_limbs(zg, ext_deg), n_coeffs)
        ood_traces_states = []
        for tp in traces_polys:
            at_z = evaluate_trace_polys_at(tp, z, ext_deg, B, powz)
            at_zg = evaluate_trace_polys_at(tp, zg, ext_deg, B, powzg)
            ood_traces_states.append([at_z, at_zg])
        ood_evaluations = evaluate_columns_at(comp_columns, z, ext_deg, B)
    channel.send_ood_trace_states(ood_traces_states)
    channel.send_ood_constraint_evaluations(ood_evaluations)

    deep_coefficients = channel.get_deep_composition_coeffs()
    if deep_fn is not None:
        deep_coeffs = deep_fn(z, deep_coefficients, ood_traces_states,
                              ood_evaluations)
    else:
        deep = DeepCompositionPoly(z, deep_coefficients, ext_deg, B)
        deep.add_trace_polys(traces_polys, ood_traces_states)
        deep.add_composition_poly(comp_columns, ood_evaluations)
        if deep.degree() != trace_length - 2:
            # mirrors ProverError::... (prover/src/lib.rs:535) — a wrong
            # DEEP degree means the AIR's constraint degrees are
            # inconsistent
            raise ProverError(
                f"DEEP composition degree {deep.degree()} != "
                f"{trace_length - 2}"
            )
        deep_coeffs = deep.coefficients

    logger.debug(
        "built DEEP composition polynomial of degree %d in %.0f ms",
        trace_length - 2, (time.perf_counter() - _t) * 1e3,
    )
    _t = time.perf_counter()

    # Phase 5-6: DEEP evaluation over LDE + FRI (lib.rs:543-561)
    if deep_lde_and_fri is not None:
        fri_prover = deep_lde_and_fri(deep_coeffs)
    else:
        deep_evaluations = B.evaluate_poly_with_offset(
            deep_coeffs, domain.domain_offset, domain.trace_to_lde_blowup
        )
        if spec.name == "f64":
            fri_prover = FriProver(options.to_fri_options(), hasher, ext_deg)
            fri_prover.build_layers(channel, deep_evaluations)
        else:
            fri_prover = LimbFriProver(
                options.to_fri_options(), hasher, B.F, spec, ext_deg
            )
            fri_prover.build_layers(channel, deep_evaluations)

    logger.debug(
        "computed %d FRI layers from composition polynomial evaluations "
        "in %.0f ms", options.to_fri_options().num_fri_layers(domain.lde_size),
        (time.perf_counter() - _t) * 1e3,
    )
    _t = time.perf_counter()

    # Phase 7: PoW + query positions (lib.rs:574-577)
    channel.grind_query_seed()
    query_positions = channel.get_query_positions()

    # Phase 8: proof assembly (lib.rs:585-603)
    # one combined prefetch for every segment/constraint tree's Merkle
    # paths (device trees otherwise pay one tunnel round trip each inside
    # prove_batch); the FRI layer trees batch their own inside build_proof
    from ..crypto.merkle import MerkleTree

    MerkleTree.prefetch_trees(
        [(t, query_positions)
         for t in [main_tree, *aux_trees, constraint_tree]
         if t is not None]
    )
    fri_proof = fri_prover.build_proof(query_positions)
    gathered = query_rows_fn is not None
    if gathered:
        main_ldes, aux_ldes_list, comp_lde = query_rows_fn(query_positions)
    trace_queries = [
        build_segment_queries(main_ldes, main_tree, query_positions, 1, B,
                              gathered=gathered)
    ]
    for seg_idx, aux_tree in enumerate(aux_trees):
        if gathered:
            aux_ldes_i = aux_ldes_list[seg_idx]
        else:
            aux_ldes_i = [traces_ldes[i]["aux"][seg_idx] for i in range(n)]
        trace_queries.append(
            build_segment_queries(aux_ldes_i, aux_tree, query_positions,
                                  ext_deg, B, gathered=gathered)
        )
    constraint_queries = build_constraint_queries(
        comp_lde, constraint_tree, query_positions, ext_deg, B,
        gathered=gathered,
    )
    logger.debug(
        "determined %d query positions and built proof object in %.0f ms",
        len(query_positions), (time.perf_counter() - _t) * 1e3,
    )
    return channel.build_proof(trace_queries, constraint_queries, fri_proof)


def evaluate_columns_at(columns, z, ext_deg: int, B=None, powz=None):
    """Evaluate per-column polynomials (component tuple (w, n)) at an element
    z — vectorized dot with the power series of z (col_matrix.rs:249).
    powz: optional precomputed power series (the series is a sequential
    scalar-multiply chain, so multi-instance callers hoist it)."""
    if B is None:
        B = get_backend("f64")
    w, n = columns[0][0].shape
    if powz is None:
        powz = B.power_series_elem(B.scalar_to_limbs(z, ext_deg), n)
    prod = B.vmul(powz, columns)  # broadcast (n,) x (w, n)
    sums = B.vsum(prod, axis=-1)
    return B.limbs_to_elems(sums, len(sums))


def evaluate_trace_polys_at(trace_polys, z, ext_deg: int, B=None, powz=None):
    """TracePolyTable::evaluate_at (poly_table.rs:47-53): main then aux."""
    result = evaluate_columns_at(trace_polys["main"], z, ext_deg, B, powz)
    for aux in trace_polys["aux"]:
        result.extend(evaluate_columns_at(aux, z, ext_deg, B, powz))
    return result
