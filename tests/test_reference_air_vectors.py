"""Mirror of the reference's embedded AIR-layer unit expectations —
air/src/air/assertions/tests.rs and air/src/air/boundary/tests.rs
(the last unmined in-reference oracle surface; VERDICT r4 item 8).

Each test cites the reference test it mirrors.  Values that the reference
draws from its test PRNG are replaced by fixed numpy-seeded values — the
*behavioral* expectations (field structure, sort order, overlap matrix,
poly/poly_offset construction, evaluation semantics) are what the
reference pins, not the random draws.
"""

import numpy as np
import pytest

from starkpack_winterfell_tpu.air.assertions import Assertion
from starkpack_winterfell_tpu.air.boundary import (
    BoundaryConstraint,
    _prepare_assertions,
)
from starkpack_winterfell_tpu.math import polynom
from starkpack_winterfell_tpu.math.fieldspec import GL64_SPEC
from starkpack_winterfell_tpu.math.scalar import P as GL_P

RNG = np.random.default_rng(20260820)


def rv():
    return int(RNG.integers(1, 1 << 63)) % GL_P


# -- assertions/tests.rs:single_assertion -----------------------------------


def test_single_assertion():
    value = rv()
    a = Assertion.single(2, 8, value)
    assert a.column == 2
    assert a.first_step == 8
    assert a.values == [value]
    assert a.stride == 0
    assert a.get_num_steps(16) == 1
    assert a.get_num_steps(32) == 1

    a.validate_trace_width(3)
    with pytest.raises(ValueError):
        a.validate_trace_width(1)
    a.validate_trace_length(16)
    with pytest.raises(ValueError):
        a.validate_trace_length(8)


# -- assertions/tests.rs:periodic_assertion + panics ------------------------


def test_periodic_assertion():
    value = rv()
    a = Assertion.periodic(4, 1, 16, value)
    assert (a.column, a.first_step, a.values, a.stride) == (4, 1, [value], 16)
    assert a.get_num_steps(16) == 1
    assert a.get_num_steps(32) == 2

    a.validate_trace_width(5)
    with pytest.raises(ValueError):
        a.validate_trace_width(2)
    a.validate_trace_length(16)
    with pytest.raises(ValueError):
        a.validate_trace_length(8)


def test_periodic_assertion_invalid():
    with pytest.raises(AssertionError):  # stride not a power of two (3)
        Assertion.periodic(0, 1, 3, 1)
    with pytest.raises(AssertionError):  # stride too small (1)
        Assertion.periodic(0, 1, 1, 1)
    with pytest.raises(AssertionError):  # first step >= stride
        Assertion.periodic(0, 5, 4, 1)
    with pytest.raises(ValueError):  # get_num_steps on invalid trace length
        Assertion.periodic(0, 1, 8, 1).get_num_steps(4)


# -- assertions/tests.rs:sequence_assertion + panics ------------------------


def test_sequence_assertion():
    values = [rv(), rv()]
    a = Assertion.sequence(3, 2, 4, values)
    assert (a.column, a.first_step, a.values, a.stride) == (3, 2, values, 4)
    assert a.get_num_steps(8) == 2

    a.validate_trace_length(8)
    with pytest.raises(ValueError):  # TraceLengthNotExact(8, 4)
        a.validate_trace_length(4)
    with pytest.raises(ValueError):  # TraceLengthNotExact(8, 16)
        a.validate_trace_length(16)
    a.validate_trace_width(4)
    with pytest.raises(ValueError):
        a.validate_trace_width(2)


def test_sequence_assertion_invalid():
    two = [1, 0]
    with pytest.raises(AssertionError):  # stride not a power of two (5)
        Assertion.sequence(3, 2, 5, two)
    with pytest.raises(AssertionError):  # stride too small (1)
        Assertion.sequence(3, 2, 1, two)
    with pytest.raises(AssertionError):  # first step >= stride
        Assertion.sequence(3, 5, 4, two)
    with pytest.raises(ValueError):  # inconsistent trace in get_num_steps
        Assertion.sequence(3, 2, 4, two).get_num_steps(4)
    with pytest.raises(AssertionError):  # empty values
        Assertion.sequence(3, 2, 4, [])
    with pytest.raises(AssertionError):  # len(values)=3 not a power of two
        Assertion.sequence(3, 2, 4, [1, 0, 1])


# -- assertions/tests.rs:assertion_overlap ----------------------------------


def _overlap(a, b):
    r1, r2 = a.overlaps_with(b), b.overlaps_with(a)
    assert r1 == r2, "overlap must be symmetric"
    return r1


def test_assertion_overlap():
    one = 1
    # single-single
    a = Assertion.single(3, 2, one)
    assert _overlap(a, Assertion.single(3, 2, one))
    assert not _overlap(a, Assertion.single(1, 2, one))
    assert not _overlap(a, Assertion.single(3, 1, one))

    # single-periodic
    a = Assertion.periodic(3, 2, 4, one)
    for step in (2, 6, 10):
        assert _overlap(a, Assertion.single(3, step, one))
    assert not _overlap(a, Assertion.single(1, 2, one))
    assert not _overlap(a, Assertion.single(3, 3, one))

    # single-sequence
    a = Assertion.sequence(3, 2, 8, [1, 0])
    for step in (2, 10, 18):
        assert _overlap(a, Assertion.single(3, step, one))
    assert not _overlap(a, Assertion.single(1, 2, one))
    assert not _overlap(a, Assertion.single(3, 3, one))

    # periodic-periodic
    a = Assertion.periodic(3, 4, 8, one)
    assert _overlap(a, Assertion.periodic(3, 4, 8, one))
    assert _overlap(a, Assertion.periodic(3, 4, 16, one))
    assert _overlap(a, Assertion.periodic(3, 0, 4, one))
    assert not _overlap(a, Assertion.periodic(1, 4, 8, one))
    assert not _overlap(a, Assertion.periodic(0, 0, 8, one))
    assert not _overlap(a, Assertion.periodic(0, 0, 16, one))

    # sequence-sequence
    vs = [1, 0]
    a = Assertion.sequence(3, 4, 8, vs)
    assert _overlap(a, Assertion.sequence(3, 4, 8, vs))
    assert _overlap(a, Assertion.sequence(3, 4, 16, vs))
    assert _overlap(a, Assertion.sequence(3, 0, 4, vs))
    assert not _overlap(a, Assertion.sequence(1, 4, 8, vs))
    assert not _overlap(a, Assertion.sequence(0, 0, 8, vs))
    assert not _overlap(a, Assertion.sequence(0, 0, 16, vs))

    # sequence-periodic
    a = Assertion.sequence(3, 4, 8, vs)
    assert _overlap(a, Assertion.periodic(3, 4, 8, one))
    assert _overlap(a, Assertion.periodic(3, 4, 16, one))
    assert _overlap(a, Assertion.periodic(3, 0, 4, one))
    assert not _overlap(a, Assertion.periodic(1, 4, 8, one))
    assert not _overlap(a, Assertion.periodic(0, 0, 8, one))
    assert not _overlap(a, Assertion.periodic(0, 0, 16, one))


# -- boundary/tests.rs helpers ----------------------------------------------


def _inv_g(trace_length):
    g = GL64_SPEC.get_root_of_unity(trace_length.bit_length() - 1)
    return pow(g, GL_P - 2, GL_P)


def _build_sequence_poly(values, trace_length):
    """air/src/air/tests.rs:295 build_sequence_poly — interpolation over the
    subgroup of size len(values)."""
    domain_size = len(values)
    g = GL64_SPEC.get_root_of_unity(domain_size.bit_length() - 1)
    xs = [pow(g, i, GL_P) for i in range(domain_size)]
    return polynom.interpolate(xs, values)


# -- boundary/tests.rs:boundary_constraint_from_single_assertion ------------


def test_boundary_constraint_from_single_assertion():
    inv_g = _inv_g(16)
    for column, step in ((0, 0), (1, 8)):
        value, cc = rv(), rv()
        c = BoundaryConstraint(Assertion.single(column, step, value), inv_g, cc)
        assert c.column == column
        assert c.poly == [value]
        assert c.poly_offset == (0, 1)
        assert c.cc == cc
        trace_value, x = rv(), rv()
        assert c.evaluate_at(x, trace_value) == (trace_value - value) % GL_P


# -- boundary/tests.rs:boundary_constraint_from_periodic_assertion ----------


def test_boundary_constraint_from_periodic_assertion():
    inv_g = _inv_g(16)
    for column, first_step, stride in ((0, 0, 4), (2, 3, 8)):
        value, cc = rv(), rv()
        c = BoundaryConstraint(
            Assertion.periodic(column, first_step, stride, value), inv_g, cc
        )
        assert c.column == column
        assert c.poly == [value]
        # periodic single-value constraints carry no offset
        assert c.poly_offset == (0, 1)
        trace_value, x = rv(), rv()
        assert c.evaluate_at(x, trace_value) == (trace_value - value) % GL_P


# -- boundary/tests.rs:boundary_constraint_from_sequence_assertion ----------


def test_boundary_constraint_from_sequence_assertion():
    inv_g = _inv_g(16)

    # column 0, first step 0, stride 4 — no offset
    values = [rv() for _ in range(4)]
    poly = _build_sequence_poly(values, 16)
    c = BoundaryConstraint(Assertion.sequence(0, 0, 4, values), inv_g, rv())
    assert c.column == 0
    assert c.poly == poly
    assert c.poly_offset == (0, 1)
    x, trace_value = rv(), rv()
    want = (trace_value - polynom.eval_at(poly, x)) % GL_P
    assert c.evaluate_at(x, trace_value) == want

    # column 0, first step 3, stride 8 — offset (3, inv_g^3)
    values = [rv() for _ in range(2)]
    poly = _build_sequence_poly(values, 16)
    c = BoundaryConstraint(Assertion.sequence(0, 3, 8, values), inv_g, rv())
    assert c.poly == poly
    assert c.poly_offset == (3, pow(inv_g, 3, GL_P))
    x, trace_value = rv(), rv()
    want = (
        trace_value - polynom.eval_at(poly, x * c.poly_offset[1] % GL_P)
    ) % GL_P
    assert c.evaluate_at(x, trace_value) == want


# -- boundary/tests.rs:prepare_assertions (+ panic variants) ----------------


def test_prepare_assertions_sort_order():
    values = [1, 2, 3, 4]
    assertions = [
        Assertion.single(0, 9, 5),
        Assertion.single(0, 0, 3),
        Assertion.sequence(0, 3, 4, values),
        Assertion.sequence(0, 2, 4, values),
        Assertion.periodic(1, 3, 8, 7),
        Assertion.sequence(1, 0, 8, values[:2]),
    ]
    expected = [
        Assertion.single(0, 0, 3),
        Assertion.single(0, 9, 5),
        Assertion.sequence(0, 2, 4, values),
        Assertion.sequence(0, 3, 4, values),
        Assertion.sequence(1, 0, 8, values[:2]),
        Assertion.periodic(1, 3, 8, 7),
    ]
    for perm_seed in range(3):
        rng = np.random.default_rng(perm_seed)
        shuffled = [assertions[i] for i in rng.permutation(len(assertions))]
        result = _prepare_assertions(shuffled, 2, 16)
        assert result == expected


def test_prepare_assertions_with_overlap():
    assertions = [
        Assertion.single(0, 9, 5),
        Assertion.periodic(0, 1, 8, 7),
    ]
    with pytest.raises(AssertionError):
        _prepare_assertions(assertions, 2, 16)


def test_prepare_assertions_with_invalid_trace_length():
    with pytest.raises(ValueError):
        _prepare_assertions([Assertion.single(0, 16, 5)], 2, 16)


def test_prepare_assertions_with_invalid_trace_width():
    with pytest.raises(ValueError):
        _prepare_assertions([Assertion.single(3, 17, 5)], 2, 16)


# -- air/tests.rs:get_periodic_column_polys (+ panic variants) --------------


class _MockAir:
    """Minimal stand-in mirroring air/src/air/tests.rs MockAir."""

    def __init__(self, assertions=(), periodic=(), trace_length=16):
        from starkpack_winterfell_tpu.air.air import Air, AirContext
        from starkpack_winterfell_tpu.air.options import (
            FieldExtension,
            ProofOptions,
        )
        from starkpack_winterfell_tpu.air.trace_info import TraceInfo
        from starkpack_winterfell_tpu.air.transition import (
            TransitionConstraintDegree,
        )

        self._assertions = list(assertions)
        self._periodic = [list(c) for c in periodic]
        options = ProofOptions(32, 8, 0, FieldExtension.NONE, 4, 31)
        self.context = AirContext(
            TraceInfo(4, trace_length),
            [TransitionConstraintDegree(2)],
            max(len(self._assertions), 1),
            options,
        )
        self._air = Air  # borrow the real implementations below

    def trace_length(self):
        return self.context.trace_len()

    def periodic_cache_key(self):
        return tuple(tuple(c) for c in self._periodic)

    def get_periodic_column_values(self):
        return self._periodic

    def get_assertions(self):
        return list(self._assertions)

    def get_aux_assertions(self, aux_rand_elements):
        return []

    def get_periodic_column_polys(self):
        from starkpack_winterfell_tpu.air.air import Air

        return Air.get_periodic_column_polys(self)

    def get_boundary_constraints(self, aux_rand_elements, ccs):
        from starkpack_winterfell_tpu.air.air import Air

        return Air.get_boundary_constraints(self, aux_rand_elements, ccs)


def _build_periodic_column_poly(values):
    """air/src/air/tests.rs:303 — interpolation over subgroup of len(values)."""
    return _build_sequence_poly(values, len(values))


def test_get_periodic_column_polys():
    air = _MockAir(periodic=[], trace_length=16)
    assert air.get_periodic_column_polys() == []

    col1 = [1, 0]
    col2 = [1, 0, 1, 1]
    air = _MockAir(periodic=[col1, col2], trace_length=16)
    polys = air.get_periodic_column_polys()
    assert len(polys) == 2
    assert polys[0] == _build_periodic_column_poly(col1)
    assert polys[1] == _build_periodic_column_poly(col2)


def test_get_periodic_column_polys_num_values_too_small():
    air = _MockAir(periodic=[[1]], trace_length=16)
    with pytest.raises(AssertionError, match="at least 2"):
        air.get_periodic_column_polys()


def test_get_periodic_column_polys_num_values_not_power_of_two():
    air = _MockAir(periodic=[[1, 0, 1]], trace_length=16)
    with pytest.raises(AssertionError, match="power of two"):
        air.get_periodic_column_polys()


# -- air/tests.rs:get_boundary_constraints (group structure) ----------------


def test_get_boundary_constraints_group_structure():
    values = [1, 2, 3, 4]
    trace_length = 16
    assertions = [
        Assertion.single(0, 0, 3),            # -> group 0
        Assertion.single(0, 9, 5),            # -> group 1
        Assertion.single(1, 9, 9),            # -> group 1
        Assertion.sequence(0, 2, 4, values),  # -> group 2
        Assertion.sequence(1, 2, 4, values),  # -> group 2
        Assertion.sequence(1, 0, 8, values[:2]),  # -> group 3
        Assertion.sequence(0, 3, 8, values[:2]),  # -> group 4
        Assertion.periodic(1, 3, 8, 7),       # -> group 4
    ]
    air = _MockAir(assertions=assertions, trace_length=trace_length)
    # coefficients are paired with assertions sorted by
    # (stride, first_step, column); cc index k = position in sorted order
    ccs = list(range(100, 108))
    groups = air.get_boundary_constraints(None, ccs).main_constraints

    g = GL64_SPEC.get_root_of_unity(trace_length.bit_length() - 1)
    inv_g = pow(g, GL_P - 2, GL_P)
    seq4_poly = _build_sequence_poly(values, trace_length)
    seq2_poly = _build_sequence_poly(values[:2], trace_length)

    assert len(groups) == 5

    def check(group, divisor_deg, numerator, members):
        assert group.divisor.degree() == divisor_deg
        assert group.divisor.numerator == numerator
        assert len(group.constraints) == len(members)
        for c, (column, poly, offset, cc) in zip(group.constraints, members):
            assert c.column == column
            assert c.poly == poly
            assert c.poly_offset == offset
            assert c.cc == cc

    no_off = (0, 1)
    check(groups[0], 1, [(1, 1)], [(0, [3], no_off, 100)])
    check(groups[1], 1, [(1, pow(g, 9, GL_P))],
          [(0, [5], no_off, 101), (1, [9], no_off, 102)])
    check(groups[2], 4, [(4, pow(g, 8, GL_P))],
          [(0, seq4_poly, (2, pow(inv_g, 2, GL_P)), 103),
           (1, seq4_poly, (2, pow(inv_g, 2, GL_P)), 104)])
    check(groups[3], 2, [(2, 1)], [(1, seq2_poly, no_off, 105)])
    check(groups[4], 2, [(2, pow(g, 6, GL_P))],
          [(0, seq2_poly, (3, pow(inv_g, 3, GL_P)), 106),
           (1, [7], no_off, 107)])
