"""Field-level vectors embedded in the reference's test suites, mirrored
verbatim (VERDICT r3 item 9: keep shrinking the self-oracle risk surface).

Sources (literal expected values copied from the Rust tests):
- /root/reference/math/src/field/f64/tests.rs:146-158 (roots of unity),
  258-279 (quad_mul), 293-316 (quad_conjugate), 321-385 (cube_mul)
- /root/reference/math/src/field/f62/tests.rs:138-199 (cube_mul)
- /root/reference/math/src/field/f128/tests.rs:128-146 (roots of unity),
  163-180 (elements_as_bytes LE layout)

The scalar FieldSpec layer and the device (u32-limb) gl64_ext kernels are
both pinned to the same expectations.
"""

import numpy as np

from starkpack_winterfell_tpu.math.fieldspec import F62_SPEC, F128_SPEC, GL64_SPEC
from starkpack_winterfell_tpu.ops import gl64 as gl
from starkpack_winterfell_tpu.ops import gl64_ext as ext
from starkpack_winterfell_tpu.utils.serde import ByteWriter

F64 = GL64_SPEC
F62 = F62_SPEC
F128 = F128_SPEC
M64 = F64.P
M62 = F62.P

# (a, b, expected) triples copied from the reference tests --------------------

QUAD_MUL_F64 = [
    # f64/tests.rs:260-263 (within bounds)
    ((3, 1), (4, 2), (8, 12)),
    # :266-270 (overflow)
    ((3, M64 - 1), (M64 - 3, 5), (1, 13)),
    # :273-278
    ((3, M64 - 1), (10, M64 - 2), (26, 18446744069414584307)),
]

QUAD_CONJ_F64 = [
    # f64/tests.rs:295-315
    ((M64 - 1, 3), (2, 18446744069414584318)),
    ((M64 - 3, M64 - 2), (18446744069414584316, 2)),
    ((4, 7), (11, 18446744069414584314)),
]

CUBE_MUL_F64 = [
    # f64/tests.rs:323-340 (within bounds)
    ((3, 5, 2), (320, 68, 3), (1111, 1961, 995)),
    # :343-360 (overflow)
    (
        (18446744069414584267, 18446744069414584309, 9223372034707292160),
        (18446744069414584101, 420, 18446744069414584121),
        (14070, 18446744069414566571, 5970),
    ),
    # :362-380
    (
        (18446744069414584266, 18446744069412558094, 5268562),
        (18446744069414583589, 1226, 5346),
        (18446744065041672051, 25275910656, 21824696736),
    ),
]

CUBE_MUL_F62 = [
    # f62/tests.rs:147-163 (within bounds)
    ((15, 22, 8), (20, 22, 6), (4611624995532046021, 58, 638)),
    # :166-181 (overflow)
    (
        (4611624995532046322, 1390, 4611624995532037737),
        (4611624995532046117, 2305812497766022990, 4611624995532046335),
        (4611624995528984997, 2305812497762621006, 1609515),
    ),
    # :183-198
    (
        (4611624995532046319, 4611624995532045209, 4611624995532030347),
        (4611624995532046117, 200000476, 4611624995077500937),
        (5370560804040, 4611615826131194009, 4611610241754952409),
    ),
]


def test_quad_mul_f64_scalar_and_device():
    for a, b, expected in QUAD_MUL_F64:
        assert F64.fmul(a, b) == expected
        al = tuple(gl.from_u64(np.array([c], dtype=np.uint64)) for c in a)
        bl = tuple(gl.from_u64(np.array([c], dtype=np.uint64)) for c in b)
        got = ext.mul2(al, bl)
        assert tuple(int(gl.to_u64(c)[0]) for c in got) == expected


def test_quad_conjugate_f64():
    for a, expected in QUAD_CONJ_F64:
        al = tuple(gl.from_u64(np.array([c], dtype=np.uint64)) for c in a)
        got = ext.frob2(al)
        assert tuple(int(gl.to_u64(c)[0]) for c in got) == expected


def test_cube_mul_f64_scalar_and_device():
    for a, b, expected in CUBE_MUL_F64:
        assert F64.fmul(a, b) == expected
        al = tuple(gl.from_u64(np.array([c], dtype=np.uint64)) for c in a)
        bl = tuple(gl.from_u64(np.array([c], dtype=np.uint64)) for c in b)
        got = ext.mul3(al, bl)
        assert tuple(int(gl.to_u64(c)[0]) for c in got) == expected


def test_cube_mul_f62_scalar():
    for a, b, expected in CUBE_MUL_F62:
        assert F62.fmul(a, b) == expected


def test_roots_of_unity_all_fields():
    # f64/tests.rs:146-158, f62 analog, f128/tests.rs:128-146
    for spec in (F64, F62, F128):
        k = spec.TWO_ADICITY
        root = spec.get_root_of_unity(k)
        assert root == spec.TWO_ADIC_ROOT_OF_UNITY
        assert pow(root, 1 << k, spec.P) == 1
        assert pow(root, 1 << (k - 1), spec.P) != 1  # exact order
        root_km1 = spec.get_root_of_unity(k - 1)
        assert root_km1 == pow(root, 2, spec.P)
        assert pow(root_km1, 1 << (k - 1), spec.P) == 1


def test_sub_and_equals_literals():
    # 3 - 5 == M - 2 (f64/tests.rs:44-48, f62:44-48, f128:55-59)
    for spec in (F64, F62, F128):
        assert spec.fsub(3, 5) == spec.P - 2
        # (M-1)^2 == 1 (the "equals" tests)
        assert spec.fmul(spec.P - 1, spec.P - 1) == 1
        # t = (M+1)/2 doubles to 1: t*2 == 1, t*4 == 2... reference phrases
        # it as t*t == 1 for t = M-1 (covered) and t*2 == M-2 for t = M-1
        assert spec.fmul(spec.P - 1, 2) == spec.P - 2
        assert spec.fmul(spec.P - 1, 4) == spec.P - 4


def test_f128_elements_as_bytes_layout():
    # f128/tests.rs:165-180: elements 1..4 serialize to 16-byte LE each
    w = ByteWriter()
    w.write_felts([1, 2, 3, 4], elem_bytes=16)
    expected = bytes(
        [1] + [0] * 15 + [2] + [0] * 15 + [3] + [0] * 15 + [4] + [0] * 15
    )
    assert w.to_bytes() == expected
