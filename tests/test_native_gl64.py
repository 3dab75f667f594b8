"""Native Goldilocks host kernels (native/gl64_mod.c) — exactness against
python-int arithmetic and against the pure-numpy formulation they replace.

These kernels sit under gl64.mul/add/sub, ntt_components' stage loop,
Felt.__pow__ and Felt.mds_apply on the HOST path only; any mismatch would
silently change proof bytes, so everything here is exact-compare.
"""

import numpy as np
import pytest

from starkpack_winterfell_tpu.ops import gl64 as gl
from starkpack_winterfell_tpu.ops import ntt
from starkpack_winterfell_tpu.ops.felt import Felt, mds_apply

pytestmark = pytest.mark.skipif(
    gl._native_mod() is None, reason="no C compiler for the native tier"
)


def _pair(v):
    return (
        (v & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (v >> np.uint64(32)).astype(np.uint32),
    )


def _to64(p):
    return p[0].astype(np.uint64) | (p[1].astype(np.uint64) << np.uint64(32))


@pytest.mark.parametrize(
    "shape_a,shape_b",
    [((1 << 13,), (1 << 13,)), ((8, 1 << 10), (1 << 10,)), ((1 << 13,), (1,))],
    ids=["same", "suffix-bcast", "scalar"],
)
def test_mod_ops_exact(shape_a, shape_b):
    rng = np.random.default_rng(11)
    av = rng.integers(0, gl.P, size=shape_a, dtype=np.uint64)
    bv = rng.integers(0, gl.P, size=shape_b, dtype=np.uint64)
    a, b = _pair(av), _pair(bv)
    ao, bo = av.astype(object), bv.astype(object)
    assert (_to64(gl.mul(a, b)).astype(object) == (ao * bo) % gl.P).all()
    assert (_to64(gl.add(a, b)).astype(object) == (ao + bo) % gl.P).all()
    assert (_to64(gl.sub(a, b)).astype(object) == (ao - bo) % gl.P).all()
    # swapped (pattern operand first) exercises the commutative-swap path
    assert (_to64(gl.mul(b, a)).astype(object) == (ao * bo) % gl.P).all()


def test_ntt_stages_match_numpy_formulation():
    rng = np.random.default_rng(12)
    for shape in [(1 << 13,), (6, 1 << 11)]:
        for inverse in (False, True):
            v = rng.integers(0, gl.P, size=shape, dtype=np.uint64)
            comps = (gl.from_u64(v),)
            got = ntt.ntt_components(comps, inverse=inverse)
            lib = gl._NATIVE_MOD
            gl._NATIVE_MOD = None
            try:
                want = ntt.ntt_components(comps, inverse=inverse)
            finally:
                gl._NATIVE_MOD = lib
            for g, w in zip(got[0], want[0]):
                np.testing.assert_array_equal(g, w)


def test_pow_exact():
    rng = np.random.default_rng(13)
    v = rng.integers(0, gl.P, size=(1 << 12,), dtype=np.uint64)
    f = Felt.from_u64s(v)
    for e in (1, 3, 7, 49, gl.P - 2):
        got = (f**e).to_u64s()[:32]
        want = np.array([pow(int(x), e, gl.P) for x in v[:32]], dtype=np.uint64)
        np.testing.assert_array_equal(got, want)


def test_mds_apply_exact_and_matches_loop():
    rng = np.random.default_rng(14)
    w = 12
    rows = [
        [int(x) for x in rng.integers(0, gl.P, size=w, dtype=np.uint64)]
        for _ in range(w)
    ]
    vals = rng.integers(0, gl.P, size=(w, 1 << 12), dtype=np.uint64)
    states = [Felt.from_u64s(vals[j]) for j in range(w)]
    got = mds_apply(states, rows)
    for i in range(w):
        want = np.zeros((1 << 12,), dtype=object)
        for j in range(w):
            want = (want + rows[i][j] * vals[j].astype(object)) % gl.P
        np.testing.assert_array_equal(got[i].to_u64s().astype(object), want)


def test_batch_inv_exact_including_zeros():
    rng = np.random.default_rng(15)
    v = rng.integers(0, gl.P, size=(1 << 12,), dtype=np.uint64)
    v[5] = 0
    v[100] = 0
    got = gl.to_u64(gl.batch_inv(gl.from_u64(v)))
    want = np.array(
        [pow(int(x), gl.P - 2, gl.P) if x else 0 for x in v[:256]],
        dtype=np.uint64,
    )
    np.testing.assert_array_equal(got[:256], want)


def test_syn_div_matches_suffix_scan_path():
    import starkpack_winterfell_tpu.ops.backend as bk
    from starkpack_winterfell_tpu.ops.backend import get_backend

    B = get_backend("f64")
    rng = np.random.default_rng(16)
    zv = int(rng.integers(1, np.iinfo(np.int64).max)) % gl.P
    n = 1 << 12
    coeffs = rng.integers(0, gl.P, size=(3, n), dtype=np.uint64)
    for r in range(3):
        s = sum(int(coeffs[r, j]) * pow(zv, j, gl.P) for j in range(1, n)) % gl.P
        coeffs[r, 0] = (-s) % gl.P
    p = (gl.from_u64(coeffs),)
    z = (gl.from_u64(np.array([zv], dtype=np.uint64)),)
    got = B.syn_div_binomial(p, z)
    want = bk.FieldBackend.syn_div_binomial(B, p, z)
    for g, w in zip(got[0], want[0]):
        np.testing.assert_array_equal(g, w)
