"""NTT vs naive polynomial evaluation (mirrors math/src/fft/tests.rs)."""

import numpy as np

from starkpack_winterfell_tpu.ops import gl64 as gl
from starkpack_winterfell_tpu.ops import ntt

P = gl.P
rng = np.random.default_rng(7)


def naive_eval(coeffs, xs):
    out = []
    for x in xs:
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + int(c)) % P
        out.append(acc)
    return out


def rand_poly(n):
    return rng.integers(0, P, size=n, dtype=np.uint64)


def test_forward_matches_naive():
    n = 32
    p = rand_poly(n)
    w = gl.get_root_of_unity(5)
    domain = [pow(w, i, P) for i in range(n)]
    want = naive_eval(list(p), domain)
    got = ntt.evaluate_poly((gl.from_u64(p),))
    assert [int(v) for v in gl.to_u64(got[0])] == want


def test_inverse_roundtrip():
    n = 64
    p = rand_poly(n)
    ev = ntt.evaluate_poly((gl.from_u64(p),))
    back = ntt.interpolate_poly(ev)
    assert np.array_equal(gl.to_u64(back[0]), p)


def test_offset_eval_matches_naive():
    n = 16
    blowup = 8
    s = gl.GENERATOR
    p = rand_poly(n)
    big_n = n * blowup
    w = gl.get_root_of_unity(7)
    domain = [(s * pow(w, i, P)) % P for i in range(big_n)]
    want = naive_eval(list(p), domain)
    got = ntt.evaluate_poly_with_offset((gl.from_u64(p),), s, blowup)
    assert [int(v) for v in gl.to_u64(got[0])] == want


def test_offset_interpolate_roundtrip():
    n = 64
    s = gl.GENERATOR
    p = rand_poly(n)
    ev = ntt.evaluate_poly_with_offset((gl.from_u64(p),), s, 1)
    back = ntt.interpolate_poly_with_offset(ev, s)
    assert np.array_equal(gl.to_u64(back[0]), p)


def test_batched_rows():
    # leading batch axes (columns of a trace) transform independently
    n = 32
    cols = rng.integers(0, P, size=(5, n), dtype=np.uint64)
    got = ntt.evaluate_poly((gl.from_u64(cols),))
    for i in range(5):
        single = ntt.evaluate_poly((gl.from_u64(cols[i]),))
        assert np.array_equal(gl.to_u64(got[0])[i], gl.to_u64(single[0]))


def test_extension_components():
    # a quad-extension poly transforms as two independent base columns
    n = 16
    c0 = rand_poly(n)
    c1 = rand_poly(n)
    got = ntt.evaluate_poly((gl.from_u64(c0), gl.from_u64(c1)))
    g0 = ntt.evaluate_poly((gl.from_u64(c0),))
    g1 = ntt.evaluate_poly((gl.from_u64(c1),))
    assert np.array_equal(gl.to_u64(got[0]), gl.to_u64(g0[0]))
    assert np.array_equal(gl.to_u64(got[1]), gl.to_u64(g1[0]))


def test_jax_matches_numpy():
    import jax
    import jax.numpy as jnp

    n = 256
    p = rand_poly(n)
    pair = gl.from_u64(p)

    f = jax.jit(lambda c: ntt.evaluate_poly((c,)))
    got = f(tuple(jnp.asarray(x) for x in pair))
    want = ntt.evaluate_poly((pair,))
    assert np.array_equal(np.asarray(got[0][0]), want[0][0])
    assert np.array_equal(np.asarray(got[0][1]), want[0][1])
