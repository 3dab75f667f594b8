"""f62 / f128 limb-field differential tests vs python-int oracle."""

import numpy as np
import pytest

from starkpack_winterfell_tpu.ops.limb_field import F62, F128

rng = np.random.default_rng(31)


def rand_elems(F, n):
    out = []
    for _ in range(n):
        v = int.from_bytes(rng.bytes(32), "little") % F.P
        out.append(v)
    # edge cases
    out[:6] = [0, 1, 2, F.P - 1, F.P - 2, (1 << (32 * F.n - 1)) % F.P]
    return out


@pytest.mark.parametrize("F", [F62, F128], ids=["f62", "f128"])
class TestLimbField:
    def test_roundtrip(self, F):
        vals = rand_elems(F, 32)
        assert F.to_ints(F.from_ints(vals)) == vals

    def test_add_sub_neg(self, F):
        a = rand_elems(F, 32)
        b = rand_elems(F, 32)
        fa, fb = F.from_ints(a), F.from_ints(b)
        assert F.to_ints(F.add(fa, fb)) == [(x + y) % F.P for x, y in zip(a, b)]
        assert F.to_ints(F.sub(fa, fb)) == [(x - y) % F.P for x, y in zip(a, b)]
        assert F.to_ints(F.neg(fa)) == [(-x) % F.P for x in a]

    def test_mul(self, F):
        a = rand_elems(F, 64)
        b = rand_elems(F, 64)
        fa, fb = F.from_ints(a), F.from_ints(b)
        assert F.to_ints(F.mul(fa, fb)) == [x * y % F.P for x, y in zip(a, b)]

    def test_exp_inv(self, F):
        a = rand_elems(F, 8)
        fa = F.from_ints(a)
        for e in [0, 1, 3, 7, 1 << 20]:
            assert F.to_ints(F.exp_int(fa, e)) == [pow(x, e, F.P) for x in a]
        assert F.to_ints(F.inv(fa)) == [pow(x, F.P - 2, F.P) if x else 0 for x in a]

    def test_root_of_unity(self, F):
        for k in [1, 5, F.TWO_ADICITY]:
            w = F.get_root_of_unity(k)
            assert pow(w, 1 << k, F.P) == 1
            if k > 1:
                assert pow(w, 1 << (k - 1), F.P) != 1

    def test_jax_matches_numpy(self, F):
        import jax
        import jax.numpy as jnp

        a = rand_elems(F, 16)
        b = rand_elems(F, 16)
        fa = tuple(jnp.asarray(x) for x in F.from_ints(a))
        fb = tuple(jnp.asarray(x) for x in F.from_ints(b))
        m = jax.jit(F.mul)(fa, fb)
        m_host = tuple(np.asarray(x) for x in m)
        assert F.to_ints(m_host) == [x * y % F.P for x, y in zip(a, b)]
        i = jax.jit(F.inv)(fa)
        i_host = tuple(np.asarray(x) for x in i)
        assert F.to_ints(i_host) == [pow(x, F.P - 2, F.P) if x else 0 for x in a]


def test_matvec_deferred_reduction_exact():
    """LimbField.matvec == per-term schoolbook over python ints, including
    zero and sub-limb constants (host + traced)."""
    import jax
    import jax.numpy as jnp

    from starkpack_winterfell_tpu.ops.limb_field import F62, F128

    rng = np.random.default_rng(21)
    for field in (F62, F128):
        w = 6
        m = [[int(x) for x in rng.integers(0, 1 << 63, size=w, dtype=np.uint64)]
             for _ in range(w)]
        m[0][1] = 0
        m[2][3] = 7
        vals = [int(x) % field.P
                for x in rng.integers(0, 1 << 63, size=w * 64, dtype=np.uint64)]
        arr = tuple(l.reshape(w, 64) for l in field.from_ints(vals))
        states = [tuple(l[j] for l in arr) for j in range(w)]
        got = field.matvec(states, m)
        for i in range(w):
            want = [sum(m[i][j] * vals[j * 64 + k] for j in range(w)) % field.P
                    for k in range(64)]
            assert [int(x) for x in field.to_ints(got[i])] == want
        got_j = jax.jit(lambda s, f=field: f.matvec(s, m))(
            [tuple(jnp.asarray(x) for x in st) for st in states]
        )
        for gi, gw in zip(got_j, got):
            for a, b in zip(gi, gw):
                np.testing.assert_array_equal(np.asarray(a), b)


def test_native_limb_kernels_match_numpy_paths():
    """limb_mod.c mul / NTT stages / matvec == the numpy formulations they
    replace, at native-engaging sizes."""
    import pytest

    from starkpack_winterfell_tpu.ops.limb_field import F62, F128

    rng = np.random.default_rng(31)
    for field in (F62, F128):
        if field._native_lib() is None:
            pytest.skip("no C compiler for the native tier")
        for sa, sb in [((1 << 13,), (1 << 13,)), ((4, 1 << 12), (1 << 12,)),
                       ((1 << 13,), (1,))]:
            na, nb = int(np.prod(sa)), int(np.prod(sb))
            av = [int(x) % field.P
                  for x in rng.integers(0, 1 << 63, size=na, dtype=np.uint64)]
            bv = [int(x) % field.P
                  for x in rng.integers(0, 1 << 63, size=nb, dtype=np.uint64)]
            a = tuple(l.reshape(sa) for l in field.from_ints(av))
            b = tuple(l.reshape(sb) for l in field.from_ints(bv))
            got = field.to_ints(field.mul(a, b))
            want = [(av[i] * bv[i % nb]) % field.P for i in range(na)]
            assert [int(x) for x in got] == want
        v = [int(x) % field.P
             for x in rng.integers(0, 1 << 63, size=4 * 1024, dtype=np.uint64)]
        a = tuple(l.reshape(4, 1024) for l in field.from_ints(v))
        for inverse in (False, True):
            got = field.ntt(a, inverse=inverse)
            lib = field._native_cached
            field._native_cached = None
            try:
                want = field.ntt(a, inverse=inverse)
            finally:
                field._native_cached = lib
            for g, w in zip(got, want):
                np.testing.assert_array_equal(g, w)
        w = 12
        m = [[int(x) for x in rng.integers(0, 1 << 63, size=w, dtype=np.uint64)]
             for _ in range(w)]
        vals = [int(x) % field.P
                for x in rng.integers(0, 1 << 63, size=w * 4096, dtype=np.uint64)]
        arr = tuple(l.reshape(w, 4096) for l in field.from_ints(vals))
        states = [tuple(l[j] for l in arr) for j in range(w)]
        got = field.matvec(states, m)
        lib = field._native_cached
        field._native_cached = None
        try:
            want = field.matvec(states, m)
        finally:
            field._native_cached = lib
        for gi, wi in zip(got, want):
            for g, x in zip(gi, wi):
                np.testing.assert_array_equal(g, x)


def test_square_specialization_matches_mul():
    """LimbField.square's traced cross+diagonal formulation == mul(a, a)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from starkpack_winterfell_tpu.ops.limb_field import F62, F128

    rng = np.random.default_rng(17)
    for field in (F62, F128):
        vals = [int.from_bytes(rng.bytes(16), "little") % field.P
                for _ in range(257)]
        a = field.from_ints(vals)
        aj = tuple(jnp.asarray(x) for x in a)
        sq = jax.jit(field.square)(aj)
        mu = jax.jit(lambda t: field.mul(t, t))(aj)
        for x, y in zip(sq, mu):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
