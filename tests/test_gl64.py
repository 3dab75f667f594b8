"""Differential tests for Goldilocks limb arithmetic vs python-int oracle.

Mirrors the reference's field axiom tests (math/src/field/f64/tests.rs)."""

import numpy as np
import pytest

from starkpack_winterfell_tpu.ops import gl64 as gl
from starkpack_winterfell_tpu.ops import gl64_ext as ext
from starkpack_winterfell_tpu.ops.felt import Felt

P = gl.P
rng = np.random.default_rng(42)


def rand_u64(n):
    vals = rng.integers(0, P, size=n, dtype=np.uint64)
    # sprinkle edge cases
    edge = np.array([0, 1, 2, P - 1, P - 2, 0xFFFFFFFF, 0x100000000, P >> 1], dtype=np.uint64)
    vals[: len(edge)] = edge[: min(len(edge), n)]
    return vals


def as_ints(a):
    return [int(x) for x in np.atleast_1d(a)]


N = 64


class TestBaseFieldNumpy:
    def setup_method(self):
        self.a = rand_u64(N)
        self.b = rand_u64(N)
        self.ga = gl.from_u64(self.a)
        self.gb = gl.from_u64(self.b)

    def test_roundtrip(self):
        assert np.array_equal(gl.to_u64(self.ga), self.a)

    def test_add(self):
        got = gl.to_u64(gl.add(self.ga, self.gb))
        want = [(x + y) % P for x, y in zip(as_ints(self.a), as_ints(self.b))]
        assert as_ints(got) == want

    def test_sub(self):
        got = gl.to_u64(gl.sub(self.ga, self.gb))
        want = [(x - y) % P for x, y in zip(as_ints(self.a), as_ints(self.b))]
        assert as_ints(got) == want

    def test_neg(self):
        got = gl.to_u64(gl.neg(self.ga))
        want = [(-x) % P for x in as_ints(self.a)]
        assert as_ints(got) == want

    def test_mul(self):
        got = gl.to_u64(gl.mul(self.ga, self.gb))
        want = [(x * y) % P for x, y in zip(as_ints(self.a), as_ints(self.b))]
        assert as_ints(got) == want

    def test_mul_small(self):
        for k in [0, 1, 3, 0xFFFFFFFF, 12345]:
            got = gl.to_u64(gl.mul_small(self.ga, k))
            want = [(x * k) % P for x in as_ints(self.a)]
            assert as_ints(got) == want

    def test_exp7(self):
        got = gl.to_u64(gl.exp7(self.ga))
        want = [pow(x, 7, P) for x in as_ints(self.a)]
        assert as_ints(got) == want

    def test_exp_int(self):
        for e in [0, 1, 2, 5, P - 2, (1 << 32) - 1]:
            got = gl.to_u64(gl.exp_int(self.ga, e))
            want = [pow(x, e, P) for x in as_ints(self.a)]
            assert as_ints(got) == want

    def test_inv(self):
        got = gl.to_u64(gl.inv(self.ga))
        want = [pow(x, P - 2, P) for x in as_ints(self.a)]
        assert as_ints(got) == want

    def test_batch_inv(self):
        a = self.a.copy()
        a[5] = 0  # zero should map to zero
        got = gl.to_u64(gl.batch_inv(gl.from_u64(a)))
        want = [pow(x, P - 2, P) if x else 0 for x in as_ints(a)]
        assert as_ints(got) == want

    def test_root_of_unity(self):
        for log_n in [1, 2, 5, 20, 32]:
            w = gl.get_root_of_unity(log_n)
            assert pow(w, 1 << log_n, P) == 1
            if log_n > 1:
                assert pow(w, 1 << (log_n - 1), P) != 1
        assert gl.get_root_of_unity(32) == gl.TWO_ADIC_ROOT_OF_UNITY
        # reference invariant: generator for domain of size 64 is 8
        assert gl.get_root_of_unity(6) == 8


class TestBaseFieldJax:
    """The same ops must agree when run under jax.jit on the limb arrays."""

    def test_jit_matches_numpy(self):
        import jax
        import jax.numpy as jnp

        a = rand_u64(N)
        b = rand_u64(N)
        ga = gl.from_u64(a)
        gb = gl.from_u64(b)

        @jax.jit
        def f(ga, gb):
            s = gl.add(ga, gb)
            d = gl.sub(ga, gb)
            m = gl.mul(ga, gb)
            i = gl.inv(ga)
            return s, d, m, i

        s, d, m, i = f(tuple(jnp.asarray(x) for x in ga), tuple(jnp.asarray(x) for x in gb))
        assert np.array_equal(np.asarray(s[0]), gl.add(ga, gb)[0])
        assert np.array_equal(np.asarray(s[1]), gl.add(ga, gb)[1])
        assert np.array_equal(np.asarray(d[0]), gl.sub(ga, gb)[0])
        assert np.array_equal(np.asarray(m[0]), gl.mul(ga, gb)[0])
        assert np.array_equal(np.asarray(m[1]), gl.mul(ga, gb)[1])
        assert np.array_equal(np.asarray(i[0]), gl.inv(ga)[0])
        assert np.array_equal(np.asarray(i[1]), gl.inv(ga)[1])

    def test_batch_inv_jax(self):
        import jax.numpy as jnp

        a = rand_u64(N)
        ga = tuple(jnp.asarray(x) for x in gl.from_u64(a))
        got = gl.batch_inv(ga)
        want = [pow(x, P - 2, P) if x else 0 for x in as_ints(a)]
        got64 = np.asarray(got[0], dtype=np.uint64) | (
            np.asarray(got[1], dtype=np.uint64) << np.uint64(32)
        )
        assert as_ints(got64) == want


class TestExtensions:
    def _oracle_mul2(self, a, b):
        # (a0 + a1 x)(b0 + b1 x) mod x^2 - x + 2:  x^2 = x - 2
        a0, a1 = a
        b0, b1 = b
        c0 = a0 * b0 % P
        c1 = (a0 * b1 + a1 * b0) % P
        c2 = a1 * b1 % P
        return ((c0 - 2 * c2) % P, (c1 + c2) % P)

    def _oracle_mul3(self, a, b):
        # mod x^3 - x - 1:  x^3 = x + 1, x^4 = x^2 + x
        c = [0] * 5
        for i in range(3):
            for j in range(3):
                c[i + j] = (c[i + j] + a[i] * b[j]) % P
        r0 = (c[0] + c[3]) % P
        r1 = (c[1] + c[3] + c[4]) % P
        r2 = (c[2] + c[4]) % P
        return (r0, r1, r2)

    def test_mul2(self):
        a = (rand_u64(N), rand_u64(N))
        b = (rand_u64(N), rand_u64(N))
        ga = tuple(gl.from_u64(x) for x in a)
        gb = tuple(gl.from_u64(x) for x in b)
        got = ext.mul2(ga, gb)
        for i in range(N):
            want = self._oracle_mul2(
                (int(a[0][i]), int(a[1][i])), (int(b[0][i]), int(b[1][i]))
            )
            assert (int(gl.to_u64(got[0])[i]), int(gl.to_u64(got[1])[i])) == want

    def test_square2_matches_mul2(self):
        a = (rand_u64(N), rand_u64(N))
        ga = tuple(gl.from_u64(x) for x in a)
        s = ext.square2(ga)
        m = ext.mul2(ga, ga)
        assert np.array_equal(gl.to_u64(s[0]), gl.to_u64(m[0]))
        assert np.array_equal(gl.to_u64(s[1]), gl.to_u64(m[1]))

    def test_inv2(self):
        a = (rand_u64(N), rand_u64(N))
        nonzero = (a[0] != 0) | (a[1] != 0)
        ga = tuple(gl.from_u64(x) for x in a)
        ia = ext.inv2(ga)
        prod = ext.mul2(ga, ia)
        assert np.all(gl.to_u64(prod[0])[nonzero] == 1)
        assert np.all(gl.to_u64(prod[1])[nonzero] == 0)

    def test_mul3(self):
        a = (rand_u64(N), rand_u64(N), rand_u64(N))
        b = (rand_u64(N), rand_u64(N), rand_u64(N))
        ga = tuple(gl.from_u64(x) for x in a)
        gb = tuple(gl.from_u64(x) for x in b)
        got = ext.mul3(ga, gb)
        for i in range(N):
            want = self._oracle_mul3(
                tuple(int(x[i]) for x in a), tuple(int(x[i]) for x in b)
            )
            got_i = tuple(int(gl.to_u64(g)[i]) for g in got)
            assert got_i == want

    def test_square3_and_inv3(self):
        a = (rand_u64(N), rand_u64(N), rand_u64(N))
        ga = tuple(gl.from_u64(x) for x in a)
        s = ext.square3(ga)
        m = ext.mul3(ga, ga)
        for i in range(3):
            assert np.array_equal(gl.to_u64(s[i]), gl.to_u64(m[i]))
        nonzero = (a[0] != 0) | (a[1] != 0) | (a[2] != 0)
        ia = ext.inv3(ga)
        prod = ext.mul3(ga, ia)
        assert np.all(gl.to_u64(prod[0])[nonzero] == 1)
        assert np.all(gl.to_u64(prod[1])[nonzero] == 0)
        assert np.all(gl.to_u64(prod[2])[nonzero] == 0)

    def test_frob2_is_pth_power(self):
        a = (rand_u64(4), rand_u64(4))
        ga = tuple(gl.from_u64(x) for x in a)
        # frobenius == x^p in the extension field
        f = ext.frob2(ga)
        # check via multiplicative order: (x^p)^p == x
        ff = ext.frob2(f)
        assert np.array_equal(gl.to_u64(ff[0]), gl.to_u64(ga[0]))
        assert np.array_equal(gl.to_u64(ff[1]), gl.to_u64(ga[1]))


class TestFelt:
    def test_ops(self):
        a = rand_u64(N)
        b = rand_u64(N)
        fa = Felt.from_u64s(a)
        fb = Felt.from_u64s(b)
        assert as_ints((fa * fb + fa - fb).to_u64s()) == [
            (x * y + x - y) % P for x, y in zip(as_ints(a), as_ints(b))
        ]
        assert as_ints((fa**3).to_u64s()) == [pow(x, 3, P) for x in as_ints(a)]
        assert as_ints((fa + 42).to_u64s()) == [(x + 42) % P for x in as_ints(a)]
        assert np.all((fa * fa.inverse() == Felt.from_int(1)) | (fa == Felt.from_int(0)))

    def test_mixed_degree(self):
        a = rand_u64(8)
        e = rng.integers(0, P, size=(8, 2), dtype=np.uint64)
        fa = Felt.from_u64s(a)
        fe = Felt.from_u64s(e, deg=2)
        prod = fe * fa
        want0 = [(int(e[i, 0]) * int(a[i])) % P for i in range(8)]
        want1 = [(int(e[i, 1]) * int(a[i])) % P for i in range(8)]
        assert as_ints(prod.to_u64s()[..., 0]) == want0
        assert as_ints(prod.to_u64s()[..., 1]) == want1


def test_square_specialization_matches_mul():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from starkpack_winterfell_tpu.ops import gl64 as gl

    rng = np.random.default_rng(23)
    vals = rng.integers(0, gl.P, size=4097, dtype=np.uint64)
    # include boundary values
    vals[:4] = [0, 1, gl.P - 1, 0xFFFFFFFF]
    a = tuple(jnp.asarray(x) for x in gl.from_u64(vals))
    sq = jax.jit(gl.square)(a)
    mu = jax.jit(lambda t: gl.mul(t, t))(a)
    np.testing.assert_array_equal(np.asarray(sq[0]), np.asarray(mu[0]))
    np.testing.assert_array_equal(np.asarray(sq[1]), np.asarray(mu[1]))
