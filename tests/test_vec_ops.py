"""Unit tests for vectorized element ops (suffix scans, synthetic division,
Horner, power series)."""

import numpy as np

from starkpack_winterfell_tpu.math import scalar as fs
from starkpack_winterfell_tpu.ops import gl64 as gl, vec
from starkpack_winterfell_tpu.utils.convert import elems_to_limbs, limbs_to_elems, scalar_to_limbs

rng = np.random.default_rng(110)
P = fs.P


def test_suffix_sums():
    vals = [int(x) for x in rng.integers(0, P, size=37, dtype=np.uint64)]
    limbs = elems_to_limbs(vals, 1)
    suf = vec.suffix_sums(limbs)
    got = limbs_to_elems(suf, 1)
    want = [sum(vals[i:]) % P for i in range(len(vals))]
    assert got == want


def test_syn_div_binomial_matches_host():
    from starkpack_winterfell_tpu.math import polynom

    n = 64
    z = int(rng.integers(1, P, dtype=np.uint64))
    q = [int(x) for x in rng.integers(0, P, size=n - 1, dtype=np.uint64)]
    # p = q * (x - z) so the division is exact
    p = [0] * n
    for i, c in enumerate(q):
        p[i + 1] = (p[i + 1] + c) % P
        p[i] = (p[i] - c * z) % P
    limbs = elems_to_limbs(p, 1)
    out = vec.syn_div_binomial(limbs, scalar_to_limbs(z, 1))
    got = limbs_to_elems(out, 1)
    assert got[: n - 1] == q
    assert got[n - 1] == 0


def test_syn_div_quadratic_extension():
    n = 32
    z = (
        int(rng.integers(1, P, dtype=np.uint64)),
        int(rng.integers(1, P, dtype=np.uint64)),
    )
    q = [
        (int(a), int(b))
        for a, b in zip(
            rng.integers(0, P, size=n - 1, dtype=np.uint64),
            rng.integers(0, P, size=n - 1, dtype=np.uint64),
        )
    ]
    p = [fs.zero(2)] * n
    p = [(0, 0)] * n
    for i, c in enumerate(q):
        p[i + 1] = fs.fadd(p[i + 1], c)
        p[i] = fs.fsub(p[i], fs.fmul(c, z))
    limbs = elems_to_limbs(p, 2)
    out = vec.syn_div_binomial(limbs, scalar_to_limbs(z, 2))
    got = limbs_to_elems(out, 2)
    assert got[: n - 1] == q


def test_horner_and_power_series():
    n = 20
    coeffs = [int(x) for x in rng.integers(0, P, size=n, dtype=np.uint64)]
    x = int(rng.integers(0, P, dtype=np.uint64))
    limbs = elems_to_limbs(coeffs, 1)
    got = vec.horner(limbs, scalar_to_limbs(x, 1))
    want = 0
    for c in reversed(coeffs):
        want = (want * x + c) % P
    assert limbs_to_elems(got, 1)[0] == want

    ps = vec.power_series_elem(scalar_to_limbs(x, 1), 13)
    assert limbs_to_elems(ps, 1) == [pow(x, i, P) for i in range(13)]


def test_vsum_odd_length():
    vals = [int(v) for v in rng.integers(0, P, size=33, dtype=np.uint64)]
    limbs = elems_to_limbs(vals, 1)
    s = vec.vsum(limbs)
    assert limbs_to_elems(tuple((np.atleast_1d(c[0]), np.atleast_1d(c[1])) for c in s), 1)[0] == sum(vals) % P
