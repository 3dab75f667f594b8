"""FieldBackend generic vectorized ops vs FieldSpec scalar arithmetic, for
all three base fields (f64 delegates to the specialized gl64 path)."""

import random

import numpy as np
import pytest

from starkpack_winterfell_tpu.ops.backend import get_backend

RNG = random.Random(0xBACC)


def rand_elems(B, deg, n):
    return [
        tuple(RNG.randrange(B.P) for _ in range(deg)) if deg > 1 else RNG.randrange(B.P)
        for _ in range(n)
    ]


BACKENDS = ["f64", "f62", "f128"]


@pytest.mark.parametrize("name", BACKENDS)
@pytest.mark.parametrize("deg", [1, 2, 3])
def test_elementwise_ops(name, deg):
    B = get_backend(name)
    if not B.spec.supports_extension(deg):
        pytest.skip("unsupported extension")
    n = 17
    a = rand_elems(B, deg, n)
    b = rand_elems(B, deg, n)
    al = B.elems_to_limbs(a, deg)
    bl = B.elems_to_limbs(b, deg)
    assert B.limbs_to_elems(al, deg) == [B.spec.embed(x, deg) for x in a]

    s = B.spec
    assert B.limbs_to_elems(B.vadd(al, bl), deg) == [s.fadd(x, y) for x, y in zip(a, b)]
    assert B.limbs_to_elems(B.vsub(al, bl), deg) == [s.fsub(x, y) for x, y in zip(a, b)]
    assert B.limbs_to_elems(B.vmul(al, bl), deg) == [s.fmul(x, y) for x, y in zip(a, b)]
    assert B.limbs_to_elems(B.vsquare(al), deg) == [s.fmul(x, x) for x in a]
    assert B.limbs_to_elems(B.vneg(al), deg) == [s.fneg(x) for x in a]
    inv = B.limbs_to_elems(B.vinv(al), deg)
    for x, ix in zip(a, inv):
        assert s.fmul(x, ix) == s.one(deg)

    # vsum
    total = s.zero(deg)
    for x in a:
        total = s.fadd(total, x)
    got = B.limbs_to_elems(tuple(tuple(l[None] for l in c) for c in B.vsum(al)), deg)
    assert got[0] == s.embed(total, deg)


@pytest.mark.parametrize("name", BACKENDS)
@pytest.mark.parametrize("deg", [1, 2])
def test_horner_power_series_syn_div(name, deg):
    B = get_backend(name)
    s = B.spec
    n = 16
    coeffs = rand_elems(B, deg, n)
    cl = B.elems_to_limbs(coeffs, deg)
    z = rand_elems(B, deg, 1)[0]
    zl = B.scalar_to_limbs(z, deg)

    # power_series_elem
    ps = B.limbs_to_elems(B.power_series_elem(zl, n), deg)
    acc = s.one(deg)
    for j in range(n):
        assert ps[j] == s.embed(acc, deg)
        acc = s.fmul(acc, z)

    # horner along last axis: stack coeffs as (n,) arrays + point shape ()
    val = s.zero(deg)
    for c in reversed(coeffs):
        val = s.fadd(s.fmul(val, z), c)
    x_elem = tuple(tuple(np.asarray(l[0]) for l in c) for c in zl)
    got = B.horner(cl, x_elem)
    got_e = B.limbs_to_elems(tuple(tuple(l[None] for l in c) for c in got), deg)[0]
    assert got_e == s.embed(val, deg)

    # syn_div_binomial: build p with p(z) == 0, divide, re-multiply
    pe = B.limbs_to_elems(cl, deg)
    pz = val
    pe0 = s.fsub(pe[0], pz)
    p_adj = [pe0] + pe[1:]
    pl = B.elems_to_limbs(p_adj, deg)
    q = B.limbs_to_elems(B.syn_div_binomial(pl, zl), deg)
    # check q * (x - z) == p_adj
    recon = [s.zero(deg)] * n
    for i in range(n - 1):
        recon[i + 1] = s.fadd(recon[i + 1], q[i])
        recon[i] = s.fsub(recon[i], s.fmul(q[i], z))
    assert recon == [s.embed(v, deg) for v in p_adj]


@pytest.mark.parametrize("name", BACKENDS)
def test_backend_ntt_roundtrip(name):
    B = get_backend(name)
    n = 32
    blowup = 4
    coeffs = rand_elems(B, 1, n)
    cl = B.elems_to_limbs(coeffs, 1)
    lde = B.evaluate_poly_with_offset(cl, B.spec.GENERATOR, blowup)
    back = B.interpolate_poly_with_offset(lde, B.spec.GENERATOR)
    got = B.limbs_to_elems(tuple(tuple(l[:n] for l in c) for c in back), 1)
    assert got == coeffs
    tail = B.limbs_to_elems(tuple(tuple(l[n:] for l in c) for c in back), 1)
    assert all(v == 0 for v in tail)

    # spot-check one evaluation against Horner at offset*g^5
    g = B.spec.get_root_of_unity((n * blowup).bit_length() - 1)
    x = B.spec.GENERATOR * pow(g, 5, B.P) % B.P
    want = 0
    for c in reversed(coeffs):
        want = (want * x + c) % B.P
    assert B.limbs_to_elems(lde, 1)[5] == want


def test_gl64_backend_bitwise_matches_vec():
    """The f64 backend must produce the identical arrays as ops/vec — it IS
    the same code path (byte-identical proofs depend on it)."""
    from starkpack_winterfell_tpu.ops import vec
    from starkpack_winterfell_tpu.utils.convert import elems_to_limbs

    B = get_backend("f64")
    a = rand_elems(B, 2, 9)
    b = rand_elems(B, 2, 9)
    al, bl = elems_to_limbs(a, 2), elems_to_limbs(b, 2)
    for f_vec, f_b in [(vec.vadd, B.vadd), (vec.vmul, B.vmul), (vec.vsub, B.vsub)]:
        r1, r2 = f_vec(al, bl), f_b(al, bl)
        for c1, c2 in zip(r1, r2):
            for l1, l2 in zip(c1, c2):
                np.testing.assert_array_equal(l1, l2)


@pytest.mark.parametrize("name", BACKENDS)
def test_rows_to_words_matches_serde(name):
    """Hash-word layout must equal the canonical byte serialization."""
    from starkpack_winterfell_tpu.utils.serde import ByteWriter

    B = get_backend(name)
    deg = 2
    row = rand_elems(B, deg, 5)
    comps = B.elems_to_limbs(row, deg)
    words = B.rows_to_words(comps, deg)
    w = ByteWriter()
    w.write_felts(row, B.ELEMENT_BYTES)
    want = np.frombuffer(w.to_bytes(), dtype="<u4")
    np.testing.assert_array_equal(np.asarray(words).reshape(-1), want)


@pytest.mark.parametrize("name", ["f62", "f128"])
def test_eval_base_poly_at_matches_horner(name):
    """Vectorized scalar poly eval (verifier sequence/periodic polys) must
    equal python-int Horner exactly, at and around the engagement size."""
    from starkpack_winterfell_tpu.math import polynom

    B = get_backend(name)
    rng = np.random.default_rng(7)
    for n in (512, 1024, 2048):
        poly = [int(v) % B.P for v in rng.integers(0, 1 << 62, n)]
        x = int(rng.integers(1, 1 << 60))
        want = polynom.eval_at(poly, x, B.spec)
        got = B.eval_base_poly_at(B.F.from_ints(poly), x)
        assert got == want
        got2 = B.eval_int_poly_at(poly, x)
        assert got2 == want
        # cached second call must not go stale
        assert B.eval_int_poly_at(poly, x) == want
    # below the engagement size the fast path declines
    assert B.eval_int_poly_at([1] * 256, 3) is None
    assert B.eval_base_poly_at(B.F.from_ints([1] * 96), 3) is None
