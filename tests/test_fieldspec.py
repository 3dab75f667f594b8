"""FieldSpec multi-field abstraction: cross-checks vs the specialized f64
scalar module, generic extension arithmetic, f62/f128 limb NTTs, and
field-parameterized transcript draws."""

import numpy as np
import pytest

from starkpack_winterfell_tpu.math import scalar as fs
from starkpack_winterfell_tpu.math.fieldspec import F62_SPEC, F128_SPEC, GL64_SPEC
from starkpack_winterfell_tpu.ops.limb_field import F62, F128

rng = np.random.default_rng(200)


def rand_elem(spec, deg):
    comps = tuple(int.from_bytes(rng.bytes(32), "little") % spec.P for _ in range(deg))
    return comps[0] if deg == 1 else comps


class TestGL64SpecMatchesScalarModule:
    """GL64_SPEC must agree with math/scalar.py on every op."""

    @pytest.mark.parametrize("deg", [1, 2, 3])
    def test_ops_agree(self, deg):
        for _ in range(20):
            a = rand_elem(GL64_SPEC, deg)
            b = rand_elem(GL64_SPEC, deg)
            assert GL64_SPEC.fadd(a, b) == fs.fadd(a, b)
            assert GL64_SPEC.fsub(a, b) == fs.fsub(a, b)
            assert GL64_SPEC.fmul(a, b) == fs.fmul(a, b)
            assert GL64_SPEC.finv(a) == fs.finv(a)
            assert GL64_SPEC.fexp(a, 12345) == fs.fexp(a, 12345)


@pytest.mark.parametrize("spec", [F62_SPEC, F128_SPEC], ids=["f62", "f128"])
class TestExtensionAxioms:
    def test_quad_field_axioms(self, spec):
        for _ in range(10):
            a = rand_elem(spec, 2)
            b = rand_elem(spec, 2)
            c = rand_elem(spec, 2)
            # distributivity + associativity spot checks
            left = spec.fmul(a, spec.fadd(b, c))
            right = spec.fadd(spec.fmul(a, b), spec.fmul(a, c))
            assert left == right
            assert spec.fmul(spec.fmul(a, b), c) == spec.fmul(a, spec.fmul(b, c))
            # inverse
            if not spec.is_zero(a):
                assert spec.fmul(a, spec.finv(a)) == spec.one(2)

    def test_exp_order(self, spec):
        # multiplicative group of the quad extension has order P^2 - 1
        a = rand_elem(spec, 2)
        if spec.is_zero(a):
            a = spec.one(2)
        assert spec.fexp(a, spec.P * spec.P - 1) == spec.one(2)


def test_f62_cubic():
    spec = F62_SPEC
    for _ in range(10):
        a = rand_elem(spec, 3)
        b = rand_elem(spec, 3)
        assert spec.fmul(spec.fmul(a, b), b) == spec.fmul(a, spec.fmul(b, b))
        if not spec.is_zero(a):
            assert spec.fmul(a, spec.finv(a)) == spec.one(3)


def test_f128_cubic_unsupported():
    assert not F128_SPEC.supports_extension(3)


@pytest.mark.parametrize("F,spec", [(F62, F62_SPEC), (F128, F128_SPEC)],
                         ids=["f62", "f128"])
class TestLimbNTT:
    def test_forward_matches_naive(self, F, spec):
        n = 16
        coeffs = [rand_elem(spec, 1) for _ in range(n)]
        limbs = F.from_ints(coeffs)
        out = F.ntt(limbs)
        got = F.to_ints(out)
        w = spec.get_root_of_unity(4)
        for i in range(n):
            x = pow(w, i, spec.P)
            want = 0
            for c in reversed(coeffs):
                want = (want * x + c) % spec.P
            assert got[i] == want

    def test_interpolate_roundtrip(self, F, spec):
        n = 32
        coeffs = [rand_elem(spec, 1) for _ in range(n)]
        limbs = F.from_ints(coeffs)
        back = F.interpolate_poly(F.ntt(limbs))
        assert F.to_ints(back) == coeffs

    def test_coset_lde(self, F, spec):
        n = 8
        blowup = 4
        coeffs = [rand_elem(spec, 1) for _ in range(n)]
        out = F.evaluate_poly_with_offset(F.from_ints(coeffs), spec.GENERATOR, blowup)
        got = F.to_ints(out)
        big = n * blowup
        w = spec.get_root_of_unity(5)
        for i in [0, 1, 7, 13, 31]:
            x = spec.GENERATOR * pow(w, i, spec.P) % spec.P
            want = 0
            for c in reversed(coeffs):
                want = (want * x + c) % spec.P
            assert got[i] == want


def test_coin_draw_f128():
    from starkpack_winterfell_tpu.crypto.hashers import Sha3_256
    from starkpack_winterfell_tpu.crypto.random_coin import RandomCoin

    coin = RandomCoin(Sha3_256, [1, 2, 3], field=F128_SPEC)
    e = coin.draw()
    assert isinstance(e, int) and 0 <= e < F128_SPEC.P
    # a second coin with the same seed draws identically
    coin2 = RandomCoin(Sha3_256, [1, 2, 3], field=F128_SPEC)
    assert coin2.draw() == e
    q = coin.draw(2)
    assert isinstance(q, tuple) and all(0 <= c < F128_SPEC.P for c in q)


def test_serde_f128_roundtrip():
    from starkpack_winterfell_tpu.utils.serde import ByteWriter, SliceReader

    vals = [rand_elem(F128_SPEC, 1) for _ in range(5)]
    w = ByteWriter()
    w.write_felts(vals, elem_bytes=16)
    r = SliceReader(w.to_bytes())
    got = r.read_felts(5, modulus=F128_SPEC.P, elem_bytes=16)
    assert got == vals
    assert not r.has_more()


@pytest.mark.parametrize("F,spec", [(F62, F62_SPEC), (F128, F128_SPEC)],
                         ids=["f62", "f128"])
def test_fri_prove_verify_multifield(F, spec):
    """Standalone FRI over f62/f128: prove -> serialize -> verify (the
    multi-field counterpart of tests/test_fri.py)."""
    from starkpack_winterfell_tpu.crypto.hashers import Sha3_256
    from starkpack_winterfell_tpu.crypto.random_coin import RandomCoin
    from starkpack_winterfell_tpu.fri import FriOptions, FriVerifier, VerifierChannelFri
    from starkpack_winterfell_tpu.fri.prover import LimbFriProver
    from starkpack_winterfell_tpu.fri.proof import FriProof
    from starkpack_winterfell_tpu.utils.serde import ByteWriter, SliceReader

    trace_length = 64
    blowup = 4
    folding = 4
    options = FriOptions(blowup, folding, 7)
    domain_size = trace_length * blowup
    num_queries = 16

    coeffs = [rand_elem(spec, 1) for _ in range(trace_length)]
    evals = (F.evaluate_poly_with_offset(F.from_ints(coeffs), spec.GENERATOR, blowup),)

    class Channel:
        def __init__(self):
            self.coin = RandomCoin(Sha3_256, [], field=spec)
            self.commitments = []

        def commit_fri_layer(self, root):
            self.commitments.append(root)
            self.coin.reseed(root)

        def draw_fri_alpha(self):
            return self.coin.draw()

    channel = Channel()
    prover = LimbFriProver(options, Sha3_256, F, spec)
    prover.build_layers(channel, evals)
    positions = channel.coin.draw_integers(num_queries, domain_size)
    proof = prover.build_proof(positions)

    # serialization round trip
    w = ByteWriter()
    proof.write_into(w)
    proof2 = FriProof.read_from(SliceReader(w.to_bytes()))

    queried = [F.to_ints(tuple(np.atleast_1d(l[p]) for l in evals[0]))[0] for p in positions]

    vcoin = RandomCoin(Sha3_256, [], field=spec)
    vchannel = VerifierChannelFri(
        proof2, channel.commitments, Sha3_256, domain_size, folding, 1, field=spec
    )
    verifier = FriVerifier(vchannel, vcoin, options, trace_length - 1, 1, field=spec)
    verifier.verify(vchannel, queried, positions)

    # tampering must be caught
    bad = list(queried)
    bad[0] = (bad[0] + 1) % spec.P
    vchannel2 = VerifierChannelFri(
        proof2, channel.commitments, Sha3_256, domain_size, folding, 1, field=spec
    )
    from starkpack_winterfell_tpu.fri import FriVerificationError

    verifier2 = FriVerifier(
        VerifierChannelFri(proof2, channel.commitments, Sha3_256, domain_size, folding, 1, field=spec),
        RandomCoin(Sha3_256, [], field=spec), options, trace_length - 1, 1, field=spec,
    )
    with pytest.raises(FriVerificationError):
        verifier2.verify(
            VerifierChannelFri(proof2, channel.commitments, Sha3_256, domain_size, folding, 1, field=spec),
            bad, positions,
        )
