"""Rescue-Prime Rp64_256 tests — golden vector from the reference's sage-
derived permutation test (crypto/src/hash/rescue/rp64_256/tests.rs:70-106)."""

import numpy as np

from starkpack_winterfell_tpu.crypto.rescue import (
    Rp64_256,
    apply_permutation_ints,
    apply_permutation_limbs,
)
from starkpack_winterfell_tpu.ops import gl64 as gl

GOLDEN_IN = list(range(12))
GOLDEN_OUT = [
    11084501481526603421,
    6291559951628160880,
    13626645864671311919,
    18397438323058963117,
    7443014167353970324,
    17930833023906771425,
    4275355080008025761,
    7676681476902901785,
    3460534574143792217,
    11912731278641497187,
    8104899243369883110,
    674509706691634438,
]


def test_permutation_golden():
    assert apply_permutation_ints(list(GOLDEN_IN)) == GOLDEN_OUT


def test_permutation_limbs_matches_ints():
    rng = np.random.default_rng(9)
    batch = 4
    state_ints = rng.integers(0, gl.P, size=(12, batch), dtype=np.uint64)
    state_limbs = [gl.from_u64(state_ints[i]) for i in range(12)]
    out = apply_permutation_limbs(state_limbs, np)
    for b in range(batch):
        want = apply_permutation_ints([int(state_ints[i][b]) for i in range(12)])
        got = [int(gl.to_u64(out[i])[b]) for i in range(12)]
        assert got == want


def test_hash_elements_vs_merge():
    rng = np.random.default_rng(10)
    elements = [int(x) for x in rng.integers(0, gl.P, size=8, dtype=np.uint64)]
    d1 = Rp64_256.hash_elements(elements[:4])[:0]  # noqa — build digests below
    import struct

    dig1 = b"".join(int(e).to_bytes(8, "little") for e in elements[:4])
    dig2 = b"".join(int(e).to_bytes(8, "little") for e in elements[4:])
    m = Rp64_256.merge(dig1, dig2)
    h = Rp64_256.hash_elements(elements)
    assert m == h


def test_merge_with_int_vs_hash_elements():
    rng = np.random.default_rng(11)
    seed_elems = [int(x) for x in rng.integers(0, gl.P, size=4, dtype=np.uint64)]
    seed = b"".join(int(e).to_bytes(8, "little") for e in seed_elems)
    val = int(rng.integers(0, gl.P, dtype=np.uint64))
    m = Rp64_256.merge_with_int(seed, val)
    h = Rp64_256.hash_elements(seed_elems + [val])
    assert m == h


def test_words_path_matches_host():
    rng = np.random.default_rng(12)
    rows = rng.integers(0, gl.P, size=(3, 10), dtype=np.uint64)
    pairs = gl.from_u64(rows)
    from starkpack_winterfell_tpu.utils.convert import rows_to_words

    words = rows_to_words((pairs,), 1)
    dev = Rp64_256.hash_words(words, 80)
    for r in range(3):
        want = Rp64_256.hash_elements([int(x) for x in rows[r]])
        assert Rp64_256.digest_to_bytes(dev[r]) == want


def test_merge_words_matches_host():
    rng = np.random.default_rng(13)
    elems = rng.integers(0, gl.P, size=(2, 4), dtype=np.uint64)
    dig_bytes = [b"".join(int(e).to_bytes(8, "little") for e in row) for row in elems]
    want = Rp64_256.merge(dig_bytes[0], dig_bytes[1])
    l = Rp64_256.digest_from_bytes(dig_bytes[0]).reshape(1, 8)
    r = Rp64_256.digest_from_bytes(dig_bytes[1]).reshape(1, 8)
    got = Rp64_256.merge_words(l, r)
    assert Rp64_256.digest_to_bytes(got[0]) == want


class TestJive:
    GOLDEN_OUT = [
        16940713730596720799, 16218555904323712189, 11042680722444601138,
        5370396747047489939, 6349480890410006944, 1551053614279730715,
        3995941143622927528, 9350074312471431779,
    ]

    def test_permutation_golden(self):
        from starkpack_winterfell_tpu.crypto.rescue_jive import apply_permutation_ints

        assert apply_permutation_ints(list(range(8))) == self.GOLDEN_OUT

    def test_merge_words_matches_host(self):
        from starkpack_winterfell_tpu.crypto.rescue_jive import RpJive64_256

        rng2 = np.random.default_rng(55)
        elems = rng2.integers(0, gl.P, size=(2, 4), dtype=np.uint64)
        dig = [b"".join(int(e).to_bytes(8, "little") for e in row) for row in elems]
        want = RpJive64_256.merge(dig[0], dig[1])
        l = RpJive64_256.digest_from_bytes(dig[0]).reshape(1, 8)
        r = RpJive64_256.digest_from_bytes(dig[1]).reshape(1, 8)
        got = RpJive64_256.merge_words(l, r)
        assert RpJive64_256.digest_to_bytes(got[0]) == want

    def test_hash_words_matches_host(self):
        from starkpack_winterfell_tpu.crypto.rescue_jive import RpJive64_256
        from starkpack_winterfell_tpu.utils.convert import rows_to_words

        rng2 = np.random.default_rng(56)
        rows = rng2.integers(0, gl.P, size=(3, 6), dtype=np.uint64)
        pairs = gl.from_u64(rows)
        words = rows_to_words((pairs,), 1)
        dev = RpJive64_256.hash_words(words, 48)
        for r in range(3):
            want = RpJive64_256.hash_elements([int(x) for x in rows[r]])
            assert RpJive64_256.digest_to_bytes(dev[r]) == want

    def test_e2e_with_jive_hasher(self):
        from starkpack_winterfell_tpu import FieldExtension, ProofOptions, verify
        from starkpack_winterfell_tpu.crypto.rescue_jive import RpJive64_256
        from starkpack_winterfell_tpu.models.do_work import (
            DoWorkAir,
            DoWorkProver,
            build_do_work_trace,
        )

        options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 31)
        traces = [build_do_work_trace(5, 32)]
        prover = DoWorkProver(options, RpJive64_256)
        pub_inputs = [prover.get_pub_inputs(t) for t in traces]
        proof = prover.prove(1, traces)
        assert verify(DoWorkAir, proof, pub_inputs, RpJive64_256)


class TestGriffin:
    def test_permutation_golden(self):
        from starkpack_winterfell_tpu.crypto.griffin import apply_permutation_ints

        got = apply_permutation_ints(list(range(8)))
        want = [
            5100889723013202324, 6905683344086677437, 8236358786066512460,
            1729367862961866374, 11501420603552582981, 15040992847148175954,
            10400407304634768298, 1197713229800045418,
        ]
        assert got == want

    def test_limbs_match_ints(self):
        from starkpack_winterfell_tpu.crypto.griffin import (
            apply_permutation_ints,
            apply_permutation_limbs,
        )

        rng2 = np.random.default_rng(60)
        state_ints = rng2.integers(0, gl.P, size=(8, 3), dtype=np.uint64)
        state_limbs = [gl.from_u64(state_ints[i]) for i in range(8)]
        out = apply_permutation_limbs(state_limbs, np)
        for b in range(3):
            want = apply_permutation_ints([int(state_ints[i][b]) for i in range(8)])
            got = [int(gl.to_u64(out[i])[b]) for i in range(8)]
            assert got == want

    def test_e2e_with_griffin_hasher(self):
        from starkpack_winterfell_tpu import FieldExtension, ProofOptions, verify
        from starkpack_winterfell_tpu.crypto.griffin import GriffinJive64_256
        from starkpack_winterfell_tpu.models.do_work import (
            DoWorkAir,
            DoWorkProver,
            build_do_work_trace,
        )

        options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 31)
        traces = [build_do_work_trace(9, 32)]
        prover = DoWorkProver(options, GriffinJive64_256)
        pub_inputs = [prover.get_pub_inputs(t) for t in traces]
        proof = prover.prove(1, traces)
        assert verify(DoWorkAir, proof, pub_inputs, GriffinJive64_256)


def test_rp62_permutation_golden():
    from starkpack_winterfell_tpu.crypto.rescue62 import apply_permutation_ints as perm62

    got = perm62(list(range(12)))
    want = [
        2176593392043442589, 3663362000910009411, 2446978550600442325,
        4214718471639678996, 4179776369445579812, 2274316532403536457,
        2336761070419368662, 3192888412646553651, 4092565229845701133,
        753437048204208885, 4067414342325289862, 3516613610105678931,
    ]
    assert got == want
