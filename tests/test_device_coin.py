"""Device Fiat-Shamir coin (ops/device_coin.py) vs the host RandomCoin —
bit-identical reseed+draw across hashers and fields (the FRI layer loop's
transcript step, crypto/src/random/default.rs:116-119,196-210 semantics)."""

import numpy as np
import pytest

from starkpack_winterfell_tpu.crypto.hashers import get_hasher
from starkpack_winterfell_tpu.crypto.random_coin import RandomCoin
from starkpack_winterfell_tpu.math.fieldspec import (
    F62_SPEC, F128_SPEC, GL64_SPEC)
from starkpack_winterfell_tpu.ops import device_coin

CASES = [
    ("blake3_256", GL64_SPEC, 1),
    ("blake3_256", GL64_SPEC, 2),
    ("blake3_256", GL64_SPEC, 3),
    ("blake3_192", GL64_SPEC, 1),
    ("blake3_192", F128_SPEC, 1),
    ("sha3_256", F128_SPEC, 1),
    ("sha3_256", F62_SPEC, 2),
    ("blake3_256", F62_SPEC, 1),
]


@pytest.mark.parametrize("hname,spec,deg", CASES)
def test_reseed_draw_matches_host(hname, spec, deg):
    hasher = get_hasher(hname)
    if not device_coin.supported(hasher, spec, deg):
        pytest.skip("digest too small for this (field, deg)")
    rng = np.random.default_rng(hash((hname, spec.name, deg)) & 0xFFFF)
    fn = device_coin.reseed_draw_fn(hasher, spec, deg)
    for trial in range(4):
        seed = bytes(rng.integers(0, 256, hasher.DIGEST_BYTES, dtype=np.uint8))
        root = bytes(rng.integers(0, 256, hasher.DIGEST_BYTES, dtype=np.uint8))
        # host: reseed + draw
        coin = RandomCoin.from_digest(hasher, seed, field=spec)
        coin.reseed(root)
        want_seed = coin.seed
        want_alpha = coin.draw(deg)
        # device
        sw = device_coin.seed_to_words(hasher, seed)
        rw = device_coin.seed_to_words(hasher, root)
        new_seed, alpha = fn(sw, rw)
        assert device_coin.words_to_digest(hasher, new_seed) == want_seed
        nl = spec.ELEMENT_BYTES // 4
        got = []
        for c in range(deg):
            v = 0
            for i in range(nl):
                v |= int(np.asarray(alpha[c][i])[0]) << (32 * i)
            got.append(v)
        got = got[0] if deg == 1 else tuple(got)
        assert got == want_alpha, (hname, spec.name, deg, trial)


class _Fake63:
    """Synthetic 8-byte field with P ~ 2^63: every second draw candidate is
    rejected, so the device while_loop's consume-and-retry semantics get
    exercised for real (the production fields reject at ~2^-32/2^-82)."""

    name = "fake63"
    ELEMENT_BYTES = 8
    P = (1 << 63) + 29


def test_rejection_path_matches_host():
    hasher = get_hasher("blake3_256")
    spec = _Fake63()
    fn = device_coin.reseed_draw_fn(hasher, spec, 1)
    rng = np.random.default_rng(7)
    rejected_seen = 0
    for _ in range(64):
        seed = bytes(rng.integers(0, 256, 32, dtype=np.uint8))
        root = bytes(rng.integers(0, 256, 32, dtype=np.uint8))
        coin = RandomCoin.from_digest(hasher, seed, field=spec)
        coin.reseed(root)
        first_rejected = (
            int.from_bytes(coin.h.merge_with_int(coin.seed, 1)[:8], "little")
            >= spec.P
        )
        rejected_seen += first_rejected
        want = coin.draw(1)
        sw = device_coin.seed_to_words(hasher, seed)
        rw = device_coin.seed_to_words(hasher, root)
        _, alpha = fn(sw, rw)
        got = int(np.asarray(alpha[0][0])[0]) | (
            int(np.asarray(alpha[0][1])[0]) << 32
        )
        assert got == want
    assert rejected_seen >= 10  # the loop really exercised rejections
