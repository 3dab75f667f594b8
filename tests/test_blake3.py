"""BLAKE3 vs official test vectors + host/device differential tests."""

import numpy as np

from starkpack_winterfell_tpu.ops import blake3 as b3

# official BLAKE3 test vectors (input byte i = i % 251)
VECTORS = {
    0: "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262",
    1: "2d3adedff11b61f14c886e35afa036736dcd87a74d27b5c1510225d0f592e213",
    1024: "42214739f095a406f3fc83deb889744ac00df831c10daa55189b5d121c855af7",
    1025: "d00278ae47eb27b34faecf67b4fe263f82d5412916c1ffd97c8cb7fb814b8444",
    3072: "b98cb0ff3623be03326b373de6b9095218513e64f1ee2edd2525c7ad1e5cffd2",
}


def test_official_vectors():
    for n, want in VECTORS.items():
        data = bytes(i % 251 for i in range(n))
        assert b3.hash_bytes(data).hex() == want, n


def test_rows_match_host():
    rng = np.random.default_rng(3)
    for nwords in [2, 16, 20, 48, 256, 260]:  # includes >1024-byte rows
        rows = rng.integers(0, 1 << 32, size=(3, nwords), dtype=np.uint32)
        byte_len = nwords * 4
        dev = b3.hash_words(rows, byte_len)
        for r in range(3):
            data = b"".join(int(w).to_bytes(4, "little") for w in rows[r])
            assert b3.hash_bytes(data) == b3.digest_to_bytes(dev[r])


def test_partial_byte_len():
    # 40-byte input (merge_with_int shape) on the words path
    rng = np.random.default_rng(4)
    rows = rng.integers(0, 1 << 32, size=(2, 16), dtype=np.uint32)
    rows[:, 10:] = 0  # caller contract: zero beyond byte_len
    dev = b3.hash_words(rows, 40)
    for r in range(2):
        data = b"".join(int(w).to_bytes(4, "little") for w in rows[r][:10])
        assert b3.hash_bytes(data) == b3.digest_to_bytes(dev[r])


def test_merge_and_merge_with_int():
    rng = np.random.default_rng(5)
    d = rng.integers(0, 1 << 32, size=(2, 8), dtype=np.uint32)
    m = b3.merge(d[0:1], d[1:2])
    want = b3.hash_bytes(b3.digest_to_bytes(d[0]) + b3.digest_to_bytes(d[1]))
    assert b3.digest_to_bytes(m[0]) == want
    mi = b3.merge_with_int(d[0:1], 0xDEADBEEF12345678)
    want = b3.hash_bytes(
        b3.digest_to_bytes(d[0]) + (0xDEADBEEF12345678).to_bytes(8, "little")
    )
    assert b3.digest_to_bytes(mi[0]) == want


def test_jax_matches_numpy():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(6)
    rows = rng.integers(0, 1 << 32, size=(4, 20), dtype=np.uint32)
    f = jax.jit(lambda w: b3.hash_words(w, 80))
    got = np.asarray(f(jnp.asarray(rows)))
    want = b3.hash_words(rows, 80)
    assert np.array_equal(got, want)

    g = jax.jit(b3.merge)
    d = b3.hash_words(rows, 80)
    got = np.asarray(g(jnp.asarray(d[0:2]), jnp.asarray(d[2:4])))
    want = b3.merge(d[0:2], d[2:4])
    assert np.array_equal(got, want)
