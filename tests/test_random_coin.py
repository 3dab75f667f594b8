"""RandomCoin semantics — the quirks SURVEY.md §2.3 flags as must-replicate
(crypto/src/random/default.rs)."""

from starkpack_winterfell_tpu.crypto.hashers import Blake3_256
from starkpack_winterfell_tpu.crypto.random_coin import RandomCoin, _trailing_zeros


def test_draw_deterministic_and_seed_sensitive():
    c1 = RandomCoin(Blake3_256, [1, 2, 3, 4])
    c2 = RandomCoin(Blake3_256, [1, 2, 3, 4])
    assert c1.draw() == c2.draw()
    assert c1.draw() != c1.draw()  # counter advances
    c3 = RandomCoin(Blake3_256, [2, 3, 4, 5])
    assert RandomCoin(Blake3_256, [1, 2, 3, 4]).draw() != c3.draw()


def test_reseed_resets_counter():
    c1 = RandomCoin(Blake3_256, [7])
    c2 = RandomCoin(Blake3_256, [7])
    _ = c1.draw()
    _ = c1.draw()
    data = Blake3_256.hash(b"data")
    c1.reseed(data)
    c2.reseed(data)  # c2 never drew — counters must both be reset
    assert c1.draw() == c2.draw()


def test_leading_zeros_is_trailing_zeros_of_le_head():
    """default.rs:173-186 — the PoW check counts TRAILING zeros of the first
    8 seed bytes read little-endian."""
    coin = RandomCoin(Blake3_256, [1, 2, 3, 4])
    head = int.from_bytes(coin.seed[:8], "little")
    assert coin.leading_zeros() == _trailing_zeros(head)
    # check_leading_zeros(v) == leading_zeros() after reseed_with_int(v)
    v = 12345
    expected = coin.check_leading_zeros(v)
    coin.reseed_with_int(v)
    assert coin.leading_zeros() == expected


def test_draw_integers_unique_and_masked():
    coin = RandomCoin(Blake3_256, [9])
    vals = coin.draw_integers(20, 64)
    assert len(vals) == 20
    assert len(set(vals)) == 20
    assert all(0 <= v < 64 for v in vals)


def test_draw_extension_degrees():
    coin = RandomCoin(Blake3_256, [5])
    e2 = coin.draw(2)
    assert isinstance(e2, tuple) and len(e2) == 2
    e3 = coin.draw(3)
    assert isinstance(e3, tuple) and len(e3) == 3


def test_grinding_nonce_deterministic_lowest():
    """The batched grinding search must return the LOWEST valid nonce
    (serial reference semantics, channel.rs:182-198)."""
    from starkpack_winterfell_tpu.air.proof import Context
    from starkpack_winterfell_tpu.air.options import ProofOptions, FieldExtension
    from starkpack_winterfell_tpu.air.trace_info import TraceInfo
    from starkpack_winterfell_tpu.prover.channel import ProverChannel

    class _Air:
        def __init__(self):
            from starkpack_winterfell_tpu.models.do_work import DoWorkAir, PublicInputs

            self._a = DoWorkAir(
                TraceInfo(10, 64), PublicInputs(1, 2),
                ProofOptions(16, 8, 6, FieldExtension.NONE, 4, 31),
            )

        def __getattr__(self, k):
            return getattr(self._a, k)

    air = _Air()
    ch = ProverChannel(1, [air], [[1, 2]], Blake3_256, 1)
    ch.grind_query_seed()
    nonce = ch.pow_nonce
    # brute-force host check: no smaller nonce satisfies the bound
    probe = ProverChannel(1, [air], [[1, 2]], Blake3_256, 1)
    for v in range(1, nonce):
        assert probe.public_coin.check_leading_zeros(v) < 6
    assert probe.public_coin.check_leading_zeros(nonce) >= 6


def test_grinding_vectorized_matches_serial_per_hasher():
    """The vectorized blake3 grinding path must return the same nonce as
    the serial byte-API semantics for BOTH digest widths — blake3_192's
    24-byte seed hit an assert in round 4 (channel.py _find_nonce padded
    every seed to 32 bytes)."""
    from types import SimpleNamespace

    from starkpack_winterfell_tpu.crypto.hashers import get_hasher
    from starkpack_winterfell_tpu.prover.channel import ProverChannel

    for name in ("blake3_256", "blake3_192"):
        hasher = get_hasher(name)
        seed = hasher.hash(b"pow-seed-" + name.encode())
        serial = 1
        while True:
            head = int.from_bytes(
                hasher.merge_with_int(seed, serial)[:8], "little"
            )
            tz = 64 if head == 0 else (head & -head).bit_length() - 1
            if tz >= 8:
                break
            serial += 1
        ch = ProverChannel.__new__(ProverChannel)
        ch.hasher = hasher
        ch.public_coin = SimpleNamespace(seed=seed)
        assert ch._find_nonce(8) == serial, name


def test_blake3_192_grinding_end_to_end():
    """f128 + blake3_192 + nonzero grinding factor — the exact round-4
    failing configuration — proves and verifies."""
    from starkpack_winterfell_tpu.air.options import (
        FieldExtension,
        ProofOptions,
    )
    from starkpack_winterfell_tpu.crypto.hashers import get_hasher
    from starkpack_winterfell_tpu.models.fib_multifield import get_fib_family
    from starkpack_winterfell_tpu.verifier.verifier import verify

    air_cls, build_trace, prover_cls, _ = get_fib_family("f128")
    options = ProofOptions(16, 8, 8, FieldExtension.NONE, 4, 3)
    hasher = get_hasher("blake3_192")
    prover = prover_cls(options, hasher)
    traces = [build_trace(16)]
    proof = prover.prove(1, traces)
    assert verify(air_cls, proof,
                  [prover.get_pub_inputs(t) for t in traces], hasher)
