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
