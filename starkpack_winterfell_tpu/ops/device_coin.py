"""Device-resident Fiat-Shamir steps for the FRI layer loop.

The prover's FRI commit phase is protocol-sequential: every layer reseeds
the random coin with the layer's Merkle root and draws the folding alpha
from it (prover/src/channel.rs commit + fri/src/prover/mod.rs:195-215).
Run on the host, that costs one device->host root pull plus one
host->device alpha push per layer — ~2 tunnel round trips x ~100 ms each
on the remote TPU, which dominates the whole FRI phase for mid-size
proofs.

This module mirrors the two transcript steps as replicated device ops:

    seed'  = H(seed_bytes || root_bytes)            (RandomCoin.reseed)
    alpha  = first deg*eb bytes of H(seed' || ctr)  (RandomCoin.draw,
             ctr = 1, 2, ... until every component is canonical)

so consecutive layers chain as asynchronous dispatches with NO host
involvement; the host pulls all roots once after the loop and replays the
same reseed/draw sequence to stay in sync (crypto/random_coin.py is the
semantic reference — values are bit-identical, including the rejection
rule: a digest whose any component is >= the modulus is consumed and
skipped).

Digest words are (8,) u32 arrays carrying the digest's little-endian
bytes (truncated hashers keep their trailing words zero), which is exactly
the limb-plane layout of a drawn canonical element — the alpha components
feed the fold kernels without any conversion.
"""

from __future__ import annotations

import numpy as np

_CACHE: dict = {}


#: byte-oriented hashers whose device words ARE little-endian digest bytes.
#: The field-native sponges (Rp64/Rp62/Griffin) hash *elements*, and their
#: merge_with_int folds the int in as a field element — a different layout
#: this byte-level kernel must not touch.
_BYTE_HASHERS = {"blake3_256", "blake3_192", "sha3_256"}


def supported(hasher, spec, ext_deg: int) -> bool:
    """The device coin needs a byte-oriented hasher's vectorized words API
    and draws that fit inside one digest (the host path's short-read quirk
    for deg*eb > DIGEST_BYTES is not mirrored)."""
    return (
        hasher.NAME in _BYTE_HASHERS
        and hasattr(hasher, "hash_words")
        and hasattr(hasher, "merge_words")
        and ext_deg * spec.ELEMENT_BYTES <= hasher.DIGEST_BYTES
        and spec.ELEMENT_BYTES % 4 == 0
    )


def reseed_draw_fn(hasher, spec, ext_deg: int):
    """Returns a jitted fn(seed_words (8,) u32, root_words (8,) u32) ->
    (new_seed_words (8,) u32, alpha) where alpha is a tuple of ext_deg
    component tuples of nl scalar u32 limb planes — the pytree shape
    scalar_to_limbs produces, so fold kernels accept it unchanged."""
    key = (hasher.NAME, spec.name, ext_deg)
    hit = _CACHE.get(key)
    if hit is not None:
        return hit

    import jax
    import jax.numpy as jnp
    from jax import lax

    D = hasher.DIGEST_BYTES
    dw = D // 4  # digest words carrying real bytes
    eb = spec.ELEMENT_BYTES
    nl = eb // 4
    deg = ext_deg
    # modulus little-endian u32 words for the canonical check
    p_words = [(spec.P >> (32 * i)) & 0xFFFFFFFF for i in range(nl)]

    def _canonical(dig):
        ok = jnp.bool_(True)
        for c in range(deg):
            w = [dig[c * nl + i] for i in range(nl)]
            # v < P, compared from the most significant limb down
            less = jnp.bool_(False)
            eq = jnp.bool_(True)
            for i in range(nl - 1, -1, -1):
                pi = jnp.uint32(p_words[i])
                less = less | (eq & (w[i] < pi))
                eq = eq & (w[i] == pi)
            ok = ok & less
        return ok

    def _merge_with_int(seed, counter):
        inp = jnp.concatenate(
            [
                seed[:dw],
                counter[None].astype(jnp.uint32),
                jnp.zeros(1, jnp.uint32),
            ]
        )
        return hasher.hash_words(inp[None], D + 8)[0]

    def fn(seed_words, root_words):
        new_seed = hasher.merge_words(seed_words[None], root_words[None])[0]

        def cond(st):
            _, dig = st
            return ~_canonical(dig)

        def body(st):
            ctr, _ = st
            nxt = ctr + jnp.uint32(1)
            return nxt, _merge_with_int(new_seed, nxt)

        one = jnp.uint32(1)
        _, dig = lax.while_loop(cond, body, (one, _merge_with_int(new_seed, one)))
        # shape (1,) limb planes — the scalar_to_limbs pytree the fold
        # kernels were traced with
        alpha = tuple(
            tuple(dig[c * nl + i][None] for i in range(nl))
            for c in range(deg)
        )
        return new_seed, alpha

    hit = _CACHE[key] = jax.jit(fn)
    return hit


def seed_to_words(hasher, seed_bytes: bytes):
    """Host seed bytes -> (8,) u32 device-format digest words."""
    return hasher.digest_from_bytes(seed_bytes)


def words_to_digest(hasher, words) -> bytes:
    return hasher.digest_to_bytes(np.asarray(words).astype(np.uint32))
