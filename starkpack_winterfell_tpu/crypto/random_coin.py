"""Fiat-Shamir random coin — exact port of the *semantics* of
crypto/src/random/default.rs (DefaultRandomCoin).

This is the strictly-sequential heart of the transcript; it lives on the
host.  Every quirk is preserved:

* ``leading_zeros``/``check_leading_zeros`` actually count *trailing* zeros
  of the first 8 seed bytes read little-endian (default.rs:173-186) — the
  proof-of-work check depends on this.
* ``draw`` rejection-samples: hash(seed || ++counter), take the first
  ELEMENT_BYTES, accept iff every 8-byte base component is < modulus
  (default.rs:196-210 + f64/mod.rs TryFrom).
* ``draw_integers`` masks the first 8 LE bytes and skips duplicates
  (default.rs:245-290).
"""

from __future__ import annotations

P = 0xFFFFFFFF00000001


class RandomCoin:
    def __init__(self, hasher, seed_elements, field=None):
        """seed_elements: list of ints/tuples — hashed via hash_elements
        (default.rs:85-88).  ``field``: a FieldSpec (defaults to f64) that
        sets the per-component byte width and modulus for draws."""
        self.h = hasher
        if field is None:
            from ..math.fieldspec import GL64_SPEC as field
        self.field = field
        self.seed = hasher.hash_elements(seed_elements, field.ELEMENT_BYTES)
        self.counter = 0
        self._cache = []
        self._cache_start = 0

    @classmethod
    def from_digest(cls, hasher, seed_digest: bytes, field=None):
        coin = cls.__new__(cls)
        coin.h = hasher
        if field is None:
            from ..math.fieldspec import GL64_SPEC as field
        coin.field = field
        coin.seed = seed_digest
        coin.counter = 0
        coin._cache = []
        coin._cache_start = 0
        return coin

    def _next(self) -> bytes:
        """H(seed || ++counter).  Values are precomputed in vectorized blocks
        when the hasher supports batching — one numpy hash call covers a
        whole run of draws between reseeds (bit-identical values; draws from
        a fixed seed differ only in the counter)."""
        self.counter += 1
        idx = self.counter - self._cache_start
        if 0 <= idx < len(self._cache):
            return self._cache[idx]
        batched = getattr(self.h, "merge_with_int_many", None)
        if batched is None:
            return self.h.merge_with_int(self.seed, self.counter)
        block = min(max(16, 2 * len(self._cache)), 512)
        self._cache = batched(self.seed, range(self.counter, self.counter + block))
        self._cache_start = self.counter
        return self._cache[0]

    def reseed(self, data: bytes):
        self.seed = self.h.merge(self.seed, data)
        self.counter = 0
        self._cache = []

    def reseed_with_int(self, value: int):
        self.seed = self.h.merge_with_int(self.seed, value)
        self.counter = 0
        self._cache = []

    def leading_zeros(self) -> int:
        head = int.from_bytes(self.seed[:8], "little")
        return _trailing_zeros(head)

    def check_leading_zeros(self, value: int) -> int:
        new_seed = self.h.merge_with_int(self.seed, value)
        head = int.from_bytes(new_seed[:8], "little")
        return _trailing_zeros(head)

    def draw(self, deg: int = 1):
        """Draw a field element: int for deg 1, tuple for deg 2/3.  Takes the
        first deg * ELEMENT_BYTES of each PRNG value, rejecting non-canonical
        components (default.rs:196-210 + TryFrom per field)."""
        eb = self.field.ELEMENT_BYTES
        modulus = self.field.P
        for _ in range(1000):
            value = self._next()
            comps = []
            ok = True
            for i in range(deg):
                v = int.from_bytes(value[i * eb : (i + 1) * eb], "little")
                if v >= modulus:
                    ok = False
                    break
                comps.append(v)
            if ok:
                return comps[0] if deg == 1 else tuple(comps)
        raise RuntimeError("failed to draw a valid field element after 1000 tries")

    def draw_integers(self, num_values: int, domain_size: int):
        assert domain_size & (domain_size - 1) == 0, "domain size must be a power of two"
        assert num_values < domain_size
        v_mask = domain_size - 1
        values = []
        for _ in range(1000):
            value = int.from_bytes(self._next()[:8], "little") & v_mask
            if value in values:
                continue
            values.append(value)
            if len(values) == num_values:
                break
        if len(values) < num_values:
            raise RuntimeError("failed to draw enough unique query positions")
        return values


def _trailing_zeros(v: int) -> int:
    if v == 0:
        return 64
    return (v & -v).bit_length() - 1
