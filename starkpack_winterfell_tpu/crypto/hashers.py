"""Hash function registry — equivalent of crypto/src/hash/mod.rs.

Each hasher exposes a host byte API (for the Fiat-Shamir channel and proof
(de)serialization) and a vectorized words API (for device-side row/Merkle
hashing).  Digests on the host are ``bytes``; on device they are (..., 8)
uint32 arrays (32-byte digests) — ``Blake3_192`` truncates only at the byte
boundary, mirroring ByteDigest<24> (crypto/src/hash/blake/mod.rs:70-116).
"""

from __future__ import annotations

import hashlib

import numpy as np

from ..ops import blake3 as b3
from ..utils.serde import ByteWriter


class Blake3_256:
    """crypto/src/hash/blake/mod.rs:18-60."""

    NAME = "blake3_256"
    DIGEST_BYTES = 32
    COLLISION_RESISTANCE = 128

    # -- host byte api ------------------------------------------------------

    @staticmethod
    def hash(data: bytes) -> bytes:
        return b3.hash_bytes(data)

    @staticmethod
    def merge(a: bytes, b: bytes) -> bytes:
        return b3.hash_bytes(a + b)

    @staticmethod
    def merge_with_int(seed: bytes, value: int) -> bytes:
        return b3.hash_bytes(seed + (value & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little"))

    @classmethod
    def hash_elements(cls, elements, elem_bytes: int = 8) -> bytes:
        """elements: iterable of ints (base) or tuples (ext components).
        Canonical little-endian bytes, matching hash_elements for
        non-canonical fields (blake/mod.rs:46-59).  ``elem_bytes`` selects
        the component width (8 for f64/f62, 16 for f128)."""
        w = ByteWriter()
        w.write_felts(elements, elem_bytes)
        return cls.hash(w.to_bytes())

    # -- batched host api (one vectorized call instead of k scalar calls) ----

    @staticmethod
    def merge_many(pairs):
        return b3.hash_bytes_many([a + b for a, b in pairs])

    @staticmethod
    def merge_with_int_many(seed: bytes, values):
        return b3.hash_bytes_many(
            [seed + (v & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little") for v in values]
        )

    @classmethod
    def hash_elements_many(cls, element_lists, elem_bytes: int = 8):
        """One batched call for k independent hash_elements inputs (the
        verifier's per-instance OOD-frame reseeds)."""
        bufs = []
        for elements in element_lists:
            w = ByteWriter()
            w.write_felts(elements, elem_bytes)
            bufs.append(w.to_bytes())
        return [
            d[: cls.DIGEST_BYTES] for d in b3.hash_bytes_many(bufs)
        ] if cls.DIGEST_BYTES != 32 else b3.hash_bytes_many(bufs)

    # -- device words api ---------------------------------------------------

    @staticmethod
    def hash_words(words, byte_len: int):
        return b3.hash_words(words, byte_len)

    @staticmethod
    def merge_words(l, r):
        return b3.merge(l, r)

    @staticmethod
    def digest_to_bytes(d) -> bytes:
        return b3.digest_to_bytes(d)

    @staticmethod
    def digest_from_bytes(b: bytes):
        return b3.digest_from_bytes(b)


class Blake3_192(Blake3_256):
    """24-byte truncated BLAKE3 (blake/mod.rs:66-116).

    Device digests remain 8 words; truncation to 24 bytes happens at every
    byte boundary (merge inputs, serialization), exactly like ByteDigest<24>.
    """

    NAME = "blake3_192"
    DIGEST_BYTES = 24

    @staticmethod
    def hash(data: bytes) -> bytes:
        return b3.hash_bytes(data)[:24]

    @staticmethod
    def merge(a: bytes, b: bytes) -> bytes:
        return b3.hash_bytes(a + b)[:24]

    @staticmethod
    def merge_with_int(seed: bytes, value: int) -> bytes:
        return b3.hash_bytes(seed + (value & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little"))[:24]

    @staticmethod
    def merge_many(pairs):
        return b3.hash_bytes_many([a + b for a, b in pairs], out_len=24)

    @staticmethod
    def merge_with_int_many(seed: bytes, values):
        return b3.hash_bytes_many(
            [seed + (v & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little") for v in values],
            out_len=24,
        )

    @staticmethod
    def hash_words(words, byte_len: int):
        d = b3.hash_words(words, byte_len)
        return _truncate_words(d, 24)

    @staticmethod
    def merge_words(l, r):
        # merge() hashes digests_as_bytes(values) = the 2x24 truncated bytes
        import numpy as _np

        xp = b3.gl._xp(l)
        cat = xp.concatenate([l[..., :6], r[..., :6]], axis=-1)
        pad = xp.zeros(cat.shape[:-1] + (4,), dtype=_np.uint32)
        full = xp.concatenate([cat, pad], axis=-1)
        d = b3.hash_words(full, 48)
        return _truncate_words(d, 24)

    @staticmethod
    def digest_to_bytes(d) -> bytes:
        return b3.digest_to_bytes(d)[:24]

    @staticmethod
    def digest_from_bytes(b: bytes):
        assert len(b) == 24
        return np.frombuffer(b + b"\x00" * 8, dtype="<u4").astype(np.uint32)


def _truncate_words(d, nbytes: int):
    """Zero out words beyond nbytes so device digests carry exactly the
    truncated bytes (word-aligned: 24 bytes = 6 words)."""
    xp = b3.gl._xp(d)
    assert nbytes % 4 == 0
    nw = nbytes // 4
    mask_shape = d.shape[:-1] + (8 - nw,)
    return xp.concatenate([d[..., :nw], xp.zeros(mask_shape, dtype=np.uint32)], axis=-1)


class Sha3_256:
    """crypto/src/hash/sha/mod.rs — host path via hashlib; device words path
    is the vectorized keccak-f[1600] lane-pair kernel (ops/keccak.py)."""

    NAME = "sha3_256"
    DIGEST_BYTES = 32
    COLLISION_RESISTANCE = 128

    @staticmethod
    def hash(data: bytes) -> bytes:
        return hashlib.sha3_256(data).digest()

    @staticmethod
    def merge(a: bytes, b: bytes) -> bytes:
        return hashlib.sha3_256(a + b).digest()

    @staticmethod
    def merge_with_int(seed: bytes, value: int) -> bytes:
        return hashlib.sha3_256(
            seed + (value & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little")
        ).digest()

    @staticmethod
    def merge_many(pairs):
        # hashlib is C-speed; a loop is already ~1 us per merge
        return [hashlib.sha3_256(a + b).digest() for a, b in pairs]

    @staticmethod
    def merge_with_int_many(seed: bytes, values):
        return [
            hashlib.sha3_256(
                seed + (v & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little")
            ).digest()
            for v in values
        ]

    @classmethod
    def hash_elements(cls, elements, elem_bytes: int = 8) -> bytes:
        w = ByteWriter()
        w.write_felts(elements, elem_bytes)
        return cls.hash(w.to_bytes())

    @classmethod
    def hash_elements_many(cls, element_lists, elem_bytes: int = 8):
        return [cls.hash_elements(e, elem_bytes) for e in element_lists]

    @staticmethod
    def hash_words(words, byte_len: int):
        from ..ops.keccak import sha3_256_words

        return sha3_256_words(words, byte_len)

    @staticmethod
    def merge_words(l, r):
        from ..ops.keccak import sha3_merge_words

        return sha3_merge_words(l, r)

    @staticmethod
    def digest_to_bytes(d) -> bytes:
        return b3.digest_to_bytes(d)

    @staticmethod
    def digest_from_bytes(b: bytes):
        return b3.digest_from_bytes(b)


HASHERS = {}
for _h in (Blake3_256, Blake3_192, Sha3_256):
    HASHERS[_h.NAME] = _h


def _register_field_hashers():
    from .griffin import GriffinJive64_256
    from .rescue import Rp64_256
    from .rescue62 import Rp62_248
    from .rescue_jive import RpJive64_256

    HASHERS[Rp64_256.NAME] = Rp64_256
    HASHERS[RpJive64_256.NAME] = RpJive64_256
    HASHERS[GriffinJive64_256.NAME] = GriffinJive64_256
    HASHERS[Rp62_248.NAME] = Rp62_248


_register_field_hashers()


def get_hasher(name: str):
    return HASHERS[name]
