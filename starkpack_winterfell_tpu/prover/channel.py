"""Prover-side Fiat-Shamir channel — equivalent of prover/src/channel.rs.

The exact transcript order (SURVEY.md §3.1) is driven from here; every
draw/reseed mirrors the reference line-for-line:
  seed(ctx0 ++ all pub inputs) -> reseed(main root) -> [aux rands, reseed(aux
  root)]* -> n x constraint coeffs -> final_coeff -> reseed(constraint root)
  -> z -> per-trace reseed(H(ood states)) -> reseed(H(ood evals)) -> deep
  coeffs -> [reseed(layer root), alpha]* -> reseed_with_int(nonce) -> query
  positions.
"""

from __future__ import annotations

import numpy as np

from ..air.proof import Commitments, Context, OodFrame, StarkProof
from ..crypto.random_coin import RandomCoin
from ..ops import blake3 as b3


class ProverChannel:
    def __init__(self, n: int, airs, pub_inputs_elements_vec, hasher, ext_deg: int,
                 field=None):
        assert n == len(airs) == len(pub_inputs_elements_vec)
        self.airs = airs
        self.hasher = hasher
        self.ext_deg = ext_deg
        if field is None:
            from ..math.fieldspec import GL64_SPEC as field
        self.field = field
        self.contexts = [
            Context.new(air.trace_info(), air.options(), field) for air in airs
        ]
        seed_elements = list(self.contexts[0].to_elements())
        for pub_elements in pub_inputs_elements_vec:
            seed_elements.extend(pub_elements)
        self.public_coin = RandomCoin(hasher, seed_elements, field=field)
        self.commitments = Commitments()
        self.ood_frames = [OodFrame() for _ in range(n)]
        self.pow_nonce = 0

    # -- commitments ---------------------------------------------------------

    def commit_trace(self, trace_root: bytes):
        self.commitments.add(trace_root)
        self.public_coin.reseed(trace_root)

    def commit_constraints(self, constraint_root: bytes):
        self.commitments.add(constraint_root)
        self.public_coin.reseed(constraint_root)

    def commit_fri_layer(self, layer_root: bytes):
        self.commitments.add(layer_root)
        self.public_coin.reseed(layer_root)

    # -- ood frames ----------------------------------------------------------

    def send_ood_trace_states(self, trace_states_vec):
        """channel.rs:108-116 — reseed once per trace with the interleaved
        states."""
        for trace_states, ood_frame in zip(trace_states_vec, self.ood_frames):
            result = ood_frame.set_trace_states(trace_states, self.field)
            self.public_coin.reseed(
                self.hasher.hash_elements(result, self.field.ELEMENT_BYTES)
            )

    def send_ood_constraint_evaluations(self, evaluations):
        """channel.rs:120-125 — same evals into every frame, reseed once."""
        for ood_frame in self.ood_frames:
            ood_frame.set_constraint_evaluations(evaluations, self.field)
        self.public_coin.reseed(
            self.hasher.hash_elements(evaluations, self.field.ELEMENT_BYTES)
        )

    # -- draws ---------------------------------------------------------------

    def get_aux_trace_segment_rand_elements(self, aux_segment_idx: int):
        return self.airs[0].get_aux_trace_segment_random_elements(
            aux_segment_idx, self.public_coin, self.ext_deg
        )

    def get_constraint_composition_coeffs(self):
        return self.airs[0].get_constraint_composition_coefficients(
            self.public_coin, self.ext_deg
        )

    def get_final_polynomial_coeffs(self):
        return self.public_coin.draw(self.ext_deg)

    def get_ood_point(self):
        return self.public_coin.draw(self.ext_deg)

    def get_deep_composition_coeffs(self):
        return self.airs[0].get_deep_composition_coefficients(
            self.airs, self.public_coin, self.ext_deg
        )

    def draw_fri_alpha(self):
        return self.public_coin.draw(self.ext_deg)

    def get_query_positions(self):
        num_queries = self.contexts[0].options.num_queries
        lde_domain_size = self.contexts[0].lde_domain_size()
        return self.public_coin.draw_integers(num_queries, lde_domain_size)

    def grind_query_seed(self):
        """channel.rs:182-198 — serial semantics: the LOWEST valid nonce
        (deterministic), found with a vectorized batched search."""
        grinding_factor = self.contexts[0].options.grinding_factor
        nonce = self._find_nonce(grinding_factor)
        self.pow_nonce = nonce
        self.public_coin.reseed_with_int(nonce)

    def _find_nonce(self, grinding_factor: int) -> int:
        if grinding_factor == 0:
            return 1  # (1..).find(|_| trailing_zeros >= 0) == 1
        if not self.hasher.NAME.startswith("blake3"):
            # generic sequential search over the byte API (serial reference
            # semantics; lowest valid nonce)
            seed = self.public_coin.seed
            nonce = 1
            while True:
                head = int.from_bytes(
                    self.hasher.merge_with_int(seed, nonce)[:8], "little"
                )
                tz = 64 if head == 0 else (head & -head).bit_length() - 1
                if tz >= grinding_factor:
                    return nonce
                nonce += 1
        # the coin seed is exactly one digest (24 bytes for blake3_192,
        # 32 for blake3_256) — digest_from_bytes zero-pads the words
        seed_words = np.asarray(
            self.hasher.digest_from_bytes(self.public_coin.seed)
        ).reshape(1, 8)
        batch = 1 << 14
        start = 1
        while True:
            nonces = np.arange(start, start + batch, dtype=np.uint64)
            # vectorized merge_with_int over the nonce batch
            seeds = np.broadcast_to(seed_words, (batch, 8))
            digests = _merge_with_int_batch(self.hasher, seeds, nonces)
            heads = digests[:, 0].astype(np.uint64) | (
                digests[:, 1].astype(np.uint64) << np.uint64(32)
            )
            tz = _trailing_zeros_u64(heads)
            ok = np.nonzero(tz >= grinding_factor)[0]
            if ok.size:
                return int(nonces[ok[0]])
            start += batch

    # -- assembly ------------------------------------------------------------

    def build_proof(self, trace_queries, constraint_queries, fri_proof) -> StarkProof:
        return StarkProof(
            self.contexts,
            self.commitments,
            trace_queries,
            constraint_queries,
            self.ood_frames,
            fri_proof,
            self.pow_nonce,
        )


def _merge_with_int_batch(hasher, seed_words, nonces):
    """Vectorized hash(seed_digest_bytes || nonce_le) over a batch of
    nonces — one BLAKE3 compress per row for both the 32-byte and the
    truncated 24-byte (blake3_192) digests; other hashers take the per-row
    host path."""
    if hasher.NAME.startswith("blake3"):
        batch = seed_words.shape[0]
        z = np.zeros(batch, dtype=np.uint32)
        sw = hasher.DIGEST_BYTES // 4  # seed words actually hashed
        blk = [seed_words[:, i] for i in range(sw)]
        blk.append((nonces & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        blk.append((nonces >> np.uint64(32)).astype(np.uint32))
        blk += [z] * (16 - sw - 2)
        cv = [z + np.uint32(v) for v in b3.IV]
        out = b3.compress(cv, blk, 0, hasher.DIGEST_BYTES + 8,
                          b3.CHUNK_START | b3.CHUNK_END | b3.ROOT, np)
        return np.stack(out, axis=-1)
    # generic fallback
    out = np.zeros((seed_words.shape[0], 8), dtype=np.uint32)
    for i, nonce in enumerate(nonces):
        d = hasher.merge_with_int(
            hasher.digest_to_bytes(seed_words[i]), int(nonce)
        )
        out[i, : len(d) // 4] = np.frombuffer(d, dtype="<u4")
    return out


def _trailing_zeros_u64(v: np.ndarray) -> np.ndarray:
    out = np.full(v.shape, 64, dtype=np.int64)
    found = np.zeros(v.shape, dtype=bool)
    vv = v.copy()
    tz = np.zeros(v.shape, dtype=np.int64)
    for _ in range(64):
        bit = (vv & np.uint64(1)).astype(bool)
        newly = bit & ~found
        out[newly] = tz[newly]
        found |= bit
        vv >>= np.uint64(1)
        tz += 1
    return out
