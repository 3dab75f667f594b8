"""FRI prover — equivalent of fri/src/prover/mod.rs, vectorized.

The commit phase's per-layer work (transpose → row hash → Merkle → DRP fold)
is expressed as full-array limb operations: the reference's per-position
micro-interpolation loop (folding/mod.rs:85-117) becomes one batched
N-point inverse NTT + Horner evaluation at ``inv_offset_i * alpha`` across
all folded positions at once.
"""

from __future__ import annotations

import numpy as np

from ..crypto.merkle import MerkleTree, build_levels
from ..math import scalar as fs
from ..ops import gl64 as gl, ntt, vec
from ..utils.convert import limbs_to_elems, rows_to_words, scalar_to_limbs
from ..utils.transfer import pull_rows
from .proof import FriProof, FriProofLayer


class FriLayer:
    def __init__(self, tree: MerkleTree, transposed, m: int, n: int):
        self.tree = tree
        self.transposed = transposed  # tuple of pairs, shape (m, N)
        self.m = m
        self.N = n


class FriProver:
    def __init__(self, options, hasher, ext_deg: int):
        self.options = options
        self.hasher = hasher
        self.ext_deg = ext_deg
        self.layers = []
        self.remainder_poly = None

    def num_layers(self) -> int:
        return len(self.layers)

    def reset(self):
        self.layers = []
        self.remainder_poly = None

    def build_layers(self, channel, evaluations):
        """evaluations: tuple of `ext_deg` (lo, hi) pairs, shape (L,).
        fri/src/prover/mod.rs:172-226."""
        assert not self.layers, "prior proof generation has not been completed"
        n_layers = self.options.num_fri_layers(evaluations[0][0].shape[-1])
        for _ in range(n_layers):
            evaluations = self._build_layer(channel, evaluations)
        self._set_remainder(channel, evaluations)

    def _build_layer(self, channel, evaluations):
        N = self.options.folding_factor
        L = evaluations[0][0].shape[-1]
        m = L // N
        # transposed[i][j] = evals[i + j*m] -> reshape (N, m) then swap axes
        transposed = tuple(
            (c[0].reshape(N, m).T, c[1].reshape(N, m).T) for c in evaluations
        )
        words = rows_to_words(transposed, self.ext_deg)
        hashed = self.hasher.hash_words(words, N * self.ext_deg * 8)
        tree = MerkleTree(build_levels(np.asarray(hashed), self.hasher), self.hasher)
        channel.commit_fri_layer(tree.root())
        alpha = channel.draw_fri_alpha()
        folded = apply_drp(
            transposed, self.options.domain_offset(), alpha, self.ext_deg
        )
        self.layers.append(FriLayer(tree, transposed, m, N))
        return folded

    def _set_remainder(self, channel, evaluations):
        """Interpolate with the layer-domain offset, truncate to the true
        polynomial size, hash whole (prover/mod.rs:218-226)."""
        coeffs = ntt.interpolate_poly_with_offset(
            evaluations, self.options.domain_offset()
        )
        size = evaluations[0][0].shape[-1] // self.options.blowup_factor
        coeffs = tuple((c[0][:size], c[1][:size]) for c in coeffs)
        remainder_elements = limbs_to_elems(coeffs, self.ext_deg)
        commitment = self.hasher.hash_elements(remainder_elements)
        channel.commit_fri_layer(commitment)
        self.remainder_poly = remainder_elements

    def build_proof(self, positions) -> FriProof:
        """fri/src/prover/mod.rs:239-278."""
        assert self.remainder_poly is not None, "FRI layers have not been built yet"
        layers = []
        if self.layers:
            # per-layer positions fold deterministically from the drawn
            # query positions — compute them all upfront so every layer's
            # Merkle prefetch and row gather ride ONE dispatch + ONE
            # transfer each (per-layer pulls cost a ~100 ms tunnel round
            # trip per layer; the round-4 agg64 profile had the query
            # phase at 484 ms, mostly these)
            from ..crypto.merkle import MerkleTree
            from ..utils.transfer import pull_rows_many

            positions = list(positions)
            domain_size = self.layers[0].m * self.layers[0].N
            N = self.options.folding_factor
            layer_pos = []
            for _ in self.layers:
                positions = fold_positions(positions, domain_size, N)
                layer_pos.append(positions)
                domain_size //= N
            MerkleTree.prefetch_trees(
                [(layer.tree, pos)
                 for layer, pos in zip(self.layers, layer_pos)]
            )
            gathered_all = pull_rows_many(
                [(layer.transposed, pos, 0)
                 for layer, pos in zip(self.layers, layer_pos)]
            )
            for layer, positions, gathered in zip(
                self.layers, layer_pos, gathered_all
            ):
                proof = layer.tree.prove_batch(positions)
                rows = []
                for i in range(len(positions)):
                    row_limbs = tuple(
                        (c[0][i], c[1][i]) for c in gathered
                    )
                    rows.append(limbs_to_elems(row_limbs, self.ext_deg))
                layers.append(FriProofLayer.new(rows, proof, self.ext_deg))
        remainder = self.remainder_poly
        self.reset()
        return FriProof.new(layers, remainder, 1)


def apply_drp(transposed, domain_offset: int, alpha, ext_deg: int):
    """Degree-respecting projection (fri/src/folding/mod.rs:85-117).

    transposed: tuple of pairs shaped (m, N) — row i holds f at the N source
    positions folding to position i.  Row i's micro-coset has offset
    c * w^i (w = root of the source domain); interpolation + evaluation at
    alpha collapses to Horner at (c * w^i)^{-1} * alpha over the row's iNTT.
    """
    xp = gl._xp(transposed[0][0])
    alpha_l = scalar_to_limbs(alpha, ext_deg)
    alpha_l = tuple((xp.asarray(a[0]), xp.asarray(a[1])) for a in alpha_l)
    return apply_drp_limbs(transposed, domain_offset, alpha_l, ext_deg)


def drp_inv_offsets(m: int, N: int, domain_offset: int, xp=np):
    """(c * w^i)^{-1} for i in 0..m — the per-row evaluation-point scale of
    the DRP (w = root of the m*N source domain).  Exposed so the sharded
    mesh FRI can precompute and shard the table by row blocks."""
    src_size = m * N
    g = fs.get_root_of_unity(src_size.bit_length() - 1)
    inv_g = pow(g, fs.P - 2, fs.P)
    inv_c = pow(domain_offset, fs.P - 2, fs.P)
    inv_offs = ntt.power_series(inv_g, m, xp)
    inv_c_pair = gl.from_int(inv_c, (1,))
    inv_c_pair = (xp.asarray(inv_c_pair[0]), xp.asarray(inv_c_pair[1]))
    return gl.mul(inv_offs, inv_c_pair)  # (m,)


def apply_drp_limbs(transposed, domain_offset: int, alpha_l, ext_deg: int,
                    inv_offs=None):
    """Core DRP with alpha already in limb form (jit-friendly: alpha may be a
    traced value).  inv_offs: optional precomputed drp_inv_offsets slice
    matching transposed's rows (sharded callers pass their local block)."""
    m, N = transposed[0][0].shape
    xp = gl._xp(transposed[0][0])
    coeffs = ntt.interpolate_poly(transposed)  # per-row iNTT incl. 1/N scale
    if inv_offs is None:
        inv_offs = drp_inv_offsets(m, N, domain_offset, xp)
    # x_i = inv_offs[i] * alpha  (ext scalar)
    x = vec.vmul(vec.vbroadcast(alpha_l, (m,)), (inv_offs,))
    return vec.horner(coeffs, x, axis=-1)


class LimbFriProver:
    """FRI prover over a generic limb field (f62/f128), base or quadratic
    extension evaluations — the multi-field counterpart of FriProver (which
    is specialized to the Goldilocks limb ops).  All arithmetic runs through
    the FieldBackend; evaluations are element tuples (``ext_deg`` components,
    each a tuple of limb arrays shaped (L,))."""

    def __init__(self, options, hasher, limb_field, spec, ext_deg: int = 1):
        from ..ops.backend import get_backend

        self.options = options
        self.hasher = hasher
        self.F = limb_field
        self.spec = spec
        self.B = get_backend(spec.name)
        self.ext_deg = ext_deg
        self.layers = []
        self.remainder_poly = None

    def build_layers(self, channel, evaluations):
        """evaluations: element tuple, components shaped (L,)."""
        assert not self.layers
        n_layers = self.options.num_fri_layers(evaluations[0][0].shape[-1])
        for _ in range(n_layers):
            evaluations = self._build_layer(channel, evaluations)
        self._set_remainder(channel, evaluations)

    def _build_layer(self, channel, evaluations):
        import numpy as _np

        from ..crypto.merkle import MerkleTree, build_levels

        B, spec = self.B, self.spec
        N = self.options.folding_factor
        L = evaluations[0][0].shape[-1]
        m = L // N
        # transposed[i][j] = evals[i + j*m]: components reshaped (N, m).T
        transposed = tuple(
            B.cmap(lambda l: l.reshape(N, m).T, c) for c in evaluations
        )
        words = B.rows_to_words(transposed, self.ext_deg)
        leaves = self.hasher.hash_words(words, N * self.ext_deg * spec.ELEMENT_BYTES)
        tree = MerkleTree(build_levels(_np.asarray(leaves), self.hasher), self.hasher)
        channel.commit_fri_layer(tree.root())
        alpha = channel.draw_fri_alpha()
        folded = self._apply_drp(transposed, alpha)
        self.layers.append((transposed, tree, m, N))
        return folded

    def _apply_drp(self, transposed, alpha):
        """Degree-respecting projection (fri/src/folding/mod.rs:85-117) via
        batched per-row iNTT + Horner at inv_offset_i * alpha."""
        B = self.B
        m, N = transposed[0][0].shape
        inv_offs = limb_drp_inv_offsets(B, m, N, self.spec.GENERATOR)
        alpha_l = B.scalar_to_limbs(alpha, self.ext_deg)
        return limb_apply_drp(B, transposed, alpha_l, inv_offs, self.ext_deg)

    def _set_remainder(self, channel, evaluations):
        B, spec = self.B, self.spec
        coeffs = B.interpolate_poly_with_offset(evaluations, spec.GENERATOR)
        size = evaluations[0][0].shape[-1] // self.options.blowup_factor
        remainder = B.limbs_to_elems(
            tuple(B.cmap(lambda l: l[:size], c) for c in coeffs), self.ext_deg
        )
        channel.commit_fri_layer(
            self.hasher.hash_elements(remainder, spec.ELEMENT_BYTES)
        )
        self.remainder_poly = remainder

    def build_proof(self, positions):
        from .proof import FriProof, FriProofLayer

        assert self.remainder_poly is not None
        B, spec = self.B, self.spec
        proof_layers = []
        pos = list(positions)
        if self.layers:
            # all layers' prefetches/gathers in one dispatch each — see
            # FriProver.build_proof
            from ..crypto.merkle import MerkleTree
            from ..utils.transfer import pull_rows_many

            domain_size = self.layers[0][2] * self.layers[0][3]
            N = self.options.folding_factor
            layer_pos = []
            for _ in self.layers:
                pos = fold_positions(pos, domain_size, N)
                layer_pos.append(pos)
                domain_size //= N
            MerkleTree.prefetch_trees(
                [(t[1], p) for t, p in zip(self.layers, layer_pos)]
            )
            gathered_all = pull_rows_many(
                [(t[0], p, 0) for t, p in zip(self.layers, layer_pos)]
            )
            for (transposed, tree, m, _), pos, gathered in zip(
                self.layers, layer_pos, gathered_all
            ):
                mp = tree.prove_batch(pos)
                rows = []
                for i in range(len(pos)):
                    row = tuple(B.cmap(lambda l: l[i], c) for c in gathered)
                    rows.append(B.limbs_to_elems(row, self.ext_deg))
                proof_layers.append(
                    FriProofLayer.new(rows, mp, self.ext_deg, spec)
                )
        remainder = self.remainder_poly
        self.layers = []
        self.remainder_poly = None
        return FriProof.new(proof_layers, remainder, 1, spec)


def limb_drp_inv_offsets(B, m: int, N: int, domain_offset: int):
    """inv_offsets[i] = inv(offset) * inv(g_src)^i for a limb-field DRP at
    source size m*N — one limb tuple shaped (m,), host numpy (built by
    log-doubling, not a python-pow loop)."""
    spec = B.spec
    src_size = m * N
    g = spec.get_root_of_unity(src_size.bit_length() - 1)
    inv_g = pow(g, spec.P - 2, spec.P)
    inv_c = pow(domain_offset, spec.P - 2, spec.P)
    series = B.power_series(inv_g, m)
    inv_c_l = B.b_from_ints([inv_c])
    return B.bmul(series, inv_c_l)


def limb_apply_drp(B, transposed, alpha_l, inv_offs, ext_deg: int):
    """Jit-capable limb-field DRP: transposed components shaped (m, N),
    alpha_l an ext element in limb form, inv_offs a limb tuple (m,)."""
    coeffs = B.interpolate_poly(transposed)
    m = transposed[0][0].shape[0]
    x = B.vmul(B.vbroadcast(alpha_l, (m,)), (inv_offs,))
    return B.horner(coeffs, x, axis=-1)


def fold_positions(positions, source_domain_size: int, folding_factor: int):
    """fri/src/folding/mod.rs:158-175 — mod + dedup preserving order."""
    target = source_domain_size // folding_factor
    result = []
    for p in positions:
        p = p % target
        if p not in result:
            result.append(p)
    return result
