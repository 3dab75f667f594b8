"""Vectors and identities mirrored from the reference's embedded unit tests
(VERDICT r3 item 9 — keep shrinking the self-oracle risk surface).

Sources (constants copied verbatim — they ARE the shared protocol fixtures):
  /root/reference/math/src/polynom/tests.rs    (f128 eval/mul/div/syn_div)
  /root/reference/math/src/fft/tests.rs        (NTT == naive eval_many)
  /root/reference/crypto/src/merkle/tests.rs   (Blake3_256 tree/prove_batch)
"""

import hashlib

import pytest

from starkpack_winterfell_tpu.crypto.hashers import Blake3_256
from starkpack_winterfell_tpu.crypto.merkle import (
    BatchMerkleProof,
    MerkleTree,
    build_levels,
)
from starkpack_winterfell_tpu.math import polynom
from starkpack_winterfell_tpu.math.fieldspec import F128_SPEC
from starkpack_winterfell_tpu.ops.backend import get_backend

FS = F128_SPEC
P = FS.P

# math/src/polynom/tests.rs:14-45 constants
X = 11269864713250585702
POLY4 = [
    384863712573444386,
    7682273369345308472,
    13294661765012277990,
    16234810094004944758,
]
POLY2 = [9918505539874556741, 16401861429499852246, 12181445947541805654]


def test_polynom_eval_reference_constants():
    """polynom/tests.rs:14-45 — Horner evaluation at the pinned point."""
    assert polynom.eval_at([], X, FS) == 0
    assert polynom.eval_at(POLY4[:1], X, FS) == POLY4[0]
    assert polynom.eval_at(POLY4[:2], X, FS) == (
        POLY4[0] + POLY4[1] * X
    ) % P
    x2 = pow(X, 2, P)
    x3 = pow(X, 3, P)
    assert polynom.eval_at(POLY4[:3], X, FS) == (
        POLY4[0] + POLY4[1] * X + POLY4[2] * x2
    ) % P
    assert polynom.eval_at(POLY4, X, FS) == (
        POLY4[0] + POLY4[1] * X + POLY4[2] * x2 + POLY4[3] * x3
    ) % P


def test_polynom_mul_reference_constants():
    """polynom/tests.rs:107-146 — schoolbook products of the pinned polys."""
    p1, p2 = POLY4[:3], POLY2
    pr = [
        p1[0] * p2[0],
        p1[0] * p2[1] + p2[0] * p1[1],
        p1[1] * p2[1] + p1[2] * p2[0] + p2[2] * p1[0],
        p1[2] * p2[1] + p2[2] * p1[1],
        p1[2] * p2[2],
    ]
    assert polynom.mul(p1, p2, FS) == [v % P for v in pr]
    pr = [
        p1[0] * p2[0],
        p1[0] * p2[1] + p2[0] * p1[1],
        p1[0] * p2[2] + p2[1] * p1[1],
        p1[1] * p2[2],
    ]
    assert polynom.mul(p1[:2], p2, FS) == [v % P for v in pr]


def _strip(p):
    while len(p) > 1 and p[-1] == 0:
        p = p[:-1]
    return p


def test_polynom_div_reference_constants():
    """polynom/tests.rs:149-175 — long division inverts mul."""
    p1, p2 = POLY4[:3], POLY2
    p3 = polynom.mul(p1, p2, FS)
    assert polynom.div(p3, p2, FS) == p1
    p3 = polynom.mul(p1[:2], p2, FS)
    assert polynom.div(p3, p2, FS) == p1[:2]
    scaled = [v * X % P for v in p1]
    assert polynom.div(scaled, p1, FS) == [X]


def test_polynom_syn_div_reference_cases():
    """polynom/tests.rs:178-257 — synthetic division cases."""
    # (x + 2)(x + 3) / (x + 3) = (x + 2)
    poly = polynom.mul([2, 1], [3, 1], FS)
    assert _strip(polynom.syn_div(poly, 1, (-3) % P, FS)) == [2, 1]
    # (x^3 - 12x^2 - 42) / (x - 3) -> x^2 - 9x - 27 (remainder dropped)
    poly = [(-42) % P, 0, (-12) % P, 1]
    assert _strip(polynom.syn_div(poly, 1, 3, FS)) == [
        (-27) % P, (-9) % P, 1
    ]
    # high-degree: p / (x^4 - 1) * (x^4 - 1) == p when p vanishes on the
    # order-4 subgroup positions
    B = get_backend("f128")
    root = B.get_root_of_unity(4)
    domain = [pow(root, i, P) for i in range(16)]
    ys = [0, 1, 2, 3, 0, 5, 6, 7, 0, 9, 10, 11, 0, 13, 14, 15]
    poly = polynom.interpolate(domain, ys, FS)
    q = polynom.syn_div(poly, 4, 1, FS)
    z_poly = [(-1) % P, 0, 0, 0, 1]
    assert _strip(polynom.mul(q, z_poly, FS)) == _strip(poly)
    # non-unary constant: divisor (x^4 - g^4)
    ys = [18, 0, 2, 3, 4, 0, 6, 7, 8, 0, 10, 11, 12, 0, 14, 15]
    poly = polynom.interpolate(domain, ys, FS)
    g4 = pow(root, 4, P)
    q = polynom.syn_div(poly, 4, g4, FS)
    z_poly = [(-g4) % P, 0, 0, 0, 1]
    assert _strip(polynom.mul(q, z_poly, FS)) == _strip(poly)


def test_fft_matches_naive_eval():
    """fft/tests.rs:19-58 — the NTT equals naive evaluation over the
    subgroup domain, at every size the reference pins (f128)."""
    import random

    B = get_backend("f128")
    rng = random.Random(1234)
    for n in (4, 8, 16, 1024):
        p = [rng.randrange(P) for _ in range(n)]
        root = B.get_root_of_unity(n.bit_length() - 1)
        limbs = B.elems_to_limbs(p, 1)
        evals = B.limbs_to_elems(B.evaluate_poly_with_offset(limbs, 1, 1), 1)
        # naive check at a handful of positions (full n^2 at 1024 is slow)
        idxs = range(n) if n <= 16 else rng.sample(range(n), 8)
        for i in idxs:
            x = pow(root, i, P)
            assert evals[i] == polynom.eval_at(p, x, FS), (n, i)


# crypto/src/merkle/tests.rs:13-66 leaf constants
LEAVES4 = [
    bytes([166, 168, 47, 140, 153, 86, 156, 86, 226, 229, 149, 76, 70, 132,
           209, 109, 166, 193, 113, 197, 42, 116, 170, 144, 74, 104, 29, 110,
           220, 49, 224, 123]),
    bytes([243, 57, 40, 140, 185, 79, 188, 229, 232, 117, 143, 118, 235, 229,
           73, 251, 163, 246, 151, 170, 14, 243, 255, 127, 175, 230, 94, 227,
           214, 5, 89, 105]),
    bytes([11, 33, 220, 93, 26, 67, 166, 154, 93, 7, 115, 130, 70, 13, 166,
           45, 120, 233, 175, 86, 144, 110, 253, 250, 67, 108, 214, 115, 24,
           132, 45, 234]),
    bytes([47, 173, 224, 232, 30, 46, 197, 186, 215, 15, 134, 211, 73, 14,
           34, 216, 6, 11, 217, 150, 90, 242, 8, 31, 73, 85, 150, 254, 229,
           244, 23, 231]),
]
LEAVES8 = [
    bytes([115, 29, 176, 48, 97, 18, 34, 142, 51, 18, 164, 235, 236, 96, 113,
           132, 189, 26, 70, 93, 101, 143, 142, 52, 252, 33, 80, 157, 194,
           52, 209, 129]),
    bytes([52, 46, 37, 214, 24, 248, 121, 199, 229, 25, 171, 67, 65, 37, 98,
           142, 182, 72, 202, 42, 223, 160, 136, 60, 38, 255, 222, 82, 26,
           27, 130, 203]),
    bytes([130, 43, 231, 0, 59, 228, 152, 140, 18, 33, 87, 27, 49, 190, 44,
           82, 188, 155, 163, 108, 166, 198, 106, 143, 83, 167, 201, 152,
           106, 176, 242, 119]),
    bytes([207, 158, 56, 143, 28, 146, 238, 47, 169, 32, 166, 97, 163, 238,
           171, 243, 33, 209, 120, 219, 17, 182, 96, 136, 13, 90, 6, 27, 247,
           242, 49, 111]),
    bytes([179, 64, 123, 119, 226, 139, 161, 127, 36, 251, 218, 88, 20, 217,
           212, 85, 112, 85, 185, 193, 230, 181, 4, 22, 54, 219, 135, 98,
           235, 180, 182, 7]),
    bytes([101, 240, 19, 44, 43, 213, 31, 138, 39, 26, 82, 147, 255, 96, 234,
           51, 105, 6, 233, 144, 255, 187, 242, 3, 157, 246, 55, 175, 98,
           121, 92, 175]),
    bytes([25, 96, 149, 179, 94, 8, 170, 214, 169, 135, 12, 212, 224, 157,
           182, 127, 233, 93, 151, 214, 36, 183, 156, 212, 233, 152, 125,
           244, 146, 161, 75, 128]),
    bytes([247, 43, 130, 141, 234, 172, 61, 187, 109, 31, 56, 30, 14, 232,
           92, 158, 48, 161, 108, 234, 170, 180, 233, 77, 200, 248, 45, 152,
           125, 11, 1, 171]),
]


def _h2(a, b):
    return Blake3_256.merge(a, b)


def _tree(leaves):
    import numpy as np

    words = np.stack([
        np.frombuffer(b, dtype="<u4").astype(np.uint32) for b in leaves
    ])  # (n, 8) digest words, the device-resident leaf layout
    return MerkleTree.from_leaves(words, Blake3_256)


def test_merkle_new_tree_reference_leaves():
    """merkle/tests.rs new_tree — root equals the explicit merge tree."""
    t = _tree(LEAVES4)
    assert t.depth == 2
    assert t.root() == _h2(_h2(LEAVES4[0], LEAVES4[1]),
                           _h2(LEAVES4[2], LEAVES4[3]))
    t = _tree(LEAVES8)
    assert t.depth == 3
    assert t.root() == _h2(
        _h2(_h2(LEAVES8[0], LEAVES8[1]), _h2(LEAVES8[2], LEAVES8[3])),
        _h2(_h2(LEAVES8[4], LEAVES8[5]), _h2(LEAVES8[6], LEAVES8[7])),
    )


def test_merkle_prove_batch_reference_cases():
    """merkle/tests.rs prove_batch — exact leaves/nodes/depth."""
    t = _tree(LEAVES8)
    l = LEAVES8
    p = t.prove_batch([1])
    assert p.leaves == [l[1]]
    assert p.nodes == [[l[0], _h2(l[2], l[3]),
                        _h2(_h2(l[4], l[5]), _h2(l[6], l[7]))]]
    assert p.depth == 3

    p = t.prove_batch([1, 2])
    assert p.leaves == [l[1], l[2]]
    assert p.nodes == [
        [l[0], _h2(_h2(l[4], l[5]), _h2(l[6], l[7]))],
        [l[3]],
    ]

    p = t.prove_batch([1, 6])
    assert p.leaves == [l[1], l[6]]
    assert p.nodes == [[l[0], _h2(l[2], l[3])],
                       [l[7], _h2(l[4], l[5])]]

    p = t.prove_batch(list(range(8)))
    assert p.leaves == list(l)
    assert p.nodes == [[], [], [], []]


def test_merkle_verify_batch_reference_cases():
    """merkle/tests.rs verify_batch — roots resolve, wrong indexes fail."""
    t = _tree(LEAVES8)
    root = t.root()

    p = t.prove_batch([1])
    assert p.get_root([1]) == root
    assert p.get_root([2]) != root

    p = t.prove_batch([1, 2])
    assert p.get_root([1, 2]) == root
    with pytest.raises(ValueError):
        p.get_root([1])
    bad = p.get_root([1, 3])
    assert bad != root

    p = t.prove_batch([1, 6])
    assert p.get_root([1, 6]) == root
    p = t.prove_batch([1, 3, 6])
    assert p.get_root([1, 3, 6]) == root
