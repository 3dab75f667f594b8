"""Golden transcript regression — pins the exact proof bytes of fixed
configs so refactors cannot silently change the Fiat-Shamir transcript or
serialization (the strongest self-oracle available without the Rust
toolchain; SURVEY.md §4(b))."""

from starkpack_winterfell_tpu import Blake3_256, FieldExtension, ProofOptions
from starkpack_winterfell_tpu.models.do_work import DoWorkProver, build_do_work_trace
from starkpack_winterfell_tpu.ops import blake3 as b3

GOLDEN = {
    # (n, length, queries, grinding, ext, folding): (size, blake3 hex)
    (2, 64, 16, 0, FieldExtension.NONE, 4): (
        9128,
        "95def167a1bb73858c9b715dfb08c7ae2a05ababd8f171ecd8f268b00102855d",
    ),
    (1, 64, 16, 4, FieldExtension.QUADRATIC, 4): (
        8847,
        "7cff0f90e8de1c4ce68443da30b8c4f70d6428b2d4c99d8e59a681034c8ce5d5",
    ),
}


def test_proof_bytes_are_stable():
    for (n, length, q, g, ext, fold), (size, digest) in GOLDEN.items():
        options = ProofOptions(q, 8, g, ext, fold, 31)
        if n == 2:
            traces = [build_do_work_trace(i, length) for i in range(n)]
        else:
            traces = [build_do_work_trace(7, length)]
        proof = DoWorkProver(options, Blake3_256).prove(n, traces)
        data = proof.to_bytes()
        assert len(data) == size, f"proof size changed for {(n, length, q, g, ext, fold)}"
        assert b3.hash_bytes(data).hex() == digest, (
            f"proof bytes changed for {(n, length, q, g, ext, fold)} — the "
            "transcript or serialization was modified"
        )
