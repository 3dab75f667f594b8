"""Golden transcript regression — pins the exact proof bytes of fixed
configs so refactors cannot silently change the Fiat-Shamir transcript or
serialization (the strongest self-oracle available without the Rust
toolchain; SURVEY.md §4(b)).

The matrix covers every field (f64/f62/f128), every registered transcript
hasher family (BLAKE3-256/192, SHA3, Rp64_256, Rp62_248), all extension
degrees incl. CUBIC over f62, folding factors 4/8/16, grinding > 0, and an
aux-segment (randomized) AIR — so a transcript-ordering regression in any of
those paths trips a pin.
"""

import pytest

from starkpack_winterfell_tpu.air.options import ProofOptions
from starkpack_winterfell_tpu.crypto.hashers import get_hasher
from starkpack_winterfell_tpu.models.cli import get_example
from starkpack_winterfell_tpu.ops import blake3 as b3
from starkpack_winterfell_tpu.verifier import verify

# (example, hash, n, length, queries, blowup, grinding, ext, folding,
#  remainder) -> (proof size bytes, blake3-256 of proof bytes)
GOLDEN = [
    (("do-work", "blake3_256", 2, 64, 16, 8, 0, 1, 4, 31), 9128,
     "95def167a1bb73858c9b715dfb08c7ae2a05ababd8f171ecd8f268b00102855d"),
    (("do-work", "blake3_256", 1, 64, 16, 8, 4, 2, 4, 31), 9394,
     "08b6ce34d6ba41924fe945580872fe72c525acc05aeb32f57616ca5795c5f1d5"),
    (("do-work", "blake3_192", 2, 64, 16, 8, 0, 1, 8, 31), 8177,
     "879d40802f89167b7fd8a8c6220b8628794c0e377307f0bda328579c113ddb29"),
    (("fib", "blake3_256", 2, 256, 16, 8, 0, 3, 16, 31), 15225,
     "a425c4a35f397d16ce2c95e63fce9c8441b73a5b38278a9862bdc6d6bee3b7ba"),
    (("perm", "blake3_256", 2, 64, 16, 8, 0, 2, 4, 31), 10630,
     "60fa6e63e6beb4b2e1fa236b43c78c32db5cbe97bd886928ff2f91241da39389"),
    (("rescue-chain", "rp64_256", 1, 64, 16, 8, 0, 1, 4, 31), 16228,
     "771e5cff6db3de538449fd13f420f68fc3d4e2a4aedd08b1a011434343168152"),
    (("fib-f62", "rp62_248", 2, 64, 16, 8, 0, 1, 4, 31), 6893,
     "a9b22d575f02da251758b7357cf0dcd9637f7a560cc0babe09ce53dafaa7d9c4"),
    (("fib-f62", "rp62_248", 1, 64, 16, 8, 2, 3, 4, 31), 8436,
     "a4d69cde6e59c04a27df837731abd7b310591523224eb53b8f60396683c39a40"),
    (("fib-f128", "sha3_256", 2, 64, 16, 8, 0, 1, 4, 31), 8635,
     "73aab7f884ad44c2fe320c4632d60223459fc5f0bd77006e63bd5846e0ed736b"),
    (("rescue128-chain", "sha3_256", 1, 8, 16, 8, 0, 2, 4, 31), 13144,
     "bc58f34f2f3a5e96ddd7faab4633d26585af398ea7c52bbd92a9270cb16a396f"),
    (("lamport128", "sha3_256", 1, 128, 16, 8, 0, 1, 4, 31), 14553,
     "3f6228806d9ff414e269bf279efdcf75f3f2e86f621fd476ea7c302b6b3908e8"),
    (("merkle128", "sha3_256", 1, 64, 16, 8, 0, 2, 4, 31), 13304,
     "f9033cbf4bad68055bed5135e6ea4d77db289511635136328952b00d909e0140"),
    # single-trace aggregated Lamport (sequence assertions + block resets)
    (("lamport128-agg", "sha3_256", 1, 2048, 16, 8, 0, 1, 4, 31), 27424,
     "6856c605f2d5d6de8f48490cf94b5d9f14dbce31b7e659c2d53c13be62c11b35"),
]


@pytest.mark.parametrize("cfg,size,digest", GOLDEN,
                         ids=[f"{c[0][0]}-{c[0][1]}-n{c[0][2]}-e{c[0][7]}-f{c[0][8]}"
                              for c in GOLDEN])
def test_proof_bytes_are_stable(cfg, size, digest):
    example, hname, n, length, q, blowup, g, ext, fold, rem = cfg
    air_class, prover_class, build = get_example(example)
    hasher = get_hasher(hname)
    options = ProofOptions(q, blowup, g, ext, fold, rem)
    traces = [build(i, length) for i in range(n)]
    prover = prover_class(options, hasher)
    pub_inputs = [prover.get_pub_inputs(t) for t in traces]
    proof = prover.prove(n, traces)
    data = proof.to_bytes()
    assert len(data) == size, f"proof size changed for {cfg}"
    assert b3.hash_bytes(data).hex() == digest, (
        f"proof bytes changed for {cfg} — the transcript or serialization "
        "was modified"
    )
    # round trip + verify (the golden bytes must remain *valid*, not just
    # stable)
    rt = proof.from_bytes(data)
    assert rt.to_bytes() == data
    assert verify(air_class, rt, pub_inputs, hasher)
