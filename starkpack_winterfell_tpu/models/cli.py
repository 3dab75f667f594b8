"""Example runner CLI — equivalent of the reference examples crate
(examples/src/{lib,main}.rs): prove + serialize + round-trip + verify with
timing and proof-size reporting.

Usage:
  python -m starkpack_winterfell_tpu.models.cli do-work -n 32 -l 1024
  python -m starkpack_winterfell_tpu.models.cli fib -n 4 -l 65536
  python -m starkpack_winterfell_tpu.models.cli rescue-chain -n 2 -l 512
"""

from __future__ import annotations

import argparse
import time

from ..air.options import FieldExtension, ProofOptions
from ..crypto.hashers import HASHERS, get_hasher
from ..verifier import verify


def get_example(name: str):
    if name == "do-work":
        from .do_work import DoWorkAir, DoWorkProver, build_do_work_trace

        return DoWorkAir, DoWorkProver, lambda i, l: build_do_work_trace(i, l)
    if name == "fib":
        from .fibonacci import FibAir, FibProver, build_fib_trace

        return FibAir, FibProver, lambda i, l: build_fib_trace(l)
    if name == "rescue-chain":
        from .rescue_chain import RescueChainAir, RescueChainProver, build_chain_trace

        # -l is the CHAIN LENGTH (number of hash permutations), matching the
        # upstream example invocation (rescue -n); trace length = 8 * l
        return (
            RescueChainAir,
            RescueChainProver,
            lambda i, l: build_chain_trace([i + 1] * 8, l),
        )
    if name == "rescue-chain-pad":
        import os

        from .rescue_chain_pad import (
            RescueChainPadAir,
            RescueChainPadProver,
            build_padded_chain_trace,
        )

        # -l = LIVE chain length (permutations), any value; the trace is
        # padded to a canonical bucket (next pow2, or STARKPACK_PAD_BUCKET
        # perms) so one compiled executable serves every length <= bucket
        holder = {}

        def build_pad(i, l):
            bucket = int(
                os.environ.get(
                    "STARKPACK_PAD_BUCKET", max(4, 1 << (l - 1).bit_length())
                )
            )
            holder["n_live"] = l
            return build_padded_chain_trace([i + 1] * 8, l, bucket)

        def make_prover(options, hasher):
            return RescueChainPadProver(options, hasher, holder["n_live"])

        return RescueChainPadAir, make_prover, build_pad
    if name == "lamport":
        from .lamport import LamportAir, LamportProver, build_lamport_trace, keygen, sign
        from .rescue_chain import CYCLE_LENGTH

        def build(i, l):
            k = l // CYCLE_LENGTH - 1
            secrets, pk_hashes, _ = keygen(k, seed=i)
            message = (0x6A09E667F3BCC908 + i) % (1 << k) if k < 63 else i + 1
            sig = sign(secrets, pk_hashes, message, k)
            return build_lamport_trace(message, sig, k)

        return LamportAir, LamportProver, build
    if name == "rescue128-chain":
        from .rescue128_chain import (
            Rescue128ChainAir,
            Rescue128ChainProver,
            build_rescue128_chain_trace,
        )

        # -l = chain length (hashes); trace length = 8 * l
        return (
            Rescue128ChainAir,
            Rescue128ChainProver,
            lambda i, l: build_rescue128_chain_trace([i + 1, i + 2], l),
        )
    if name == "merkle128":
        import random as _random

        from .merkle128 import Merkle128Air, Merkle128Prover, build_merkle128_trace

        def build_mk(i, l):
            depth = l // 8
            rng = _random.Random(i)
            P128 = 340282366920938463463374557953744961537
            leaf = [rng.randrange(P128), rng.randrange(P128)]
            sibs = [[rng.randrange(P128), rng.randrange(P128)] for _ in range(depth)]
            return build_merkle128_trace(leaf, sibs, rng.getrandbits(depth))

        return Merkle128Air, Merkle128Prover, build_mk
    if name == "lamport128":
        from . import lamport128 as lam

        def build128(i, l):
            k = l // 8 - 1
            secrets, pk_hashes, _ = lam.keygen(k, seed=i)
            message = (0x6A09E667F3BCC908 + i) % (1 << k) if k < 63 else i + 1
            sig = lam.sign(secrets, pk_hashes, message, k)
            return lam.build_lamport128_trace(message, sig, k)

        return lam.Lamport128Air, lam.Lamport128Prover, build128
    if name == "lamport128-agg":
        from . import lamport128_agg as lagg

        def build_agg(i, l):
            # one trace aggregating l/1024 signatures over 127-bit messages
            # (1024 rows per signature — the reference benchmark's block)
            k = 127
            n_sigs = max(1, l // (8 * (k + 1)))
            messages, _, sigs = lagg.make_wallet(n_sigs, k, seed=i)
            return lagg.build_lamport128_agg_trace(messages, sigs, k)

        return lagg.Lamport128AggAir, lagg.Lamport128AggProver, build_agg
    if name.startswith("fib-"):
        from .fib_multifield import get_fib_family

        air_class, build_trace, prover_class, _ = get_fib_family(name[4:])
        return air_class, prover_class, lambda i, l: build_trace(l)
    if name == "perm":
        from .permutation import PermAir, PermProver, build_perm_trace

        return PermAir, PermProver, lambda i, l: build_perm_trace(i + 3, l)
    raise SystemExit(f"unknown example {name}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("example", choices=[
        "do-work", "fib", "rescue-chain", "rescue-chain-pad",
        "rescue128-chain", "perm", "lamport",
        "lamport128", "lamport128-agg", "merkle128", "fib-f62", "fib-f128",
    ])
    p.add_argument("-n", "--num-traces", type=int, default=2)
    p.add_argument("-l", "--trace-length", type=int, default=1024,
                   help="trace length in steps; for rescue-chain/"
                        "rescue128-chain this is the CHAIN length (hashes), "
                        "trace = 8*l, matching the reference invocation")
    p.add_argument("-q", "--queries", type=int, default=32)
    p.add_argument("-b", "--blowup", type=int, default=8)
    p.add_argument("-g", "--grinding", type=int, default=0)
    p.add_argument("-e", "--extension", type=int, default=1, choices=[1, 2, 3])
    p.add_argument("-f", "--folding", type=int, default=8)
    p.add_argument("-r", "--remainder", type=int, default=31)
    p.add_argument("--hash", default="blake3_256", choices=sorted(HASHERS))
    p.add_argument("--device", action="store_true",
                   help="run the jitted accelerator pipeline (prover/device.py)")
    p.add_argument("-v", "--verbose", action="store_true",
                   help="per-phase prover debug timing (env_logger parity, "
                        "examples/src/main.rs:23-26)")
    p.add_argument("--profile", metavar="DIR", default=None,
                   help="capture a jax.profiler trace of the proving phase "
                        "into DIR (xprof/tensorboard format; the dhat/perf "
                        "equivalent of examples/src/main.rs:17-19)")
    args = p.parse_args(argv)
    if args.verbose:
        import logging

        logging.basicConfig(
            level=logging.DEBUG, format="[%(levelname)s %(name)s] %(message)s"
        )

    air_class, prover_class, build = get_example(args.example)
    hasher = get_hasher(args.hash)
    options = ProofOptions(
        args.queries, args.blowup, args.grinding, args.extension, args.folding,
        args.remainder,
    )

    t0 = time.perf_counter()
    traces = [build(i, args.trace_length) for i in range(args.num_traces)]
    t1 = time.perf_counter()
    print(f"Built {args.num_traces} execution traces of {traces[0].length} steps "
          f"in {(t1 - t0) * 1000:.0f} ms")

    prover = prover_class(options, hasher)
    pub_inputs = [prover.get_pub_inputs(t) for t in traces]
    if args.profile:
        import jax

        with jax.profiler.trace(args.profile):
            t2 = time.perf_counter()
            proof = prover.prove(args.num_traces, traces, device=args.device)
            t3 = time.perf_counter()
        print(f"Profiler trace written to {args.profile}")
    else:
        t2 = time.perf_counter()
        proof = prover.prove(args.num_traces, traces, device=args.device)
        t3 = time.perf_counter()
    print(f"Generated the aggregated proof in {(t3 - t2) * 1000:.0f} ms")

    proof_bytes = proof.to_bytes()
    print(f"Proof size: {len(proof_bytes) / 1024:.1f} KB")
    print(f"Conjectured security: {proof.security_level_conjectured()} bits, "
          f"proven: {proof.security_level_proven()} bits")
    # proof digest (main.rs:71-74 parity — a handy golden value)
    from ..ops import blake3 as _b3

    print(f"Proof hash (blake3): {_b3.hash_bytes(proof_bytes).hex()}")

    parsed = proof.from_bytes(proof_bytes)
    assert parsed.to_bytes() == proof_bytes, "serialization round trip failed"

    t4 = time.perf_counter()
    verify(air_class, parsed, pub_inputs, hasher)
    t5 = time.perf_counter()
    print(f"Proof verified in {(t5 - t4) * 1000:.1f} ms")


if __name__ == "__main__":
    main()
