"""starkpack_winterfell_tpu — a TPU-native StarkPack (batched zk-STARK)
proving framework.

Re-implements the capabilities of the NethermindEth/starkpack-winterfell
reference (a Rust Winterfell fork with proof aggregation) as an idiomatic
JAX/XLA stack: u32-limb Goldilocks field kernels, vectorized NTT/BLAKE3/
Merkle device paths, and a host-side Fiat-Shamir transcript that exactly
replicates the reference's draw/reseed order.

Facade equivalent of the reference's `winterfell` crate (winterfell/src/lib.rs).
"""

from .air import (
    Air,
    AirContext,
    Assertion,
    FieldExtension,
    ProofOptions,
    StarkProof,
    TraceInfo,
    TraceLayout,
    TransitionConstraintDegree,
)
from .crypto.hashers import Blake3_192, Blake3_256, Sha3_256, get_hasher
from .crypto.random_coin import RandomCoin
from .errors import DeserializationError, ProverError
from .prover import Prover, TraceTable
from .verifier import VerifierError, verify

__version__ = "0.1.0"
