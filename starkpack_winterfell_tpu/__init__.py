"""starkpack_winterfell_tpu — a TPU-native StarkPack (batched zk-STARK)
proving framework.

Re-implements the capabilities of the NethermindEth/starkpack-winterfell
reference (a Rust Winterfell fork with proof aggregation) as an idiomatic
JAX/XLA stack: u32-limb Goldilocks field kernels, vectorized NTT/BLAKE3/
Merkle device paths, and a host-side Fiat-Shamir transcript that exactly
replicates the reference's draw/reseed order.

Facade equivalent of the reference's `winterfell` crate (winterfell/src/lib.rs).
"""

import os as _os

# Persistent XLA compilation cache: first compile of a proving config costs
# minutes through the remote-TPU tunnel; with the cache, every later PROCESS
# reuses it.  This jax build does not map the JAX_COMPILATION_CACHE_DIR env
# var, so configure explicitly (set the env var to "" to disable).
def _machine_cache_key() -> str:
    """Per-machine cache-key suffix.  XLA:CPU AOT results are specialised to
    the compiling host's CPU features; reloading them on a machine with a
    different feature set can SIGILL (observed as cpu_aot_loader warnings in
    MULTICHIP_r02).  Keying the cache directory on (arch, cpuinfo flags)
    keeps each machine's entries separate while still sharing TPU entries
    across processes on the same host."""
    import hashlib as _hashlib
    import platform as _platform

    feat = ""
    try:
        with open("/proc/cpuinfo") as _f:
            for _line in _f:
                if _line.startswith(("flags", "Features")):
                    feat = " ".join(sorted(_line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    raw = ("%s|%s" % (_platform.machine(), feat)).encode()
    return _hashlib.blake2s(raw, digest_size=6).hexdigest()


if _os.environ.get("JAX_COMPILATION_CACHE_DIR", None) != "":
    try:
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                             "..", ".jax_cache", _machine_cache_key()),
        )
        # persist even sub-second compiles: on the tunneled TPU every EAGER
        # op dispatch is a remote compile (~0.3 s), and a proof's host tail
        # issues hundreds of them — all cache-hittable
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # jax unavailable: host-only numpy paths still work
        pass

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
