"""CPU differential: streamed_segment_commit root vs the host pipeline's
trace commitment for w=14 f128 traces at 2^17..2^19 (agg512 repro hunt —
the device proof diverges from host at the MAIN TRACE ROOT, byte 35).

env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python .exp/streamed_commit_diff.py [logn ...]
"""
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_cpu_use_fusion_emitters=false")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import faulthandler

faulthandler.dump_traceback_later(int(os.environ.get("FH_TIMEOUT", "3600")), exit=True)

import numpy as np

from starkpack_winterfell_tpu.crypto.hashers import get_hasher
from starkpack_winterfell_tpu.crypto.merkle import MerkleTree
from starkpack_winterfell_tpu.ops.backend import get_backend
from starkpack_winterfell_tpu.parallel import streamed
from starkpack_winterfell_tpu.math.fieldspec import F128_SPEC

B = get_backend("f128")
B192 = get_hasher("blake3_192")
rng = np.random.default_rng(9)

GENERATOR = F128_SPEC.GENERATOR
_cache = {}


def _cached(key, make):
    hit = _cache.get(key)
    if hit is None:
        hit = _cache[key] = make()
    return hit


def host_root(cols, length, blowup):
    """Host-pipeline trace commitment for one instance (prover/pipeline.py
    semantics: interpolate, LDE with offset, row-hash, Merkle)."""
    comps = B.elems_to_limbs([v for col in cols for v in col], 1)
    comps = B.emap(lambda a: a.reshape(len(cols), length), comps)
    polys = B.interpolate_poly(comps)
    evals = B.evaluate_poly_with_offset(polys, GENERATOR, blowup)
    # rows: (L, w) word layout -> leaf hashes
    rt = tuple(
        tuple(np.transpose(l, (1, 0)) for l in c) for c in (evals,)
    )[0]
    L = length * blowup
    w = len(cols)
    rows = tuple(np.ascontiguousarray(l.T) for l in evals)  # (L, w) planes
    words = B.rows_to_words((tuple(rows),), 1)
    leaves = B192.hash_words(words, w * B.ELEMENT_BYTES)
    leaves = np.asarray(leaves)
    levels = [leaves]
    cur = leaves
    while cur.shape[0] > 1:
        cur = B192.merge_words(cur[0::2], cur[1::2])
        levels.append(np.asarray(cur))
    tree = MerkleTree(levels, B192)
    return tree.root()


def streamed_root(cols, length, blowup):
    n, w = 1, len(cols)
    commit = streamed.streamed_segment_commit(
        B, B192, n, w, length, blowup, GENERATOR, 1, _cached
    )
    comps = B.elems_to_limbs([v for col in cols for v in col], 1)
    stacked = tuple(
        (l.reshape(1, w, length) for l in c) for c in (comps,)
    )
    stacked = tuple(tuple(l.reshape(1, w, length) for l in comps),)
    polys, levels, offs = commit((tuple(l.reshape(1, w, length) for l in comps),))
    tree = MerkleTree([np.asarray(l) for l in levels], B192)
    return tree.root()


for logn in [int(a) for a in sys.argv[1:]] or [13, 17, 18, 19]:
    length = 1 << logn
    w = 14
    cols = [
        (rng.integers(0, 1 << 62, size=length).astype(object)).tolist()
        for _ in range(w)
    ]
    t0 = time.perf_counter()
    hr = host_root(cols, length, 8)
    t1 = time.perf_counter()
    sr = streamed_root(cols, length, 8)
    t2 = time.perf_counter()
    print(
        f"2^{logn}: host {hr.hex()[:16]} ({t1-t0:.0f}s)  "
        f"streamed {sr.hex()[:16]} ({t2-t1:.0f}s)  match={hr == sr}",
        flush=True,
    )
