"""TPU: bisect the streamed main-trace commit at the agg512 config.

The device agg512 proof diverges from the byte-identical-host at the MAIN
TRACE ROOT (proof byte 35) while the device-built trace planes and the
raw 2^19 interpolate/LDE are bit-identical — so one of the streamed
commit sub-steps (per-coset leaf kernel, offsets table, interleave,
Merkle levels) is wrong on the chip.  This compares each sub-step output
against a host-numpy emulation of the same formula.

python .exp/agg512_commit_bisect.py [n_sigs]
"""
import os
import pickle
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_cpu_use_fusion_emitters=false")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import faulthandler

faulthandler.dump_traceback_later(int(os.environ.get("FH_TIMEOUT", "7000")), exit=True)

import numpy as np

from starkpack_winterfell_tpu.crypto.hashers import get_hasher
from starkpack_winterfell_tpu.math.fieldspec import F128_SPEC
from starkpack_winterfell_tpu.models import lamport128_agg as agg
from starkpack_winterfell_tpu.ops.backend import get_backend
from starkpack_winterfell_tpu.parallel import streamed

B = get_backend("f128")
B192 = get_hasher("blake3_192")
n_sigs = int(sys.argv[1]) if len(sys.argv) > 1 else 512

host_root = None
try:
    hp = pickle.load(open(".exp/queue/agg512_host_proof.pkl", "rb"))
    host_root = hp["proof_bytes"][35:35 + 24]
    print("host main root:", host_root.hex(), flush=True)
except Exception as e:
    print("no host proof pickle:", e, flush=True)

msgs, pks, sigs = agg.make_wallet(n_sigs, seed=1)
trace = agg.build_lamport128_agg_trace(msgs, sigs, device_builder=False)
length = trace.length
w = trace.width
blowup = 8
offset = F128_SPEC.GENERATOR
print(f"n=1 w={w} length={length}", flush=True)

comps = trace.main_segment_limbs(B)[0]  # tuple of (w, length) u32 planes
stacked = (tuple(np.asarray(l).reshape(1, w, length) for l in comps),)

_cache = {}


def _cached(key, make):
    hit = _cache.get(key)
    if hit is None:
        hit = _cache[key] = make()
    return hit


from starkpack_winterfell_tpu.crypto.merkle import MerkleTree

t0 = time.perf_counter()
commit = streamed.streamed_segment_commit(
    B, B192, 1, w, length, blowup, offset, 1, _cached
)
polys_dev, levels, offs_dev = commit(stacked)
levels = [np.asarray(l) for l in levels]
root_dev = MerkleTree(levels, B192).root()
t1 = time.perf_counter()
print(f"streamed commit ran in {t1-t0:.1f}s", flush=True)
print("device root:", root_dev.hex(), flush=True)
if host_root is not None:
    print("ROOT MATCH:", root_dev == host_root, flush=True)

# --- sub-step 1: interpolation ---
host_polys_full = B.interpolate_poly(stacked)
dev_polys = tuple(np.asarray(l) for l in polys_dev[0])
hp_arr = tuple(np.asarray(l) for l in host_polys_full[0])
pi = all(np.array_equal(a, b) for a, b in zip(hp_arr, dev_polys))
print("interpolate identical:", pi, flush=True)

# --- sub-step 2: per-coset leaves ---
offs_tab = streamed._offsets_table(B, offset, length, blowup)
offs_host = tuple(np.asarray(l) for l in offs_tab)
mism = []
leaves_host_all = []
for r in range(blowup):
    offs_r = tuple(l[r][None, None, :] for l in offs_host)
    scaled = tuple(B.bmul(c, offs_r) for c in (hp_arr,))
    evals = B.evaluate_poly_with_offset(scaled, 1, 1)
    rt = tuple(
        tuple(
            np.transpose(np.asarray(l), (2, 0, 1)).reshape(length, 1 * w)
            for l in c
        )
        for c in evals
    )
    words = B.rows_to_words(rt, 1)
    leaves_r = np.asarray(B192.hash_words(words, w * B.ELEMENT_BYTES))
    leaves_host_all.append(leaves_r)

# reconstruct device leaves from levels[0] (natural order, interleaved)
leaves_dev = np.asarray(levels[0])
# natural index i = q*blowup + r -> coset r element q
for r in range(blowup):
    dev_r = leaves_dev[r::blowup]
    same = np.array_equal(dev_r, leaves_host_all[r])
    if not same:
        neq = (dev_r != leaves_host_all[r]).any(axis=-1)
        mism.append((r, int(neq.sum()), int(np.argwhere(neq)[0][0])))
print("coset leaves identical:", not mism, mism[:4], flush=True)

# --- sub-step 3: Merkle levels from the (device) leaves ---
cur = leaves_dev
ok_levels = True
for li in range(1, len(levels)):
    cur = np.asarray(B192.merge_words(cur[0::2], cur[1::2]))
    if not np.array_equal(cur, np.asarray(levels[li])):
        ok_levels = False
        print(f"level {li} mismatch", flush=True)
        break
print("merkle levels identical:", ok_levels, flush=True)
