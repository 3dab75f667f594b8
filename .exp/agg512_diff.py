"""Byte-diff the agg512 device proof (from .exp/agg512_diag.py) against the
host CPU proof (.exp/agg512_host_cpu.py) component by component — the two
pipelines are required to be byte-identical, so the FIRST divergent
component names the broken phase.

Run CPU-only: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python .exp/agg512_diff.py
"""
import os
import pickle
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_cpu_use_fusion_emitters=false")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from starkpack_winterfell_tpu.air.proof import StarkProof
from starkpack_winterfell_tpu.crypto.hashers import get_hasher
from starkpack_winterfell_tpu.models import lamport128_agg as agg
from starkpack_winterfell_tpu import FieldExtension, ProofOptions

B192 = get_hasher("blake3_192")

host = pickle.load(open(".exp/queue/agg512_host_proof.pkl", "rb"))
dev = pickle.load(open(".exp/queue/agg512_diag_proof.pkl", "rb"))
hb, db = host["proof_bytes"], dev["proof_bytes"]
print(f"host {len(hb)} B  device {len(db)} B  equal={hb == db}")
if hb == db:
    sys.exit(0)

# first divergent byte
k = next(i for i, (a, b) in enumerate(zip(hb, db)) if a != b)
print(f"first divergent byte at offset {k} / {min(len(hb), len(db))}")

# parse both and compare components
opts = ProofOptions(28, 8, 0, FieldExtension.NONE, 4, 7)
trace_info = None


def parse(b):
    # from_bytes needs an instance for counts — build the air instance
    msgs, pks, sigs = agg.make_wallet(8, seed=1)  # shape donor only
    return StarkProof.from_bytes(b, agg.Lamport128AggAir, B192)


try:
    ph, pd = parse(hb), parse(db)
    for name in ("contexts", "commitments", "trace_queries",
                 "constraint_queries", "ood_frames", "pow_nonce",
                 "fri_proof"):
        a, c = getattr(ph, name), getattr(pd, name)
        if name == "commitments":
            same = a.to_bytes() == c.to_bytes() if hasattr(a, "to_bytes") else a == c
        else:
            same = str(a)[:0] == str(c)[:0]  # placeholder
        print(name, "…")
except Exception as e:
    print("structured parse failed:", e)
