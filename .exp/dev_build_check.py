import os, sys
os.environ.setdefault("XLA_FLAGS", "--xla_cpu_use_fusion_emitters=false")
sys.path.insert(0, "/root/repo")
import faulthandler; faulthandler.dump_traceback_later(600, exit=True)
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from starkpack_winterfell_tpu.models import lamport128_agg as agg
from starkpack_winterfell_tpu.ops.backend import get_backend

n, k = 2, 3
messages, pub_keys, sigs = agg.make_wallet(n, k, seed=5)
trace = agg.build_lamport128_agg_trace(messages, sigs, k)
B = get_backend("f128")
host = trace.main_segment_limbs(B)[0]
dev = trace.device_planes()
assert dev is not None
for li, (h, d) in enumerate(zip(host, dev)):
    d = np.asarray(d)
    h = np.asarray(h)
    if not (h == d).all():
        bad = np.argwhere(h != d)
        print(f"limb {li}: {len(bad)} mismatches; first {bad[:5]}")
        print("host", h[tuple(bad[0])], "dev", d[tuple(bad[0])])
        sys.exit(1)
print("device builder planes BIT-IDENTICAL to host", host[0].shape)
