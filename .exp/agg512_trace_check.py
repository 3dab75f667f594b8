"""TPU: compare the device-built agg trace planes against the host-built
trace at n=512 (agg512 repro hunt, suspect #2 after the streamed commit).
The diag run warmed the builder's compile cache, so this is cheap.

python .exp/agg512_trace_check.py [n]
"""
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_cpu_use_fusion_emitters=false")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import faulthandler

faulthandler.dump_traceback_later(int(os.environ.get("FH_TIMEOUT", "3600")), exit=True)

import numpy as np

from starkpack_winterfell_tpu.models import lamport128_agg as agg

n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
msgs, pks, sigs = agg.make_wallet(n, seed=1)
t0 = time.perf_counter()
trace_host = agg.build_lamport128_agg_trace(msgs, sigs, device_builder=False)
t1 = time.perf_counter()
trace_dev = agg.build_lamport128_agg_trace(msgs, sigs, device_builder=True)
planes = trace_dev.device_planes()
t2 = time.perf_counter()
print(f"n={n} host build {t1-t0:.1f}s  device build+compile {t2-t1:.1f}s",
      flush=True)

# host limb planes: main_segment_limbs() returns a tuple-of-1 component
host_planes = trace_host.main_segment_limbs()[0]
bad = 0
for li, dev_plane in enumerate(planes):
    hv = np.asarray(host_planes[li])
    dv = np.asarray(dev_plane)
    if hv.shape != dv.shape:
        print(f"plane {li}: SHAPE {hv.shape} vs {dv.shape}", flush=True)
        bad += 1
        continue
    neq = hv != dv
    cnt = int(neq.sum())
    if cnt:
        bad += 1
        idx = np.argwhere(neq)
        print(f"plane {li}: {cnt} mismatching entries; first at {idx[0]}",
              flush=True)
print("IDENTICAL" if bad == 0 else f"{bad} planes differ", flush=True)
