"""TPU: f128 interpolate + coset-LDE differential, device (jnp / pallas
four-step / MXU tiles) vs host (numpy), at 2^17..2^20 — agg512 repro hunt.
The streamed device commit diverges from the host at the main trace root
while the device-built trace is bit-identical, so the NTT stack on the
chip at 2^19 is the prime remaining suspect.

python .exp/tpu_ntt_2e19_diff.py [logn ...]
"""
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_cpu_use_fusion_emitters=false")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import faulthandler

faulthandler.dump_traceback_later(int(os.environ.get("FH_TIMEOUT", "7000")), exit=True)

import jax
import jax.numpy as jnp
import numpy as np

from starkpack_winterfell_tpu.math.fieldspec import F128_SPEC
from starkpack_winterfell_tpu.ops.backend import get_backend

B = get_backend("f128")
rng = np.random.default_rng(13)
print(jax.devices(), flush=True)


@jax.jit
def dev_pipeline(comps):
    polys = B.interpolate_poly(comps)
    ev = B.evaluate_poly_with_offset(polys, F128_SPEC.GENERATOR, 8)
    return polys, ev


for logn in [int(a) for a in sys.argv[1:]] or [18, 19]:
    n = 1 << logn
    vals = rng.integers(0, 1 << 62, size=n, dtype=np.uint64)
    comps = B.elems_to_limbs([int(v) for v in vals], 1)

    t0 = time.perf_counter()
    host_polys = B.interpolate_poly(comps)
    host_ev = B.evaluate_poly_with_offset(host_polys, F128_SPEC.GENERATOR, 8)
    t1 = time.perf_counter()
    dev_polys, dev_ev = dev_pipeline(tuple(jnp.asarray(l) for l in comps))
    dev_polys = tuple(np.asarray(l) for l in dev_polys)
    dev_ev = tuple(np.asarray(l) for l in dev_ev)
    t2 = time.perf_counter()
    pi = all(np.array_equal(a, b) for a, b in zip(host_polys, dev_polys))
    ei = all(np.array_equal(a, b) for a, b in zip(host_ev, dev_ev))
    print(f"2^{logn}: host {t1-t0:.1f}s  device {t2-t1:.1f}s  "
          f"interp identical={pi}  lde identical={ei}", flush=True)
    if not pi:
        for li, (a, b) in enumerate(zip(host_polys, dev_polys)):
            neq = a != b
            if neq.any():
                idx = np.argwhere(neq)[0]
                print(f"  interp plane {li}: {int(neq.sum())} diffs, "
                      f"first at {idx}", flush=True)
    if not ei:
        for li, (a, b) in enumerate(zip(host_ev, dev_ev)):
            neq = a != b
            if neq.any():
                idx = np.argwhere(neq)[0]
                print(f"  lde plane {li}: {int(neq.sum())} diffs, "
                      f"first at {idx}", flush=True)
