"""CPU differential: f128 interpolate/LDE with mxu_ntt forced ON vs OFF
across 2^17..2^20 (agg512 repro hunt — the streamed device commit diverges
from host at the main trace root; MXU tiles engage on TPU only, so a
mismatch here with ENABLED=True reproduces the chip locally).

env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python .exp/mxu_2e19_diff.py [logn ...]
"""
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_cpu_use_fusion_emitters=false")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import faulthandler

faulthandler.dump_traceback_later(int(os.environ.get("FH_TIMEOUT", "3600")), exit=True)

import numpy as np

from starkpack_winterfell_tpu.math.fieldspec import F128_SPEC
from starkpack_winterfell_tpu.ops import mxu_ntt
from starkpack_winterfell_tpu.ops.backend import get_backend

B = get_backend("f128")
rng = np.random.default_rng(11)

for logn in [int(a) for a in sys.argv[1:]] or [17, 18, 19, 20]:
    n = 1 << logn
    vals = rng.integers(0, 1 << 62, size=n, dtype=np.uint64)
    comps = B.elems_to_limbs([int(v) for v in vals], 1)

    results = {}
    for flag in (False, True):
        mxu_ntt.ENABLED = flag
        t0 = time.perf_counter()
        polys = B.interpolate_poly(comps)
        ev = B.evaluate_poly_with_offset(polys, F128_SPEC.GENERATOR, 8)
        results[flag] = (
            tuple(np.asarray(l) for l in polys),
            tuple(np.asarray(l) for l in ev),
        )
        print(f"2^{logn} mxu={flag}: {time.perf_counter()-t0:.1f}s", flush=True)
    mxu_ntt.ENABLED = None
    pi = all(
        np.array_equal(a, b)
        for a, b in zip(results[False][0], results[True][0])
    )
    ei = all(
        np.array_equal(a, b)
        for a, b in zip(results[False][1], results[True][1])
    )
    print(f"2^{logn}: interpolate identical={pi}  lde identical={ei}", flush=True)
