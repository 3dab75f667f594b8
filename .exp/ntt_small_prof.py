import os, sys, time
os.environ.setdefault("XLA_FLAGS", "--xla_cpu_use_fusion_emitters=false")
sys.path.insert(0, "/root/repo")
import numpy as np
from starkpack_winterfell_tpu.ops.backend import get_backend

B = get_backend("f128")
vals = [(i * 123456789) % B.spec.P for i in range(256)]
limbs = B.elems_to_limbs(vals, 1)
f = B.field if hasattr(B, "field") else None
print("backend", type(B))

# find the limb field object
from starkpack_winterfell_tpu.ops import limb_field
lf = limb_field.F128
a = limbs[0] if isinstance(limbs[0], tuple) else limbs
n = 256
bits = 8
t0 = time.perf_counter()
rev = lf._bit_rev(n)
t1 = time.perf_counter()
tables = lf._stage_twiddles(n, True)
t2 = time.perf_counter()
print(f"bit_rev {1e3*(t1-t0):.2f} ms  stage_twiddles {1e3*(t2-t1):.2f} ms")
for it in range(3):
    t3 = time.perf_counter()
    r = lf._ntt_stages_native(a, n, bits, tables, rev)
    t4 = time.perf_counter()
    print(f"stages_native {1e3*(t4-t3):.2f} ms")
# second call with warm tables
t5 = time.perf_counter()
tables = lf._stage_twiddles(n, True)
t6 = time.perf_counter()
print(f"stage_twiddles warm {1e3*(t6-t5):.2f} ms")
