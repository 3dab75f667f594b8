"""TPU: jax.profiler trace of the steady lamport128_agg prove (64 sigs,
BLAKE3-192 reference-parity config) + per-phase timers + top-op table.

Output: phase log on stdout; parsed top device ops from the trace at the
end (self-contained — no manual trace spelunking needed).
"""
import glob
import gzip
import json
import logging
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_cpu_use_fusion_emitters=false")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import faulthandler

faulthandler.dump_traceback_later(4800, exit=True)

logging.basicConfig(
    level=logging.DEBUG,
    format="%(relativeCreated)8.0f ms %(name)s: %(message)s",
)
for noisy in ("jax", "jax._src"):
    logging.getLogger(noisy).setLevel(logging.WARNING)

import jax

from starkpack_winterfell_tpu import verify
from starkpack_winterfell_tpu.air.options import FieldExtension, ProofOptions
from starkpack_winterfell_tpu.crypto.hashers import get_hasher
from starkpack_winterfell_tpu.models import lamport128_agg as agg

HASH = get_hasher(os.environ.get("HASH", "blake3_192"))
N = int(sys.argv[1]) if len(sys.argv) > 1 else 64
OPTIONS = ProofOptions(28, 8, 0, FieldExtension.NONE, 4, 7)

t0 = time.perf_counter()
messages, pub_keys, sigs = agg.make_wallet(N, seed=1)
trace = agg.build_lamport128_agg_trace(messages, sigs)
print(f"wallet+trace {time.perf_counter()-t0:.1f}s", flush=True)

prover = agg.Lamport128AggProver(OPTIONS, HASH, N)
pub = prover.get_pub_inputs(trace)

t0 = time.perf_counter()
proof = prover.prove(1, [trace], device=True)
print(f"prove #1 (compile) {time.perf_counter()-t0:.1f}s", flush=True)

TRACE_DIR = "/tmp/agg64_trace"
t0 = time.perf_counter()
with jax.profiler.trace(TRACE_DIR):
    proof = prover.prove(1, [trace], device=True)
steady = time.perf_counter() - t0
print(f"prove #2 (steady, traced) {steady:.2f}s  "
      f"proof {len(proof.to_bytes())/1024:.1f} KB", flush=True)
ok = verify(agg.Lamport128AggAir, proof, [pub], HASH)
print(f"verify ok={ok}", flush=True)

# -- parse the trace: top ops by total device time ---------------------------
paths = glob.glob(TRACE_DIR + "/**/*.trace.json.gz", recursive=True)
if not paths:
    print("NO TRACE FILE FOUND", flush=True)
    sys.exit(0)
path = max(paths, key=os.path.getmtime)
with gzip.open(path, "rt") as f:
    data = json.load(f)
events = data.get("traceEvents", [])
# device lanes: pid names containing "TPU"/"Device"; fall back to all X events
pid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")
tot = {}
cnt = {}
for e in events:
    if e.get("ph") != "X":
        continue
    pname = pid_names.get(e.get("pid"), "")
    if "TPU" not in pname and "Device" not in pname and "device" not in pname:
        continue
    name = e.get("name", "?")
    tot[name] = tot.get(name, 0) + e.get("dur", 0)
    cnt[name] = cnt.get(name, 0) + 1
pairs = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
dev_total = sum(tot.values())
print(f"\n== device time total {dev_total/1e6:.2f} s over "
      f"{sum(cnt.values())} events (wall {steady:.2f} s) ==", flush=True)
for name, dur in pairs:
    print(f"{dur/1e6:9.3f} s  x{cnt[name]:<6} {name[:110]}", flush=True)
