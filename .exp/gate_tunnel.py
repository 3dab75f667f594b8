"""Queue gate: block until the axon TPU tunnel answers, then exit 0.

Runs as the FIRST qrun job so the TPU measurement jobs behind it only
start once the tunnel is actually serving (round-2/3 lost chip time to
jobs hanging at backend init while the tunnel was down).  Each probe is
a SUBPROCESS with its own timeout, so a hung backend init never wedges
the gate itself.
"""
import subprocess
import sys
import time

PROBE = (
    "import jax\n"
    "d = jax.devices()\n"
    "assert d and d[0].platform != 'cpu', d\n"
    "import jax.numpy as jnp, numpy as np\n"
    "assert int(np.asarray(jnp.arange(8).sum())) == 28\n"
    "print('OK', d)\n"
)

t0 = time.time()
attempt = 0
while True:
    attempt += 1
    try:
        r = subprocess.run([sys.executable, "-c", PROBE], timeout=150,
                           capture_output=True, text=True)
        if r.returncode == 0:
            print(f"TUNNEL UP after {time.time()-t0:.0f}s "
                  f"(attempt {attempt}): {r.stdout.strip()}", flush=True)
            sys.exit(0)
        msg = (r.stderr or r.stdout).strip().splitlines()
        print(f"probe {attempt} rc={r.returncode} "
              f"{msg[-1] if msg else ''}", flush=True)
    except subprocess.TimeoutExpired:
        print(f"probe {attempt} timed out (150s)", flush=True)
    time.sleep(120)
