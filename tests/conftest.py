"""Test configuration: force an 8-device virtual CPU mesh before any backend
is initialized.

Tests exercise the multi-chip sharding path on a virtual CPU mesh
(xla_force_host_platform_device_count=8) so they run anywhere; the real-TPU
path is exercised by bench.py and the driver's compile checks.

Note: this environment registers a remote-TPU PJRT plugin via sitecustomize
and pins JAX_PLATFORMS=axon; `jax.config.update` after import is the reliable
way to select the built-in CPU backend for tests.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU's MLIR fusion emitters build exponentially slow kernels from deep
# u32-limb multiply chains (compile hangs >150s and 20s+ executions of
# byte-sized fusions); the classic emitters compile the same graphs in
# seconds.  TPU is unaffected.
if "xla_cpu_use_fusion_emitters" not in flags:
    flags = (flags + " --xla_cpu_use_fusion_emitters=false").strip()
os.environ["XLA_FLAGS"] = flags
# Keep the remote-TPU (axon) plugin out of test processes entirely: an empty
# POOL_IPS stops the sitecustomize hook from registering it at jax-import
# time, so a test run can never grab the exclusive TPU tunnel out from under
# a concurrently running bench/profile process.
os.environ["PALLAS_AXON_POOL_IPS"] = ""

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
