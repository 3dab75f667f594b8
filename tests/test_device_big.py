"""Gather-free big-trace device pipeline (prover/device_big.py) — byte
identity with the host pipeline at the smallest supported size (2^14), run
through the Pallas interpreter on CPU.

The same path was validated on real TPU hardware: fib 2^16 and 2^20
byte-identical to host, rescue-chain/do_work/QUAD checked via this suite's
companion script (.exp/exp10_big_cpu_more.py)."""

import numpy as np
import pytest

from starkpack_winterfell_tpu import Blake3_256, FieldExtension, ProofOptions, verify
from starkpack_winterfell_tpu.models.fibonacci import FibAir, FibProver, build_fib_trace
from starkpack_winterfell_tpu.ops.pallas import ntt4


@pytest.fixture(autouse=True)
def _interpret_mode():
    ntt4.INTERPRET = True
    yield
    ntt4.INTERPRET = False


def test_big_path_byte_identical_to_host():
    options = ProofOptions(8, 8, 0, FieldExtension.NONE, 4, 31)
    traces = [build_fib_trace(1 << 14)]
    prover = FibProver(options, Blake3_256)
    p_host = prover.prove(1, traces)
    p_dev = prover.prove(1, traces, device=True)
    assert p_host.to_bytes() == p_dev.to_bytes()
    verify(FibAir, p_dev, [prover.get_pub_inputs(t) for t in traces], Blake3_256)
