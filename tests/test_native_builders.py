"""Native C chain-trace builders (native/builders.cpp) are bit-identical to
the pure-Python host loops they replace."""

import numpy as np
import pytest

from starkpack_winterfell_tpu.native import get_builders

pytestmark = pytest.mark.skipif(
    get_builders() is None, reason="no C compiler available"
)


def test_rescue_chain_trace_matches_host_loop():
    from starkpack_winterfell_tpu.models import rescue_chain as rc

    seed = [11, 22, 33, 44, 55, 66, 77, 88]
    host = rc.build_chain_trace(seed, 4, device=False)
    native = rc._build_chain_trace_native(seed, 4)
    np.testing.assert_array_equal(
        native.main_columns_u64(), host.main_columns_u64()
    )


def test_do_work_chain_matches_python():
    import ctypes

    from starkpack_winterfell_tpu.math import scalar as fs

    lib = get_builders()
    n = 257
    out = np.empty(n, dtype=np.uint64)
    # start near P to exercise the reduction paths
    start = fs.P - 3
    lib.do_work_chain(start, n, out.ctypes.data_as(ctypes.c_void_p))
    x = start % fs.P
    for i in range(n):
        assert int(out[i]) == x
        x = (pow(x, 3, fs.P) + 42) % fs.P


def test_fib_trace_matches_python():
    import ctypes

    from starkpack_winterfell_tpu.math import scalar as fs

    lib = get_builders()
    n = 512
    out = np.empty((2, n), dtype=np.uint64)
    lib.fib_trace(n, out.ctypes.data_as(ctypes.c_void_p))
    a, b = 1, 1
    for i in range(n):
        assert int(out[0, i]) == a and int(out[1, i]) == b
        a, b = (a + b) % fs.P, (a + 2 * b) % fs.P


def test_mulmod_reduction_edge_cases():
    """Hit reduce128 carry/borrow branches against python-int arithmetic."""
    import ctypes

    from starkpack_winterfell_tpu.math import scalar as fs

    lib = get_builders()
    # do_work chain starting at values that drive products near 2^128
    for start in (fs.P - 1, fs.P - 2, (1 << 63) + 12345, 0xFFFFFFFF):
        out = np.empty(64, dtype=np.uint64)
        lib.do_work_chain(start, 64, out.ctypes.data_as(ctypes.c_void_p))
        x = start % fs.P
        for i in range(64):
            assert int(out[i]) == x
            x = (pow(x, 3, fs.P) + 42) % fs.P
