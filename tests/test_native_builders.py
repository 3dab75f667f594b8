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


def test_rescue128_digest_matches_python():
    import ctypes

    from starkpack_winterfell_tpu.crypto import rescue128 as r128
    from starkpack_winterfell_tpu.native import get_rescue128

    lib = get_rescue128()
    if lib is None:
        pytest.skip("no C compiler")
    for elems in ([1, 2, 3, 4], [r128.P - 1, (1 << 127) + 5],
                  list(range(1, 10))):
        inp = np.array(
            [x for e in elems for x in (e & (2**64 - 1), e >> 64)],
            dtype=np.uint64,
        )
        out = np.zeros(4, dtype=np.uint64)
        lib.r128_digest_batch(
            inp.ctypes.data_as(ctypes.c_void_p), len(elems), 1,
            out.ctypes.data_as(ctypes.c_void_p),
        )
        got = [int(out[0]) | (int(out[1]) << 64),
               int(out[2]) | (int(out[3]) << 64)]
        assert got == r128.digest(elems)


def test_lamport128_native_trace_matches_python():
    from starkpack_winterfell_tpu.models import lamport128 as lam
    from starkpack_winterfell_tpu import native as nat

    if nat.get_rescue128() is None:
        pytest.skip("no C compiler")
    k = 15
    secrets, pk_hashes, pub_key = lam.keygen(k, seed=9)
    msg = 0b011011100010110
    sig = lam.sign(secrets, pk_hashes, msg, k)
    t_native = lam.build_lamport128_trace(msg, sig, k)
    saved = dict(nat._CACHE)
    nat._CACHE["r128"] = None
    try:
        t_python = lam.build_lamport128_trace(msg, sig, k)
    finally:
        nat._CACHE.update(saved)
    assert all(
        t_native.get(c, s) == t_python.get(c, s)
        for c in range(lam.TRACE_WIDTH)
        for s in range(t_native.length)
    )
