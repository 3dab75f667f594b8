"""Multi-chip paths on the 8-device virtual CPU mesh."""

import numpy as np

from starkpack_winterfell_tpu.ops import gl64 as gl, ntt


def test_sharded_ntt_matches_host():
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from starkpack_winterfell_tpu.parallel.mesh import make_mesh, sharded_ntt

    mesh = make_mesh(8)
    n1, n2 = 64, 64
    n = n1 * n2
    rng = np.random.default_rng(101)
    p = rng.integers(0, gl.P, size=n, dtype=np.uint64)
    pair = gl.from_u64(p)

    run = sharded_ntt(mesh, n, n1)
    sharding = NamedSharding(mesh, P(None, "dp"))
    lo = jax.device_put(pair[0].reshape(n1, n2), sharding)
    hi = jax.device_put(pair[1].reshape(n1, n2), sharding)
    out_lo, out_hi = run((lo, hi))
    got = (np.asarray(out_lo).reshape(n), np.asarray(out_hi).reshape(n))

    want = ntt.ntt_components((pair,))
    assert np.array_equal(got[0], want[0][0])
    assert np.array_equal(got[1], want[0][1])


def test_sharded_commitment_matches_host_root():
    # the same check the driver's dryrun runs — kept in the suite so CI
    # catches regressions without the driver
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", __file__.rsplit("/tests/", 1)[0] + "/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
