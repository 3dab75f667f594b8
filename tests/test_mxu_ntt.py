"""MXU matmul NTT tile — bit-exactness against the radix-2 limb path.

The int8-digit matmul transform (ops/mxu_ntt.py) must produce the exact
same limb arrays as LimbField.ntt's host path for every field, direction,
and tile size it serves, including when the four-step recursion builds a
large transform as a tower of matmul tiles.
"""

import numpy as np
import pytest

from starkpack_winterfell_tpu.ops import mxu_ntt
from starkpack_winterfell_tpu.ops.limb_field import F62, F128


def _rand_limbs(field, shape, rng):
    vals = [int(v) % field.P for v in
            rng.integers(0, 1 << 63, size=int(np.prod(shape)) * 2, dtype=np.uint64)[::2]]
    limbs = field.from_ints(vals)
    return tuple(l.reshape(shape) for l in limbs)


@pytest.mark.parametrize("field", [F62, F128], ids=["f62", "f128"])
@pytest.mark.parametrize("m", [64, 128, 256])
@pytest.mark.parametrize("inverse", [False, True], ids=["fwd", "inv"])
def test_tile_matches_radix2(field, m, inverse):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(7 + m)
    a = _rand_limbs(field, (5, m), rng)
    want = field.ntt(a, inverse=inverse, scale=False)
    got = jax.jit(
        lambda x: mxu_ntt.ntt_tile(field, x, inverse)
    )(tuple(jnp.asarray(l) for l in a))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_numpy_path_matches():
    rng = np.random.default_rng(3)
    a = _rand_limbs(F62, (4, 64), rng)
    want = F62.ntt(a, inverse=False, scale=False)
    got = mxu_ntt.ntt_tile(F62, a, False)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_four_step_tower_dispatches_mxu(monkeypatch):
    """Full ntt() with the MXU engine on: n=4096 with SPLIT_CAP 64 forces a
    recursive four-step tower of matmul tiles; must equal the host path."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    a = _rand_limbs(F128, (256, 4096), rng)
    want = F128.ntt(a, inverse=False, scale=False)
    monkeypatch.setattr(mxu_ntt, "ENABLED", True)
    monkeypatch.setattr(mxu_ntt, "SPLIT_CAP", 64)
    monkeypatch.setattr(mxu_ntt, "MIN_BATCH", 1)
    got = jax.jit(
        lambda x: F128.ntt(x, inverse=False, scale=False)
    )(tuple(jnp.asarray(l) for l in a))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_inverse_roundtrip_with_scale(monkeypatch):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(13)
    a = _rand_limbs(F62, (200, 128), rng)
    monkeypatch.setattr(mxu_ntt, "ENABLED", True)
    monkeypatch.setattr(mxu_ntt, "MIN_BATCH", 1)

    def rt(x):
        y = F62.ntt(x, inverse=False)
        return F62.ntt(y, inverse=True)

    got = jax.jit(rt)(tuple(jnp.asarray(l) for l in a))
    for g, w in zip(got, a):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_goldilocks_tile_matches_f64_ntt():
    """GL64_LIMB adapter: the matmul tile on (lo, hi) gl64 pairs must equal
    ops/ntt.py's specialized Goldilocks transform."""
    import jax
    import jax.numpy as jnp

    from starkpack_winterfell_tpu.ops import gl64 as gl
    from starkpack_winterfell_tpu.ops import ntt
    from starkpack_winterfell_tpu.ops.limb_field import GL64_LIMB

    rng = np.random.default_rng(17)
    vals = rng.integers(0, gl.P, size=(6, 128), dtype=np.uint64)
    comps = (gl.from_u64(vals),)
    want = ntt.ntt_components(comps, inverse=False, scale=False)[0]
    got = jax.jit(
        lambda x: mxu_ntt.ntt_tile(GL64_LIMB, x, False)
    )(tuple(jnp.asarray(p) for p in comps[0]))
    np.testing.assert_array_equal(np.asarray(got[0]), want[0])
    np.testing.assert_array_equal(np.asarray(got[1]), want[1])


@pytest.mark.skipif(
    not __import__("os").environ.get("STARKPACK_SLOW_TESTS"),
    reason="full device prove with MXU tiles: XLA:CPU compile is minutes "
    "(verified byte-identical; run with STARKPACK_SLOW_TESTS=1)",
)
def test_device_prove_with_mxu_tiles_byte_identical(monkeypatch):
    """Full f128 device prove with the matmul engine on == host bytes."""
    from starkpack_winterfell_tpu import FieldExtension, ProofOptions, verify
    from starkpack_winterfell_tpu.crypto.hashers import Sha3_256
    from starkpack_winterfell_tpu.models.fib_multifield import get_fib_family

    air_cls, build, prover_cls, _ = get_fib_family("f128")
    options = ProofOptions(16, 8, 0, FieldExtension.NONE, 4, 3)
    traces = [build(64)]
    prover = prover_cls(options, Sha3_256)
    host = prover.prove(1, traces)
    monkeypatch.setattr(mxu_ntt, "ENABLED", True)
    monkeypatch.setattr(mxu_ntt, "MIN_BATCH", 1)
    monkeypatch.setattr(mxu_ntt, "MIN_TILE", 8)
    monkeypatch.setattr(mxu_ntt, "SPLIT_CAP", 32)
    dev = prover.prove(1, traces, device=True)
    assert dev.to_bytes() == host.to_bytes()
    assert verify(air_cls, dev, [prover.get_pub_inputs(t) for t in traces],
                  Sha3_256)


def test_mxu_matvec_tile_matches_deferred():
    """matvec_tile (int8 MXU matmul) == LimbField.matvec deferred path,
    canonical outputs, for f128/f62 MDS-like constant matrices."""
    import numpy as np

    from starkpack_winterfell_tpu.ops import mxu_ntt
    from starkpack_winterfell_tpu.ops.limb_field import F62, F128

    rng = np.random.default_rng(11)
    for field, w in ((F128, 6), (F62, 12), (F128, 3)):
        m_rows = [
            [int.from_bytes(rng.bytes(16), "little") % field.P
             for _ in range(w)]
            for _ in range(w)
        ]
        m_rows[0][1] = 0  # exercise a zero entry
        B = 160
        states = []
        for _ in range(w):
            vals = [int(rng.integers(0, 1 << 62)) % field.P for _ in range(B)]
            states.append(field.from_ints(vals))
        expected = field.matvec([list(s) for s in states], m_rows)
        got = mxu_ntt.matvec_tile(field, states, m_rows)
        for e, g in zip(expected, got):
            for el, gl_ in zip(e, g):
                np.testing.assert_array_equal(np.asarray(el), np.asarray(gl_))
