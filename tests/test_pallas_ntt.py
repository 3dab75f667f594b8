"""Pallas fused NTT kernel — interpreter-mode correctness on CPU (the real
kernel is exercised on TPU; bit-identical output verified there too)."""

import numpy as np
import pytest

from starkpack_winterfell_tpu.ops import gl64 as gl, ntt
from starkpack_winterfell_tpu.ops.pallas import ntt_kernel


@pytest.fixture(autouse=True)
def _interpret_mode():
    ntt_kernel.INTERPRET = True
    ntt_kernel._build_call.cache_clear()
    yield
    ntt_kernel.INTERPRET = False
    ntt_kernel._build_call.cache_clear()


def test_kernel_matches_reference_ntt():
    import jax.numpy as jnp

    rng = np.random.default_rng(91)
    n, lanes = 256, 128
    cols = rng.integers(0, gl.P, size=(lanes, n), dtype=np.uint64)
    pair = gl.from_u64(cols)
    want = ntt.ntt_components((pair,))[0]
    got = ntt_kernel.pallas_ntt_axis0(
        ((jnp.asarray(pair[0].T.copy()), jnp.asarray(pair[1].T.copy())),)
    )[0]
    assert np.array_equal(np.asarray(got[0]).T, want[0])
    assert np.array_equal(np.asarray(got[1]).T, want[1])


def test_batched_wrapper_roundtrip():
    import jax.numpy as jnp

    rng = np.random.default_rng(92)
    shape = (2, 64, 128)  # batch axes + transform axis (last)
    cols = rng.integers(0, gl.P, size=shape, dtype=np.uint64)
    pair = tuple(jnp.asarray(x) for x in gl.from_u64(cols))
    fwd = ntt_kernel.pallas_ntt_batched((pair,))[0]
    back = ntt_kernel.pallas_ntt_batched((fwd,), inverse=True)[0]
    assert np.array_equal(np.asarray(back[0]), np.asarray(pair[0]))
    assert np.array_equal(np.asarray(back[1]), np.asarray(pair[1]))
