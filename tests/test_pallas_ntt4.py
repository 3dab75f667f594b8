"""Gather-free four-step LDE pipeline (ops/pallas/ntt4.py) — interpreter-mode
bit-exactness vs the plain XLA NTT (the real kernels run on TPU; the TPU
output was also verified bit-identical there).

Semantics under test: interpolate_lde == ntt.interpolate_poly then
ntt.evaluate_poly_with_offset (fft/serial.rs:26-93 equivalent)."""

import numpy as np

from starkpack_winterfell_tpu.ops import gl64 as gl, ntt
from starkpack_winterfell_tpu.ops.pallas import ntt4


def test_interpolate_lde_matches_host():
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    n, blowup, offset = 1 << 14, 8, 7  # smallest n with a,b >= 128 lanes
    x = rng.integers(0, gl.P, size=(2, n), dtype=np.uint64)
    pair = tuple(jnp.asarray(v) for v in gl.from_u64(x))

    got = ntt4.interpolate_lde((pair,), blowup, offset, interpret=True)[0]

    host = gl.from_u64(x)
    coeffs = ntt.interpolate_poly((host,))[0]
    want = ntt.evaluate_poly_with_offset((coeffs,), offset, blowup)[0]
    assert np.array_equal(np.asarray(got[0]), want[0])
    assert np.array_equal(np.asarray(got[1]), want[1])
