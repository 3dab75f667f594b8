"""Gather-free four-step LDE pipeline (ops/pallas/ntt4.py) — interpreter-mode
bit-exactness vs the plain XLA NTT (the real kernels run on TPU; the TPU
output was also verified bit-identical there).

Semantics under test: interpolate_lde == ntt.interpolate_poly then
ntt.evaluate_poly_with_offset (fft/serial.rs:26-93); intt_permuted ==
interpolate_poly_with_offset (re-laid out); lde_from_permuted ==
evaluate_poly_with_offset; slice_columns_permuted == the composition
column split c[k*tl + t]."""

import numpy as np

from starkpack_winterfell_tpu.ops import gl64 as gl, ntt, vec
from starkpack_winterfell_tpu.ops.pallas import ntt4

N, BLOWUP, OFFSET = 1 << 14, 8, 7  # smallest n with a,b >= 128 lanes


def _unpermute(perm_u64: np.ndarray, a: int, b: int) -> np.ndarray:
    """(b, a) permuted layout -> natural length-a*b coefficient order."""
    rev_a = ntt._bit_rev_perm(a)
    rev_b = ntt._bit_rev_perm(b)
    j = np.arange(a * b)
    j1, j2 = j % a, j // a
    return perm_u64[rev_b[j2], rev_a[j1]]


def test_interpolate_lde_matches_host():
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    x = rng.integers(0, gl.P, size=(2, N), dtype=np.uint64)
    pair = tuple(jnp.asarray(v) for v in gl.from_u64(x))

    got = ntt4.interpolate_lde((pair,), BLOWUP, OFFSET, interpret=True)[0]

    host = gl.from_u64(x)
    coeffs = ntt.interpolate_poly((host,))[0]
    want = ntt.evaluate_poly_with_offset((coeffs,), OFFSET, BLOWUP)[0]
    assert np.array_equal(np.asarray(got[0]), want[0])
    assert np.array_equal(np.asarray(got[1]), want[1])


def test_intt_lde_columns_and_ood():
    """One pass over the whole composition-path primitive chain: coset evals
    -> true permuted coeffs -> column split -> per-column LDE, plus the
    permuted OOD dot product."""
    import jax.numpy as jnp

    rng = np.random.default_rng(8)
    L = N * BLOWUP
    num_cols = 4
    tl = N // num_cols
    x = rng.integers(0, gl.P, size=(1, N), dtype=np.uint64)
    pair = tuple(jnp.asarray(v) for v in gl.from_u64(x))

    # --- intt_permuted == interpolate_poly_with_offset, re-laid out ---
    pc = ntt4.intt_permuted((pair,), OFFSET, L, interpret=True)[0]
    c = ntt4.intt_consts(N, L, OFFSET, device=False)
    a, b = c["a"], c["b"]
    got_coeffs = _unpermute(
        gl.to_u64((np.asarray(pc[0][0]), np.asarray(pc[1][0]))), a, b
    )
    host = gl.from_u64(x[0])
    want_coeffs = gl.to_u64(ntt.interpolate_poly_with_offset((host,), OFFSET)[0])
    assert np.array_equal(got_coeffs, want_coeffs)

    # --- column split + per-column LDE == reshape + evaluate_poly_with_offset ---
    cols = ntt4.slice_columns_permuted((pc,), num_cols)
    stacked = tuple(
        (jnp.stack([col[0][0][0] for col in cols]),
         jnp.stack([col[0][1][0] for col in cols]))
        for _ in range(1)
    )
    col_lde = ntt4.lde_from_permuted(stacked, L, OFFSET, interpret=True)[0]
    want_cols = gl.from_u64(want_coeffs.reshape(num_cols, tl))
    want_lde = ntt.evaluate_poly_with_offset((want_cols,), OFFSET, L // tl)[0]
    assert np.array_equal(np.asarray(col_lde[0]), want_lde[0])
    assert np.array_equal(np.asarray(col_lde[1]), want_lde[1])

    # --- permuted power series: OOD dot == direct evaluation ---
    z = 0x1234567890ABCDEF % gl.P
    z_pair = (gl.from_int(z, (1,)),)
    z_dev = tuple((jnp.asarray(p[0]), jnp.asarray(p[1])) for p in z_pair)
    ps = ntt4.permuted_power_series(z_dev, N, a, b)
    dot = vec.vsum(vec.vsum(vec.vmul((pc,), ps), axis=-1), axis=-1)
    got_tz = int(gl.to_u64((np.asarray(dot[0][0]), np.asarray(dot[0][1])))[0])
    want_tz = 0
    acc = 1
    for cj in want_coeffs:
        want_tz = (want_tz + int(cj) * acc) % gl.P
        acc = (acc * z) % gl.P
    assert got_tz == want_tz
