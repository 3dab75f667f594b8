"""Differential tests for the fused Pallas limb-field NTT kernel
(ops/pallas/limb_kernel.py) against the plain-XLA/numpy LimbField.ntt,
run in Pallas interpreter mode on the CPU backend."""

import numpy as np
import pytest

from starkpack_winterfell_tpu.ops.limb_field import F62, F128
from starkpack_winterfell_tpu.ops.pallas import limb_kernel


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(limb_kernel, "INTERPRET", True)
    monkeypatch.setattr(limb_kernel, "ENABLED", True)


def _rand_elems(field, shape, seed):
    rng = np.random.default_rng(seed)
    flat = [int(rng.integers(0, 1 << 62)) % field.P for _ in range(int(np.prod(shape)))]
    limbs = field.from_ints(flat)
    return tuple(l.reshape(shape) for l in limbs)


@pytest.mark.parametrize("field", [F62, F128], ids=["f62", "f128"])
@pytest.mark.parametrize("inverse", [False, True], ids=["fwd", "inv"])
def test_kernel_matches_host_ntt(field, inverse):
    import jax.numpy as jnp

    n, batch = 512, 96  # exercises the lane-padding path (96 < 128)
    a = _rand_elems(field, (batch, n), seed=7 + field.n)
    want = field.ntt(a, inverse=inverse, scale=False)
    got = limb_kernel.ntt_last_axis(
        field, tuple(jnp.asarray(l) for l in a), inverse
    )
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_lde_cosets_capped_four_step(monkeypatch):
    """Coset LDE above the (shrunken) Pallas tile cap: _lde_cosets must
    split tiles with the same cap _ntt_four_step uses, and the kernel-run
    result must equal the host path bit for bit."""
    import jax.numpy as jnp

    field = F128
    monkeypatch.setitem(limb_kernel.MAX_TILE, 4, 256)
    monkeypatch.setattr(type(field), "PALLAS_MIN_N", 16)
    monkeypatch.setattr(type(field), "PALLAS_MIN_LANES", 8)
    n, blowup = 1024, 2
    a = _rand_elems(field, (3, n), seed=11)
    want = field.evaluate_poly_with_offset(a, field.GENERATOR, blowup)
    got = field.evaluate_poly_with_offset(
        tuple(jnp.asarray(l) for l in a), field.GENERATOR, blowup
    )
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_limbfield_ntt_dispatches_to_kernel(monkeypatch):
    """LimbField.ntt routes through the kernel on the jax path when enabled
    (thresholds lowered for the test) and stays byte-identical, including
    the inverse 1/n scaling."""
    import jax.numpy as jnp

    field = F62
    monkeypatch.setattr(type(field), "PALLAS_MIN_N", 256)
    monkeypatch.setattr(type(field), "PALLAS_MIN_LANES", 8)
    calls = []
    orig = limb_kernel.ntt_last_axis

    def spy(f, a, inverse, interpret=None):
        calls.append(a[0].shape)
        return orig(f, a, inverse, interpret)

    monkeypatch.setattr(limb_kernel, "ntt_last_axis", spy)
    a = _rand_elems(field, (16, 256), seed=3)
    want = field.ntt(a, inverse=True, scale=True)
    got = field.ntt(tuple(jnp.asarray(l) for l in a), inverse=True, scale=True)
    assert calls, "jax path did not dispatch to the Pallas kernel"
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), w)
