"""Plane-sampling equivalence tests: packed vs reference bilerp."""
import jax
import numpy as np

from soccernerfs_tpu.ops.grid_sample import (
    sample_plane_bilinear,
    sample_plane_bilinear_packed,
)


def _data():
    plane = jax.random.normal(jax.random.PRNGKey(0), (17, 23, 8))
    coords = jax.random.uniform(jax.random.PRNGKey(1), (500, 2), minval=-1.2, maxval=1.2)
    return plane, coords


def test_packed_exact_fp32():
    plane, coords = _data()
    a = sample_plane_bilinear(plane, coords)
    b = sample_plane_bilinear_packed(plane, coords, gather_dtype=None)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    ga = jax.grad(lambda p: sample_plane_bilinear(p, coords).sum())(plane)
    gb = jax.grad(
        lambda p: sample_plane_bilinear_packed(p, coords, gather_dtype=None).sum()
    )(plane)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-4)


def test_packed_bf16_close():
    plane, coords = _data()
    a = sample_plane_bilinear(plane, coords)
    b = sample_plane_bilinear_packed(plane, coords)  # bf16 default
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2)
