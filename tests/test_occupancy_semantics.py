"""Numerical validation of the occupancy probe/select sampler against
nerfacc semantics (ref: nerfacc ray marching via VolumetricSampler,
ray_samplers.py:426-507; grid update models/instant_ngp.py:144-162).

The fixed-shape redesign (probe T equally spaced points, keep the first S
occupied) must produce exactly the sample support nerfacc's marcher
would: samples only inside occupied cells, in traversal order, masked
when a ray crosses fewer than S occupied probes.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from soccernerfs_tpu.core.rays import RayBundle
from soccernerfs_tpu.ops import occupancy as occ


def _bundle(origins, dirs, nears, fars):
    n = origins.shape[0]
    return RayBundle(
        origins=jnp.asarray(origins, jnp.float32),
        directions=jnp.asarray(dirs, jnp.float32),
        pixel_area=jnp.full((n,), 1e-4),
        camera_indices=jnp.zeros((n,), jnp.int32),
        nears=jnp.asarray(nears, jnp.float32),
        fars=jnp.asarray(fars, jnp.float32),
    )


def _reference_selection(occupied, T, S):
    """numpy oracle: indices of the first S occupied probes per ray."""
    n = occupied.shape[0]
    sel = np.zeros((n, S), np.int64)
    valid = np.zeros((n, S), bool)
    for i in range(n):
        hits = np.nonzero(occupied[i])[0]
        k = min(S, len(hits))
        sel[i, :k] = hits[:k]
        valid[i, :k] = True
    return sel, valid


def test_sample_support_matches_occupied_cells():
    """Samples land exactly on the first S occupied probe intervals, in
    traversal order, with the validity mask marking rays that run out."""
    cfg = occ.OccupancyGridConfig(resolution=16)
    aabb = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    # occupied slab: x in [0, 0.5)
    r = cfg.resolution
    cells = np.arange(r**3)
    xs = cells // (r * r)
    binary = jnp.asarray((xs >= 8) & (xs < 12))  # x cell in [0, 0.5)

    rng = np.random.default_rng(0)
    n, T, S = 64, 48, 8
    origins = np.tile(np.array([[-2.0, 0.0, 0.0]]), (n, 1))
    origins[:, 1:] = rng.uniform(-0.9, 0.9, (n, 2))
    dirs = np.tile(np.array([[1.0, 0.0, 0.0]]), (n, 1))
    bundle = _bundle(origins, dirs, np.full(n, 1.0), np.full(n, 3.0))

    samples, valid = occ.volumetric_sample(
        cfg, binary, bundle, aabb, num_probes=T, max_samples_per_ray=S
    )

    # oracle occupancy per probe
    t_edges = 1.0 + np.linspace(0, 1, T + 1)[None] * 2.0
    t_mid = (t_edges[:, :-1] + t_edges[:, 1:]) / 2
    pos = origins[:, None, :] + dirs[:, None, :] * t_mid[..., None]
    occ_np = np.asarray(
        occ.occupancy_lookup(cfg, binary, aabb, jnp.asarray(pos, jnp.float32))
    )
    sel_ref, valid_ref = _reference_selection(occ_np, T, S)

    starts = np.asarray(samples.starts)
    np.testing.assert_array_equal(np.asarray(valid), valid_ref)
    # where valid, the selected interval must be the oracle's probe interval
    expect_starts = np.take_along_axis(
        np.broadcast_to(t_edges[:, :-1], (n, T)), sel_ref, axis=-1
    )
    np.testing.assert_allclose(
        starts[valid_ref], expect_starts[valid_ref], atol=1e-5
    )
    # samples are inside the occupied slab
    mids = (starts + np.asarray(samples.ends)) / 2
    x_at = origins[:, :1] + mids * dirs[:, :1]
    assert np.all((x_at[valid_ref] >= 0.0) & (x_at[valid_ref] < 0.5 + 1e-5))


def test_miss_rays_fully_masked():
    cfg = occ.OccupancyGridConfig(resolution=8)
    aabb = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    binary = jnp.zeros((8**3,), bool).at[0].set(True)  # one corner cell
    bundle = _bundle(
        np.array([[2.0, 2.0, 2.0]]), np.array([[1.0, 0.0, 0.0]]),
        np.array([0.1]), np.array([1.0]),
    )
    _, valid = occ.volumetric_sample(
        cfg, binary, bundle, aabb, num_probes=32, max_samples_per_ray=4
    )
    assert not bool(np.asarray(valid).any())


def test_ema_update_and_binarize_properties():
    """EMA decay + max with new density, binarize at min(mean, threshold)
    (nerfacc OccGridEstimator._update semantics)."""
    cfg = occ.OccupancyGridConfig(resolution=4, ema_decay=0.95, occ_threshold=0.01)
    aabb = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
    occs = jnp.full((4**3,), 0.2)

    # zero density everywhere: pure decay
    out = occ.update_occupancy_grid(
        cfg, occs, aabb, lambda p: jnp.zeros(p.shape[0]), jax.random.PRNGKey(0),
        render_step_size=0.1,
    )
    np.testing.assert_allclose(np.asarray(out), 0.2 * 0.95, rtol=1e-6)

    # high density in x<0.5 halfspace: those cells jump to density*step
    def dens(p):
        return jnp.where(p[:, 0] < 0.5, 50.0, 0.0)

    out2 = occ.update_occupancy_grid(
        cfg, occs, aabb, dens, jax.random.PRNGKey(1), render_step_size=0.1
    )
    out2 = np.asarray(out2)
    assert out2.max() == pytest.approx(5.0)
    assert out2.min() == pytest.approx(0.19)

    # binarize: threshold = min(mean, occ_threshold)
    occs3 = jnp.asarray(np.linspace(0, 0.02, 4**3, dtype=np.float32))
    b = np.asarray(occ.occupancy_binary(cfg, occs3))
    thresh = min(float(occs3.mean()), 0.01)
    np.testing.assert_array_equal(b, np.asarray(occs3) > thresh)


def test_warmup_vs_sampled_cell_updates():
    """nerfacc warmup split (ref: OccGridEstimator.update_every_n_steps /
    _sample_uniform_and_occupied_cells): step < warmup probes EVERY cell
    (same result as the step-less call); afterwards only n_cells//4 are
    probed — unprobed cells keep their EMA untouched — with half the
    draws biased to currently occupied cells."""
    cfg = occ.OccupancyGridConfig(
        resolution=8, ema_decay=0.95, occ_threshold=0.01, warmup_steps=256
    )
    n_cells = 8**3
    aabb = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
    occs = jnp.asarray(
        np.random.default_rng(0).uniform(0.0, 0.05, n_cells).astype(np.float32)
    )
    dens = lambda p: jnp.full((p.shape[0],), 3.0)  # noqa: E731
    key = jax.random.PRNGKey(3)

    # warmup: identical to the all-cells (step=None) update
    full = occ.update_occupancy_grid(
        cfg, occs, aabb, dens, key, render_step_size=0.1
    )
    warm = occ.update_occupancy_grid(
        cfg, occs, aabb, dens, key, render_step_size=0.1,
        step=jnp.asarray(10),
    )
    np.testing.assert_array_equal(np.asarray(full), np.asarray(warm))
    np.testing.assert_allclose(np.asarray(full), 0.3, rtol=1e-6)

    # post-warmup: at most n_cells//4 distinct cells change, the rest
    # are bit-identical; every changed cell shows the probe's density
    out = np.asarray(
        occ.update_occupancy_grid(
            cfg, occs, aabb, dens, key, render_step_size=0.1,
            step=jnp.asarray(500),
        )
    )
    changed = out != np.asarray(occs)
    assert 0 < changed.sum() <= n_cells // 4
    np.testing.assert_allclose(out[changed], 0.3, rtol=1e-6)

    # occupied bias: with a quarter of cells occupied, the occupied half
    # of the draw concentrates there — occupied cells must be probed at
    # a clearly higher rate than empty ones
    occs_bias = jnp.zeros((n_cells,)).at[: n_cells // 4].set(1.0)
    out_b = np.asarray(
        occ.update_occupancy_grid(
            cfg, occs_bias, aabb, dens, jax.random.PRNGKey(11),
            render_step_size=0.1, step=jnp.asarray(500),
        )
    )
    changed_b = out_b != np.asarray(occs_bias)
    occ_rate = changed_b[: n_cells // 4].mean()
    emp_rate = changed_b[n_cells // 4 :].mean()
    assert occ_rate > 2.0 * emp_rate
