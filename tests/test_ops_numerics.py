"""Numerical golden-value tests for the ops library.

Covers what the reference tested (spacing functions, PDF correctness,
ref: tests/model_components/test_ray_sampler.py) plus the fork components
it left untested: interlevel/distortion/plane regularizers against
closed forms (SURVEY §4).
"""
import jax.numpy as jnp
import numpy as np

from soccernerfs_tpu.core.rays import RayBundle
from soccernerfs_tpu.ops import losses as L
from soccernerfs_tpu.ops.samplers import pdf_samples, spaced_samples
from soccernerfs_tpu.ops.searching import searchsorted


def make_bundle(n=4, near=1.0, far=5.0):
    return RayBundle(
        origins=jnp.zeros((n, 3)),
        directions=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3)),
        pixel_area=jnp.full((n,), 1e-4),
        nears=jnp.full((n,), near),
        fars=jnp.full((n,), far),
    )


def test_uniform_sampler_spacing():
    rb = make_bundle()
    s = spaced_samples(rb, 10, "uniform")
    np.testing.assert_allclose(np.asarray(s.starts[0]), np.linspace(1, 5, 11)[:-1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.deltas), 0.4, atol=1e-6)


def test_lindisp_sampler_spacing():
    rb = make_bundle(near=1.0, far=4.0)
    s = spaced_samples(rb, 2, "lindisp")
    # disparity midpoint between 1/1 and 1/4: 1/x = 0.625 -> x = 1.6
    assert abs(float(s.ends[0, 0]) - 1.6) < 1e-5


def test_piecewise_sampler_monotone():
    rb = make_bundle(near=0.5, far=100.0)
    s = spaced_samples(rb, 32, "piecewise")
    starts = np.asarray(s.starts[0])
    assert np.all(np.diff(starts) > 0)
    assert starts[0] >= 0.5 and float(s.ends[0, -1]) <= 100.0 + 1e-3


def test_pdf_sampler_concentrates_mass():
    """Samples should land inside the high-weight bin."""
    rb = make_bundle(n=2)
    base = spaced_samples(rb, 8, "uniform")
    weights = jnp.zeros((2, 8)).at[:, 3].set(1.0)
    out = pdf_samples(rb, base, weights, 16, include_original=False,
                      histogram_padding=0.0)
    mids = np.asarray(out.midpoints())
    # bin 3 spans [2.5, 3.0] in euclidean distance
    frac_inside = np.mean((mids >= 2.45) & (mids <= 3.05))
    assert frac_inside > 0.9


def test_searchsorted_matches_numpy():
    rng = np.random.default_rng(0)
    a = np.sort(rng.random((5, 20)), axis=-1)
    v = rng.random((5, 7))
    for side in ("left", "right"):
        ours = np.asarray(searchsorted(jnp.asarray(a), jnp.asarray(v), side))
        ref = np.stack([np.searchsorted(a[i], v[i], side=side) for i in range(5)])
        np.testing.assert_array_equal(ours, ref)


def test_get_weights_closed_form():
    """Constant density sigma: w_i = exp(-sigma d (i)) - exp(-sigma d (i+1))."""
    rb = make_bundle(n=1, near=0.0, far=1.0)
    s = spaced_samples(rb, 4, "uniform")
    sigma = 2.0
    w = np.asarray(s.get_weights(jnp.full((1, 4), sigma)))[0]
    d = 0.25
    expected = [np.exp(-sigma * d * i) - np.exp(-sigma * d * (i + 1)) for i in range(4)]
    np.testing.assert_allclose(w, expected, atol=1e-6)


def test_distortion_loss_single_bin():
    """One unit-weight bin: loss_inter = 0 + intra = w^2 * width / 3."""
    rb = make_bundle(n=1, near=0.0, far=1.0)
    s = spaced_samples(rb, 4, "uniform")
    w = jnp.zeros((1, 4)).at[0, 1].set(1.0)
    loss = float(L.distortion_loss([w], [s]))
    np.testing.assert_allclose(loss, 0.25 / 3.0, atol=1e-6)


def test_interlevel_zero_when_consistent():
    """Proposal == final histogram -> the bound holds -> zero loss."""
    rb = make_bundle(n=2, near=0.0, far=1.0)
    s = spaced_samples(rb, 8, "uniform")
    w = jnp.full((2, 8), 0.1)
    loss = float(L.interlevel_loss([w, w], [s, s]))
    assert loss < 1e-10


def test_interlevel_positive_when_violated():
    rb = make_bundle(n=2, near=0.0, far=1.0)
    s = spaced_samples(rb, 8, "uniform")
    w_final = jnp.zeros((2, 8)).at[:, 4].set(1.0)
    w_prop = jnp.zeros((2, 8)).at[:, 0].set(1.0)  # proposal misses the mass
    loss = float(L.interlevel_loss([w_prop, w_final], [s, s]))
    assert loss > 0.1


def test_plane_tv_closed_form():
    """Linear ramp plane: h-diffs constant c -> h_tv = c^2; w_tv = 0."""
    H, W, F = 5, 4, 2
    ramp = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32)[:, None, None] * 0.5, (H, W, F))
    tv = float(L.compute_plane_tv(ramp))
    np.testing.assert_allclose(tv, 0.25, atol=1e-6)
    assert float(L.compute_plane_tv(ramp, only_w=True)) == 0.0


def test_plane_smoothness_zero_for_linear():
    H, W, F = 6, 3, 2
    ramp = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32)[:, None, None], (H, W, F))
    assert float(L.compute_plane_smoothness(ramp)) < 1e-10
    quad = ramp**2
    assert float(L.compute_plane_smoothness(quad)) > 0.5


def test_sparse_transients_identity_planes():
    grids = [[jnp.ones((4, 4, 2))] * 6]
    assert float(L.sparse_transients_loss(grids)) == 0.0
    grids = [[jnp.full((4, 4, 2), 2.0)] * 6]
    np.testing.assert_allclose(float(L.sparse_transients_loss(grids)), 3.0, atol=1e-6)


def test_ds_nerf_depth_loss_prefers_correct_depth():
    rb = make_bundle(n=1, near=0.0, far=2.0)
    s = spaced_samples(rb, 16, "uniform")
    depth_gt = jnp.asarray([1.0])
    steps = np.asarray(s.midpoints())[0]
    good_idx = int(np.argmin(np.abs(steps - 1.0)))
    w_good = jnp.zeros((1, 16)).at[0, good_idx].set(1.0)
    w_bad = jnp.zeros((1, 16)).at[0, 0].set(1.0)
    args = dict(termination_depth=depth_gt, predicted_depth=depth_gt,
                sigma=0.05, directions_norm=jnp.ones((1,)), is_euclidean=True)
    good = float(L.depth_loss(w_good, s, depth_loss_type="ds_nerf", **args))
    bad = float(L.depth_loss(w_bad, s, depth_loss_type="ds_nerf", **args))
    assert good < bad


def test_scene_contraction_norms():
    from soccernerfs_tpu.core.math import scene_contraction

    inside = jnp.asarray([[0.3, -0.2, 0.1]])
    np.testing.assert_allclose(np.asarray(scene_contraction(inside)), np.asarray(inside))
    far = jnp.asarray([[100.0, 0.0, 0.0]])
    out = np.asarray(scene_contraction(far, order=jnp.inf))
    np.testing.assert_allclose(out[0, 0], 2.0 - 1.0 / 100.0, atol=1e-6)


def test_intersect_aabb():
    from soccernerfs_tpu.core.math import intersect_aabb

    aabb = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    origins = jnp.asarray([[0.0, 0.0, -5.0]])
    dirs = jnp.asarray([[0.0, 0.0, 1.0]])
    nears, fars = intersect_aabb(origins, dirs, aabb)
    np.testing.assert_allclose(float(nears[0]), 4.0, atol=1e-4)
    np.testing.assert_allclose(float(fars[0]), 6.0, atol=1e-4)


def test_sh_orthonormality():
    """Monte-Carlo: int Y_i Y_j over the sphere ≈ delta_ij."""
    from soccernerfs_tpu.core.math import components_from_spherical_harmonics

    rng = np.random.default_rng(0)
    d = rng.normal(size=(200000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    Y = np.asarray(components_from_spherical_harmonics(3, jnp.asarray(d)))
    gram = (Y.T @ Y) / d.shape[0] * 4 * np.pi
    np.testing.assert_allclose(gram, np.eye(9), atol=0.15)


def test_ssim_matches_float64_reference():
    """SSIM against a direct float64 numpy implementation (same 11x11
    sigma=1.5 window, valid-interior mean).  The jax version runs its
    window convs at Precision.HIGHEST — at the TPU default (bf16 convs)
    the E[x^2] - mu^2 variance terms cancel catastrophically and SSIM
    comes out wrong by up to 0.2, including impossible values > 1
    (found via the r5 CPU-vs-TPU quality A/B; ref metric of record:
    models/kplanes.py:473)."""
    from scipy.signal import convolve2d

    from soccernerfs_tpu.utils.metrics import ssim

    rng = np.random.default_rng(3)
    h = w = 48
    base = rng.uniform(0.3, 0.7, (h, w, 3))
    pred = np.clip(base + rng.normal(0, 0.02, base.shape), 0, 1)

    x = np.arange(11, dtype=np.float64) - 5
    g = np.exp(-(x**2) / (2 * 1.5**2))
    g /= g.sum()
    win = np.outer(g, g)

    def filt(img):
        return np.stack(
            [convolve2d(img[:, :, c], win, mode="valid") for c in range(3)],
            axis=-1)

    mu_x, mu_y = filt(pred), filt(base)
    var_x = filt(pred * pred) - mu_x**2
    var_y = filt(base * base) - mu_y**2
    cov = filt(pred * base) - mu_x * mu_y
    c1, c2 = 0.01**2, 0.03**2
    ref = np.mean((2 * mu_x * mu_y + c1) * (2 * cov + c2)
                  / ((mu_x**2 + mu_y**2 + c1) * (var_x + var_y + c2)))

    got = float(ssim(jnp.asarray(pred, jnp.float32),
                     jnp.asarray(base, jnp.float32)))
    assert got <= 1.0 + 1e-6, f"SSIM {got} > 1 is impossible"
    np.testing.assert_allclose(got, ref, atol=2e-5)
