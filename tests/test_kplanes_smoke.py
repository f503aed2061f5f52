"""End-to-end smoke test of the K-Planes model forward + losses on CPU."""
import jax
import jax.numpy as jnp
import pytest

from soccernerfs_tpu.core.rays import RayBundle
from soccernerfs_tpu.models import kplanes


def tiny_config(dynamic=True):
    return kplanes.Config(
        spacetime_resolution=(8, 8, 8, 4) if dynamic else (8, 8, 8),
        feature_dim=4,
        multiscale_res=(1, 2),
        proposal_net_args_list=(
            {"feature_dim": 2, "resolution": (8, 8, 8, 4) if dynamic else (8, 8, 8)},
            {"feature_dim": 2, "resolution": (16, 16, 16, 4) if dynamic else (16, 16, 16)},
        ),
        num_proposal_samples_per_ray=(8, 6),
        num_nerf_samples_per_ray=4,
        sigma_net_hidden_dim=16,
        rgb_net_hidden_dim=16,
        disable_viewing_dependent=True,
    )


def make_rays(n=6, dynamic=True, rng=None):
    rng = rng or jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    origins = jax.random.uniform(k1, (n, 3), minval=-0.2, maxval=0.2)
    directions = jax.random.normal(k2, (n, 3))
    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    return RayBundle(
        origins=origins,
        directions=directions,
        pixel_area=jnp.full((n,), 1e-4),
        camera_indices=jnp.zeros((n,), jnp.int32),
        times=jnp.linspace(0, 1, n) if dynamic else None,
        directions_norm=jnp.ones((n,)),
    )


@pytest.mark.parametrize("dynamic", [True, False])
def test_forward_and_losses(dynamic):
    cfg = tiny_config(dynamic)
    rng = jax.random.PRNGKey(0)
    params = kplanes.init(rng, cfg, num_train_data=2)
    aabb = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    rays = make_rays(dynamic=dynamic)

    outputs = kplanes.get_outputs(
        cfg, params, aabb, rays, rng=jax.random.PRNGKey(1), train=True
    )
    assert outputs["rgb"].shape == (6, 3)
    assert outputs["accumulation"].shape == (6,)
    assert outputs["depth"].shape == (6,)
    assert outputs["median_rgb"].shape == (6, 3)
    assert jnp.all(jnp.isfinite(outputs["rgb"]))

    batch = {"image": jnp.zeros((6, 3)), "depth_image": jnp.ones((6,))}
    metrics = kplanes.get_metrics_dict(cfg, outputs, batch)
    loss_dict = kplanes.get_loss_dict(cfg, params, outputs, batch, metrics)
    expected = {"rgb_loss", "interlevel_loss", "distortion_loss", "space_tv_loss",
                "space_tv_proposal_loss", "depth_loss"}
    if dynamic:
        expected |= {"time_smoothness_loss", "sparse_transients_loss",
                     "time_smoothness_proposal_loss", "sparse_transients_proposal_loss"}
    assert expected <= set(loss_dict)
    for k, v in loss_dict.items():
        assert jnp.isfinite(v), k


def test_gradients_flow():
    cfg = tiny_config(True)
    params = kplanes.init(jax.random.PRNGKey(0), cfg, 2)
    aabb = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    rays = make_rays()
    batch = {"image": jnp.full((6, 3), 0.5)}

    def loss_fn(p):
        outputs = kplanes.get_outputs(
            cfg, p, aabb, rays, rng=jax.random.PRNGKey(1), train=True
        )
        ld = kplanes.get_loss_dict(cfg, p, outputs, batch, {})
        return sum(ld.values())

    grads = jax.grad(loss_fn)(params)
    # gradient reaches both param groups
    g_field = jax.tree_util.tree_leaves(grads["fields"])
    g_prop = jax.tree_util.tree_leaves(grads["proposal_networks"])
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in g_field)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in g_prop)


def test_proposal_schedules():
    cfg = tiny_config(True)
    a0 = kplanes.proposal_anneal(cfg, jnp.asarray(0))
    a_mid = kplanes.proposal_anneal(cfg, jnp.asarray(500))
    a1 = kplanes.proposal_anneal(cfg, jnp.asarray(10_000))
    assert float(a0) == 0.0
    assert 0.0 < float(a_mid) < 1.0
    assert float(a1) == 1.0

    updated, ssu = kplanes.proposal_update_decision(
        cfg, jnp.asarray(5), jnp.asarray(0)
    )
    assert bool(updated)  # step < 10 always updates
    assert int(ssu) == 0
