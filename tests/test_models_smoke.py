"""Per-model smoke tests: forward + losses + grads on tiny configs.

Mirrors the reference's test_train.py pattern of touching every method
(SURVEY §4.1) at unit granularity.
"""
import jax
import jax.numpy as jnp

from soccernerfs_tpu.core.rays import RayBundle
from soccernerfs_tpu.models import nerfacto, nerfplayer_nerfacto


def make_rays(n=6, with_times=True):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    dirs = jax.random.normal(k2, (n, 3))
    return RayBundle(
        origins=jax.random.uniform(k1, (n, 3), minval=-0.3, maxval=0.3),
        directions=dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True),
        pixel_area=jnp.full((n,), 1e-4),
        camera_indices=jnp.zeros((n,), jnp.int32),
        times=jnp.linspace(0, 1, n) if with_times else None,
        directions_norm=jnp.ones((n,)),
    )


AABB = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])


def _run_model(model, cfg, rays, batch):
    params = model.init(jax.random.PRNGKey(0), cfg, num_train_data=3)
    aux = model.init_aux(cfg)
    sched, aux2 = model.schedules(cfg, jnp.asarray(0), aux)

    def loss_fn(p):
        outputs = model.get_outputs(
            cfg, p, AABB, rays, rng=jax.random.PRNGKey(1), train=True, **sched
        )
        metrics = model.get_metrics_dict(cfg, outputs, batch, 0)
        ld = model.get_loss_dict(
            cfg, p, outputs, batch, metrics, train=True, rng=jax.random.PRNGKey(2)
        )
        return sum(jnp.asarray(v) for v in ld.values()), (outputs, ld)

    (loss, (outputs, ld)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert jnp.isfinite(loss)
    assert outputs["rgb"].shape == (rays.origins.shape[0], 3)
    leaves = jax.tree_util.tree_leaves(grads)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in leaves)
    return outputs, ld


def test_nerfacto_smoke():
    cfg = nerfacto.Config(
        num_levels=4,
        max_res=64,
        log2_hashmap_size=10,
        num_proposal_samples_per_ray=(12, 8),
        num_nerf_samples_per_ray=6,
        hidden_dim=16,
        hidden_dim_color=16,
        proposal_net_args_list=(
            {"hidden_dim": 8, "log2_hashmap_size": 9, "num_levels": 3, "max_res": 32},
            {"hidden_dim": 8, "log2_hashmap_size": 9, "num_levels": 3, "max_res": 64},
        ),
    )
    rays = make_rays(with_times=False)
    batch = {"image": jnp.full((6, 3), 0.4)}
    outputs, ld = _run_model(nerfacto, cfg, rays, batch)
    assert {"rgb_loss", "interlevel_loss", "distortion_loss"} <= set(ld)


def test_nerfacto_predict_normals():
    cfg = nerfacto.Config(
        num_levels=3, max_res=32, log2_hashmap_size=9,
        num_proposal_samples_per_ray=(8,), num_proposal_iterations=1,
        num_nerf_samples_per_ray=4, hidden_dim=16, hidden_dim_color=16,
        predict_normals=True,
        proposal_net_args_list=(
            {"hidden_dim": 8, "log2_hashmap_size": 9, "num_levels": 3, "max_res": 32},
        ),
    )
    rays = make_rays(with_times=False)
    batch = {"image": jnp.full((6, 3), 0.4)}
    outputs, ld = _run_model(nerfacto, cfg, rays, batch)
    assert "orientation_loss" in ld and "pred_normal_loss" in ld
    assert outputs["normals"].shape == (6, 3)


def test_nerfplayer_nerfacto_smoke():
    cfg = nerfplayer_nerfacto.Config(
        num_levels=4,
        log2_hashmap_size=10,
        temporal_dim=4,
        num_proposal_samples_per_ray=(12, 8),
        num_nerf_samples_per_ray=6,
        hidden_dim=16,
        hidden_dim_color=16,
        disable_scene_contraction=True,
        proposal_net_args_list=(
            {"hidden_dim": 8, "temporal_dim": 4, "log2_hashmap_size": 9, "num_levels": 3, "max_res": 32},
            {"hidden_dim": 8, "temporal_dim": 4, "log2_hashmap_size": 9, "num_levels": 3, "max_res": 64},
        ),
    )
    rays = make_rays(with_times=True)
    batch = {"image": jnp.full((6, 3), 0.4), "depth_image": jnp.ones((6,))}
    outputs, ld = _run_model(nerfplayer_nerfacto, cfg, rays, batch)
    assert {"rgb_loss", "interlevel_loss", "distortion_loss", "temporal_tv_loss",
            "depth_loss"} <= set(ld)


def test_instant_ngp_smoke():
    from soccernerfs_tpu.models import instant_ngp

    cfg = instant_ngp.Config(
        max_res=64, log2_hashmap_size=10, grid_resolution=16,
        max_num_samples_per_ray=8, num_probes_per_ray=32,
        contraction_type="aabb",
    )
    rays = make_rays(with_times=False)
    batch = {"image": jnp.full((6, 3), 0.4)}
    params = instant_ngp.init(jax.random.PRNGKey(0), cfg, 3)
    aux = instant_ngp.init_aux(cfg)
    sched, aux = instant_ngp.schedules(cfg, jnp.asarray(0), aux)

    def loss_fn(p):
        outputs = instant_ngp.get_outputs(
            cfg, p, AABB, rays, rng=jax.random.PRNGKey(1), train=True, **sched
        )
        ld = instant_ngp.get_loss_dict(cfg, p, outputs, batch, None)
        return sum(ld.values()), outputs

    (loss, outputs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert jnp.isfinite(loss)
    assert outputs["rgb"].shape == (6, 3)
    # occupancy update runs and changes the grid
    aux2 = instant_ngp.update_aux(cfg, params, AABB, jnp.asarray(0), aux, jax.random.PRNGKey(5))
    assert aux2["occs"].shape == aux["occs"].shape
    # empty grid at init -> all-true fallback in schedules not used; with
    # all-unoccupied binary grid, rays have no valid samples
    sched0, _ = instant_ngp.schedules(cfg, jnp.asarray(0), {"occs": jnp.zeros_like(aux["occs"])})
    o0 = instant_ngp.get_outputs(cfg, params, AABB, rays, rng=jax.random.PRNGKey(1), train=True, **sched0)
    assert not bool(jnp.any(o0["alive_ray_mask"]))


def test_nerfplayer_full_smoke():
    from soccernerfs_tpu import models
    nerfplayer = models.get_model("nerfplayer")

    cfg = nerfplayer.Config(
        num_levels=3, log2_hashmap_size=9, temporal_dim=4,
        num_proposal_samples_per_ray=(12, 8), num_nerf_samples_per_ray=6,
        disable_scene_contraction=True,
        proposal_net_args_list=(
            {"hidden_dim": 8, "temporal_dim": 4, "log2_hashmap_size": 9, "num_levels": 3, "max_res": 32},
            {"hidden_dim": 8, "temporal_dim": 4, "log2_hashmap_size": 9, "num_levels": 3, "max_res": 64},
        ),
    )
    rays = make_rays(with_times=True)
    batch = {"image": jnp.full((6, 3), 0.4), "depth_image": jnp.ones((6,))}
    outputs, ld = _run_model(nerfplayer, cfg, rays, batch)
    assert outputs["probs"].shape == (6, 3)
    assert {"rgb_loss", "interlevel_loss", "distortion_loss", "temporal_tv_loss",
            "prob_loss", "depth_loss"} <= set(ld)


def test_nerfplayer_ngp_smoke():
    from soccernerfs_tpu.models import nerfplayer_ngp

    cfg = nerfplayer_ngp.Config(
        num_levels=3, log2_hashmap_size=9, temporal_dim=4, max_res=64,
        grid_resolution=16, max_num_samples_per_ray=8, num_probes_per_ray=32,
    )
    rays = make_rays(with_times=True)
    batch = {"image": jnp.full((6, 3), 0.4), "depth_image": jnp.ones((6,))}
    params = nerfplayer_ngp.init(jax.random.PRNGKey(0), cfg, 3)
    aux = nerfplayer_ngp.init_aux(cfg)
    sched, aux = nerfplayer_ngp.schedules(cfg, jnp.asarray(0), aux)

    def loss_fn(p):
        outputs = nerfplayer_ngp.get_outputs(
            cfg, p, AABB, rays, rng=jax.random.PRNGKey(1), train=True, **sched
        )
        ld = nerfplayer_ngp.get_loss_dict(
            cfg, p, outputs, batch, None, rng=jax.random.PRNGKey(2)
        )
        return sum(ld.values()), ld

    (loss, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert jnp.isfinite(loss)
    assert {"rgb_loss", "depth_loss", "temporal_tv_loss"} <= set(ld)


def test_neus_smoke():
    from soccernerfs_tpu.models import neus
    from soccernerfs_tpu.fields.sdf import SDFFieldConfig

    cfg = neus.Config(
        num_samples=8, num_samples_importance=8, num_upsample_steps=2,
        sdf_field=SDFFieldConfig(num_layers=3, hidden_dim=32, geo_feat_dim=16,
                                 num_layers_color=2, hidden_dim_color=32),
    )
    rays = make_rays(with_times=False)
    batch = {"image": jnp.full((6, 3), 0.4)}
    params = neus.init(jax.random.PRNGKey(0), cfg, 3)

    def loss_fn(p):
        outputs = neus.get_outputs(cfg, p, AABB, rays, rng=jax.random.PRNGKey(1), train=True)
        ld = neus.get_loss_dict(cfg, p, outputs, batch, None)
        return sum(ld.values()), (outputs, ld)

    (loss, (outputs, ld)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert jnp.isfinite(loss)
    assert "eikonal_loss" in ld
    assert outputs["normals"].shape == (6, 3)
    # geometric init: sdf near a sphere of radius `bias`
    from soccernerfs_tpu.fields.sdf import sdf_value
    center_sdf = float(sdf_value(cfg.sdf_field, params["fields"], jnp.zeros((1, 3)))[0])
    assert center_sdf < 0  # inside the init sphere


def test_semantic_nerfw_smoke():
    from soccernerfs_tpu.models import semantic_nerfw

    cfg = semantic_nerfw.Config(
        num_levels=3, max_res=32, log2_hashmap_size=9,
        num_proposal_samples_per_ray=(8, 6), num_nerf_samples_per_ray=4,
        hidden_dim=16, hidden_dim_color=16, num_semantic_classes=5,
        proposal_net_args_list=(
            {"hidden_dim": 8, "log2_hashmap_size": 9, "num_levels": 3, "max_res": 16},
            {"hidden_dim": 8, "log2_hashmap_size": 9, "num_levels": 3, "max_res": 32},
        ),
    )
    rays = make_rays(with_times=False)
    batch = {
        "image": jnp.full((6, 3), 0.4),
        "semantics": jnp.asarray([0, 1, 2, 3, 4, 0]),
    }
    outputs, ld = _run_model(semantic_nerfw, cfg, rays, batch)
    assert outputs["semantics"].shape == (6, 5)
    assert "semantics_loss" in ld
