"""Nerfacto model (ref: models/nerfacto.py:66-376).

Hash field + proposal sampling + contraction + appearance embeddings;
optional density-gradient/predicted normals with orientation and
pred-normal losses.  Same functional protocol as models/kplanes.py.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from soccernerfs_tpu.core.rays import RayBundle, RaySamples
from soccernerfs_tpu.fields.nerfacto import (
    HashMLPDensityFieldConfig,
    NerfactoFieldConfig,
    hash_density_field_density,
    init_hash_density_field,
    init_nerfacto_field,
    nerfacto_density,
    nerfacto_normals,
    nerfacto_pred_normals,
    nerfacto_rgb,
)
from soccernerfs_tpu.models import kplanes as _kp
from soccernerfs_tpu.ops import losses as L
from soccernerfs_tpu.ops.rendering import (
    render_accumulation,
    render_depth,
    render_normals,
    render_rgb,
)
from soccernerfs_tpu.ops.samplers import proposal_sample


@dataclass(frozen=True)
class Config:
    """(ref: models/nerfacto.py:66-131)."""

    near_plane: float = 0.05
    far_plane: float = 1000.0
    background_color: str = "black"
    hidden_dim: int = 64
    hidden_dim_color: int = 64
    num_levels: int = 16
    max_res: int = 2048
    log2_hashmap_size: int = 19
    num_proposal_samples_per_ray: Tuple[int, ...] = (256, 96)
    num_nerf_samples_per_ray: int = 48
    proposal_update_every: int = 5
    proposal_warmup: int = 5000
    num_proposal_iterations: int = 2
    use_same_proposal_network: bool = False
    proposal_net_args_list: Tuple = (
        {"hidden_dim": 16, "log2_hashmap_size": 17, "num_levels": 5, "max_res": 128},
        {"hidden_dim": 16, "log2_hashmap_size": 17, "num_levels": 5, "max_res": 256},
    )
    proposal_initial_sampler: str = "piecewise"
    interlevel_loss_mult: float = 1.0
    distortion_loss_mult: float = 0.002
    orientation_loss_mult: float = 0.0001
    pred_normal_loss_mult: float = 0.001
    use_proposal_weight_anneal: bool = True
    use_average_appearance_embedding: bool = True
    proposal_weights_anneal_slope: float = 10.0
    proposal_weights_anneal_max_num_iters: int = 1000
    use_single_jitter: bool = True
    predict_normals: bool = False
    disable_scene_contraction: bool = False
    appearance_embedding_dim: int = 32
    eval_num_rays_per_chunk: int = 1 << 15

    def __post_init__(self):
        def freeze(v):
            if isinstance(v, dict):
                return tuple(sorted((k, freeze(x)) for k, x in v.items()))
            if isinstance(v, (list, tuple)):
                return tuple(freeze(x) for x in v)
            return v

        object.__setattr__(self, "proposal_net_args_list", freeze(self.proposal_net_args_list))
        object.__setattr__(
            self, "num_proposal_samples_per_ray", tuple(self.num_proposal_samples_per_ray)
        )

    def field_config(self, num_images: int = 0) -> NerfactoFieldConfig:
        return NerfactoFieldConfig(
            hidden_dim=self.hidden_dim,
            hidden_dim_color=self.hidden_dim_color,
            num_levels=self.num_levels,
            max_res=self.max_res,
            log2_hashmap_size=self.log2_hashmap_size,
            appearance_embedding_dim=self.appearance_embedding_dim,
            use_average_appearance_embedding=self.use_average_appearance_embedding,
            use_pred_normals=self.predict_normals,
            disable_scene_contraction=self.disable_scene_contraction,
            num_images=num_images,
        )

    def density_field_configs(self):
        n = self.num_proposal_iterations
        args = [dict(a) for a in self.proposal_net_args_list]
        if self.use_same_proposal_network:
            indices = [0] * n
            args = args[:1]
        else:
            indices = [min(i, len(args) - 1) for i in range(n)]
        built = {}
        for i in indices:
            if i not in built:
                a = dict(args[i])
                a.pop("use_linear", None)
                built[i] = HashMLPDensityFieldConfig(
                    disable_scene_contraction=self.disable_scene_contraction, **a
                )
        return [(i, built[i]) for i in indices]


def init(rng: jax.Array, cfg: Config, num_train_data: int = 0) -> dict:
    k_field, k_prop = jax.random.split(rng)
    fields = init_nerfacto_field(k_field, cfg.field_config(num_train_data))
    prop_params = {}
    keys = jax.random.split(k_prop, cfg.num_proposal_iterations)
    for (idx, dcfg), key in zip(cfg.density_field_configs(), keys):
        name = f"proposal_{idx}"
        if name not in prop_params:
            prop_params[name] = init_hash_density_field(key, dcfg)
    return {"fields": fields, "proposal_networks": prop_params}


def init_aux(cfg: Config) -> dict:
    return {"steps_since_update": jnp.asarray(0, jnp.int32)}


def schedules(cfg: Config, step, aux):
    anneal = _kp.proposal_anneal(cfg, step)
    updated, ssu = _kp.proposal_update_decision(cfg, step, aux["steps_since_update"])
    return (
        {"anneal": anneal, "train_proposal_networks": updated},
        {"steps_since_update": ssu},
    )


def host_static_kwargs(cfg: Config, step: int, host_state: dict) -> dict:
    """Static proposal-update decision (see kplanes.host_static_kwargs)."""
    return _kp.host_static_kwargs(cfg, step, host_state)


def get_outputs(
    cfg: Config,
    params: dict,
    aabb: jnp.ndarray,
    ray_bundle: RayBundle,
    rng: Optional[jax.Array] = None,
    train: bool = True,
    anneal=1.0,
    train_proposal_networks=True,
) -> dict:
    """(ref: models/nerfacto.py:237-303)."""
    if ray_bundle.nears is None:
        n = ray_bundle.origins.shape[0]
        ray_bundle = ray_bundle.replace(
            nears=jnp.full((n,), cfg.near_plane), fars=jnp.full((n,), cfg.far_plane)
        )

    dcfgs = cfg.density_field_configs()

    def make_density_fn(idx, dcfg):
        def fn(ray_samples: RaySamples):
            pos = ray_samples.get_positions()
            d = hash_density_field_density(
                dcfg, params["proposal_networks"][f"proposal_{idx}"], aabb, pos.reshape(-1, 3)
            )
            return d.reshape(pos.shape[:2])

        return fn

    rng_s, rng_bg = jax.random.split(rng) if rng is not None else (None, None)
    ray_samples, weights_list, ray_samples_list = proposal_sample(
        ray_bundle,
        [make_density_fn(i, c) for i, c in dcfgs],
        num_proposal_samples_per_ray=cfg.num_proposal_samples_per_ray,
        num_nerf_samples_per_ray=cfg.num_nerf_samples_per_ray,
        rng=rng_s,
        stratified=train,
        single_jitter=cfg.use_single_jitter,
        initial_spacing="uniform" if cfg.proposal_initial_sampler == "uniform" else "piecewise",
        anneal=anneal,
        train_proposal_networks=train_proposal_networks,
    )

    fcfg = cfg.field_config()
    positions = ray_samples.get_positions()
    n, s = positions.shape[:2]
    flat_pos = positions.reshape(-1, 3)
    density, geo = nerfacto_density(fcfg, params["fields"], aabb, flat_pos)
    flat_dirs = jnp.broadcast_to(ray_samples.directions[:, None, :], (n, s, 3)).reshape(-1, 3)
    flat_cam = (
        jnp.repeat(ray_samples.camera_indices, s)
        if ray_samples.camera_indices is not None
        else None
    )
    rgb_s = nerfacto_rgb(fcfg, params["fields"], geo, flat_dirs, flat_cam, train).reshape(n, s, 3)
    density = density.reshape(n, s)

    weights = ray_samples.get_weights(density)
    weights_list = weights_list + [weights]
    ray_samples_list = ray_samples_list + [ray_samples]

    rgb = render_rgb(rgb_s, weights, cfg.background_color, rng_bg, train)
    outputs = {
        "rgb": rgb,
        "accumulation": render_accumulation(weights),
        "depth": render_depth(weights, ray_samples),
        "weights_list": weights_list,
        "ray_samples_list": ray_samples_list,
    }
    if cfg.predict_normals:
        normals = nerfacto_normals(fcfg, params["fields"], aabb, flat_pos).reshape(n, s, 3)
        pred_normals = nerfacto_pred_normals(fcfg, params["fields"], geo, flat_pos).reshape(n, s, 3)
        outputs["normals"] = render_normals(normals, weights)
        outputs["pred_normals"] = render_normals(pred_normals, weights)
        if train:
            outputs["rendered_orientation_loss"] = L.orientation_loss(
                weights, jax.lax.stop_gradient(normals), ray_bundle.directions
            )
            outputs["rendered_pred_normal_loss"] = L.pred_normal_loss(
                weights, jax.lax.stop_gradient(normals), pred_normals
            )
    for i in range(cfg.num_proposal_iterations):
        outputs[f"prop_depth_{i}"] = render_depth(weights_list[i], ray_samples_list[i])
    if ray_bundle.directions_norm is not None:
        outputs["directions_norm"] = ray_bundle.directions_norm
    return outputs


def get_metrics_dict(cfg: Config, outputs: dict, batch: dict, step=0) -> dict:
    image = batch["image"]
    mse = jnp.mean((outputs["rgb"] - image) ** 2)
    metrics = {"psnr": -10.0 * jnp.log10(mse)}
    if "weights_list" in outputs:
        metrics["distortion"] = L.distortion_loss(
            outputs["weights_list"], outputs["ray_samples_list"]
        )
    return metrics


def get_loss_dict(
    cfg: Config, params: dict, outputs: dict, batch: dict, metrics_dict=None, train=True,
    rng=None,
) -> Dict:
    """(ref: models/nerfacto.py:305-335)."""
    image = batch["image"]
    loss_dict = {"rgb_loss": L.mse_loss(image, outputs["rgb"])}
    if train:
        loss_dict["interlevel_loss"] = cfg.interlevel_loss_mult * L.interlevel_loss(
            outputs["weights_list"], outputs["ray_samples_list"]
        )
        assert metrics_dict is not None and "distortion" in metrics_dict
        loss_dict["distortion_loss"] = cfg.distortion_loss_mult * metrics_dict["distortion"]
        if cfg.predict_normals:
            loss_dict["orientation_loss"] = cfg.orientation_loss_mult * jnp.mean(
                outputs["rendered_orientation_loss"]
            )
            loss_dict["pred_normal_loss"] = cfg.pred_normal_loss_mult * jnp.mean(
                outputs["rendered_pred_normal_loss"]
            )
    return loss_dict
