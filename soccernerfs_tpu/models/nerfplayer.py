"""Full NeRFPlayer model — decomposition variant (fork addition).

(ref: models/nerfplayer.py:64-381.)  Decomposition field + temporal
proposal fields; losses: rgb, interlevel, distortion, DS-NeRF depth,
temporal TV averaged over all temporal grids, and the probability
regularizer 0.01*P_deform + P_new on rendered probs.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from soccernerfs_tpu.core.math import intersect_aabb
from soccernerfs_tpu.core.rays import RayBundle, RaySamples
from soccernerfs_tpu.fields.nerfplayer import (
    NerfplayerFieldConfig,
    init_nerfplayer_field,
    nerfplayer_density,
    nerfplayer_rgb,
    nerfplayer_temporal_tv,
)
from soccernerfs_tpu.fields.nerfplayer_nerfacto import (
    TemporalHashMLPDensityFieldConfig,
    init_temporal_density_field,
    proposal_temporal_tv,
    temporal_density_field_density,
)
from soccernerfs_tpu.models import kplanes as _kp
from soccernerfs_tpu.ops import losses as L
from soccernerfs_tpu.ops.rendering import (
    render_accumulation,
    render_decomposition,
    render_depth,
    render_rgb,
)
from soccernerfs_tpu.ops.samplers import proposal_sample


@dataclass(frozen=True)
class Config:
    """(ref: models/nerfplayer.py:64-115)."""

    near_plane: float = 0.05
    far_plane: float = 1000.0
    train_background_color: str = "random"
    eval_background_color: str = "white"
    num_levels: int = 16
    features_per_level: int = 2
    log2_hashmap_size: int = 17
    temporal_dim: int = 64
    num_proposal_samples_per_ray: Tuple[int, ...] = (256, 96)
    num_nerf_samples_per_ray: int = 48
    proposal_update_every: int = 5
    proposal_warmup: int = 5000
    num_proposal_iterations: int = 2
    use_same_proposal_network: bool = False
    proposal_net_args_list: Tuple = (
        {"hidden_dim": 16, "temporal_dim": 32, "log2_hashmap_size": 17, "num_levels": 5, "max_res": 64},
        {"hidden_dim": 16, "temporal_dim": 32, "log2_hashmap_size": 17, "num_levels": 5, "max_res": 256},
    )
    disable_viewing_dependent: bool = True
    interlevel_loss_mult: float = 1.0
    distortion_loss_mult: float = 1e-3
    temporal_tv_weight: float = 1.0
    depth_weight: float = 0.05
    is_euclidean_depth: bool = True
    depth_sigma: float = 0.01
    should_decay_sigma: bool = False
    starting_depth_sigma: float = 0.2
    sigma_decay_rate: float = 0.99985
    depth_loss_type: str = "ds_nerf"
    prob_reg_loss_mult: float = 0.0001
    use_proposal_weight_anneal: bool = True
    proposal_weights_anneal_slope: float = 10.0
    proposal_weights_anneal_max_num_iters: int = 1000
    use_single_jitter: bool = True
    disable_scene_contraction: bool = False
    # flipped off by the Trainer when a camera optimizer is enabled
    # (see fields/nerfplayer.py NerfplayerFieldConfig.detached_inputs)
    detached_inputs: bool = True
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

    def field_config(self, num_images: int = 0) -> NerfplayerFieldConfig:
        return NerfplayerFieldConfig(
            temporal_dim=self.temporal_dim,
            num_levels=self.num_levels,
            features_per_level=self.features_per_level,
            log2_hashmap_size=self.log2_hashmap_size,
            disable_viewing_dependent=self.disable_viewing_dependent,
            disable_scene_contraction=self.disable_scene_contraction,
            num_images=num_images,
            detached_inputs=self.detached_inputs,
        )

    def density_field_configs(self):
        n = self.num_proposal_iterations
        args = [dict(a) for a in self.proposal_net_args_list]
        indices = (
            [0] * n if self.use_same_proposal_network else [min(i, len(args) - 1) for i in range(n)]
        )
        built = {}
        for i in indices:
            if i not in built:
                built[i] = TemporalHashMLPDensityFieldConfig(
                    disable_scene_contraction=self.disable_scene_contraction,
                    detached_inputs=self.detached_inputs, **dict(args[i])
                )
        return [(i, built[i]) for i in indices]


def init(rng: jax.Array, cfg: Config, num_train_data: int = 0) -> dict:
    k_field, k_prop = jax.random.split(rng)
    fields = init_nerfplayer_field(k_field, cfg.field_config(num_train_data))
    prop = {}
    keys = jax.random.split(k_prop, cfg.num_proposal_iterations)
    for (idx, dcfg), key in zip(cfg.density_field_configs(), keys):
        name = f"proposal_{idx}"
        if name not in prop:
            prop[name] = init_temporal_density_field(key, dcfg)
    return {"fields": fields, "proposal_networks": prop}


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
    """(ref: models/nerfplayer.py:227-278)."""
    assert ray_bundle.times is not None, "NeRFPlayer needs ray times"
    if ray_bundle.nears is None:
        n = ray_bundle.origins.shape[0]
        if cfg.disable_scene_contraction:
            nears, fars = intersect_aabb(ray_bundle.origins, ray_bundle.directions, aabb)
        else:
            nears = jnp.full((n,), cfg.near_plane)
            fars = jnp.full((n,), cfg.far_plane)
        ray_bundle = ray_bundle.replace(nears=nears, fars=fars)

    dcfgs = cfg.density_field_configs()

    def make_density_fn(idx, dcfg):
        def fn(ray_samples: RaySamples):
            pos = ray_samples.get_positions()
            n, s = pos.shape[:2]
            times = jnp.repeat(ray_samples.times, s)
            d = temporal_density_field_density(
                dcfg, params["proposal_networks"][f"proposal_{idx}"], aabb,
                pos.reshape(-1, 3), times,
            )
            return d.reshape(n, s)

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
        initial_spacing="uniform" if cfg.disable_scene_contraction else "piecewise",
        anneal=anneal,
        train_proposal_networks=train_proposal_networks,
    )

    fcfg = cfg.field_config()
    positions = ray_samples.get_positions()
    n, s = positions.shape[:2]
    flat_times = jnp.repeat(ray_samples.times, s)
    density, geo, probs = nerfplayer_density(
        fcfg, params["fields"], aabb, positions.reshape(-1, 3), flat_times
    )
    flat_dirs = jnp.broadcast_to(ray_samples.directions[:, None, :], (n, s, 3)).reshape(-1, 3)
    rgb_s = nerfplayer_rgb(fcfg, params["fields"], geo, flat_dirs).reshape(n, s, 3)
    density = density.reshape(n, s)
    probs = probs.reshape(n, s, 3)

    weights = ray_samples.get_weights(density)
    weights_list = weights_list + [weights]
    ray_samples_list = ray_samples_list + [ray_samples]

    background = cfg.train_background_color if train else cfg.eval_background_color
    outputs = {
        "rgb": render_rgb(rgb_s, weights, background, rng_bg, train),
        "accumulation": render_accumulation(weights),
        "depth": render_depth(weights, ray_samples),
        "probs": render_decomposition(probs, weights),
        "weights_list": weights_list,
        "ray_samples_list": ray_samples_list,
    }
    for i in range(cfg.num_proposal_iterations):
        outputs[f"prop_depth_{i}"] = render_depth(weights_list[i], ray_samples_list[i])
    if ray_bundle.directions_norm is not None:
        outputs["directions_norm"] = ray_bundle.directions_norm
    return outputs


def get_metrics_dict(cfg: Config, outputs: dict, batch: dict, step=0) -> dict:
    """(ref: models/nerfplayer.py:280-309)."""
    image = batch["image"]
    mse = jnp.mean((outputs["rgb"] - image) ** 2)
    metrics = {
        "psnr": -10.0 * jnp.log10(mse),
        "distortion": L.distortion_loss(outputs["weights_list"], outputs["ray_samples_list"]),
    }
    if "depth_image" in batch:
        sigma = _kp.depth_sigma_for_step(cfg, step)
        dn = outputs.get("directions_norm", jnp.ones_like(batch["depth_image"]))
        total = 0.0
        k = len(outputs["weights_list"])
        for w, rs in zip(outputs["weights_list"], outputs["ray_samples_list"]):
            total += (
                L.depth_loss(
                    w, rs, batch["depth_image"], outputs["depth"], sigma, dn,
                    cfg.is_euclidean_depth, cfg.depth_loss_type,
                )
                / k
            )
        metrics["depth_loss"] = total
    return metrics


def get_loss_dict(
    cfg: Config,
    params: dict,
    outputs: dict,
    batch: dict,
    metrics_dict=None,
    train=True,
    rng: Optional[jax.Array] = None,
) -> Dict:
    """(ref: models/nerfplayer.py:311-341)."""
    loss_dict = {"rgb_loss": L.mse_loss(batch["image"], outputs["rgb"])}
    if not train:
        return loss_dict
    loss_dict["interlevel_loss"] = cfg.interlevel_loss_mult * L.interlevel_loss(
        outputs["weights_list"], outputs["ray_samples_list"]
    )
    assert metrics_dict is not None
    loss_dict["distortion_loss"] = cfg.distortion_loss_mult * metrics_dict["distortion"]
    if "depth_image" in batch and cfg.depth_weight > 0:
        loss_dict["depth_loss"] = cfg.depth_weight * metrics_dict["depth_loss"]

    if cfg.temporal_tv_weight > 0:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        unique_cfgs = {idx: dcfg for idx, dcfg in cfg.density_field_configs()}
        keys = jax.random.split(rng, 1 + len(unique_cfgs))
        tv = nerfplayer_temporal_tv(cfg.field_config(), params["fields"], keys[0])
        for key, (idx, dcfg) in zip(keys[1:], sorted(unique_cfgs.items())):
            tv += proposal_temporal_tv(
                dcfg, params["proposal_networks"][f"proposal_{idx}"], key
            )
        # averaged over all temporal networks (2 field grids + proposals)
        loss_dict["temporal_tv_loss"] = (
            tv * cfg.temporal_tv_weight / (len(unique_cfgs) + 2)
        )

    # probability regularization: push toward the static component
    probs = outputs["probs"].reshape(-1, 3)
    probs_mean = probs.mean(axis=0)
    loss_dict["prob_loss"] = (
        0.01 * probs_mean[1] + probs_mean[2]
    ) * cfg.prob_reg_loss_mult
    return loss_dict
