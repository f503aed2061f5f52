"""NeRFPlayer-NGP-complete — NGP backbone + full decomposition (fork).

(ref: models/nerfplayer_ngp_complete.py:54-299 +
fields/nerfplayer_ngp_complete_field.py.)  Combines the full NeRFPlayer
decomposition field (deformation / stationary / newness / decomposition,
fields/nerfplayer.py) with occupancy-grid volumetric sampling
(ops/occupancy) and the NGP-style alive-ray-masked losses plus the
probability regularizer and temporal TV.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from soccernerfs_tpu.core.math import intersect_aabb
from soccernerfs_tpu.core.rays import RayBundle
from soccernerfs_tpu.fields.nerfplayer import (
    NerfplayerFieldConfig,
    init_nerfplayer_field,
    nerfplayer_density,
    nerfplayer_rgb,
    nerfplayer_temporal_tv,
)
from soccernerfs_tpu.models import instant_ngp as _ngp
from soccernerfs_tpu.ops.occupancy import (
    OccupancyGridConfig,
    init_occupancy_grid,
    occupancy_binary,
    update_occupancy_grid,
    volumetric_sample,
)
from soccernerfs_tpu.ops.rendering import (
    render_accumulation,
    render_decomposition,
    render_depth,
    render_rgb,
)


@dataclass(frozen=True)
class Config:
    """(ref: models/nerfplayer_ngp_complete.py:54-101)."""

    temporal_dim: int = 64
    num_levels: int = 16
    features_per_level: int = 2
    log2_hashmap_size: int = 17
    base_resolution: int = 16
    temporal_tv_weight: float = 1.0
    depth_weight: float = 0.05
    prob_reg_loss_mult: float = 0.0001
    train_background_color: str = "random"
    eval_background_color: str = "white"
    disable_viewing_dependent: bool = True
    max_num_samples_per_ray: int = 48
    num_probes_per_ray: int = 256
    grid_resolution: int = 128
    contraction_type: str = "aabb"
    render_step_size: float = 0.001
    near_plane: float = 0.05
    far_plane: float = 1e3
    # flipped off by the Trainer when a camera optimizer is enabled
    # (see fields/nerfplayer.py NerfplayerFieldConfig.detached_inputs)
    detached_inputs: bool = True
    eval_num_rays_per_chunk: int = 8192

    def field_config(self, num_images: int = 0) -> NerfplayerFieldConfig:
        return NerfplayerFieldConfig(
            temporal_dim=self.temporal_dim,
            num_levels=self.num_levels,
            features_per_level=self.features_per_level,
            base_resolution=self.base_resolution,
            log2_hashmap_size=self.log2_hashmap_size,
            disable_viewing_dependent=self.disable_viewing_dependent,
            disable_scene_contraction=self.contraction_type == "aabb",
            num_images=num_images,
            detached_inputs=self.detached_inputs,
        )

    @property
    def occ(self) -> OccupancyGridConfig:
        return OccupancyGridConfig(resolution=self.grid_resolution)


def init(rng: jax.Array, cfg: Config, num_train_data: int = 0) -> dict:
    return {"fields": init_nerfplayer_field(rng, cfg.field_config(num_train_data))}


def init_aux(cfg: Config) -> dict:
    return {"occs": init_occupancy_grid(cfg.occ)}


def schedules(cfg: Config, step, aux):
    return {"occ_binary": occupancy_binary(cfg.occ, aux["occs"])}, aux


def eval_kwargs(cfg: Config, aux):
    return {"occ_binary": occupancy_binary(cfg.occ, aux["occs"])}


def update_aux(cfg: Config, params: dict, aabb, step, aux: dict, rng) -> dict:
    fcfg = cfg.field_config()
    rng_t, rng_u = jax.random.split(rng)
    t = jax.random.uniform(rng_t, ())

    def density_fn(positions):
        times = jnp.full((positions.shape[0],), t)
        d, _, _ = nerfplayer_density(fcfg, params["fields"], aabb, positions, times)
        return d

    def do_update(occs):
        return update_occupancy_grid(
            cfg.occ, occs, aabb, density_fn, rng_u, cfg.render_step_size,
            step=step,
        )

    occs = jax.lax.cond(
        step % cfg.occ.update_every == 0, do_update, lambda o: o, aux["occs"]
    )
    return {**aux, "occs": occs}


def get_outputs(
    cfg: Config,
    params: dict,
    aabb: jnp.ndarray,
    ray_bundle: RayBundle,
    rng: Optional[jax.Array] = None,
    train: bool = True,
    occ_binary: Optional[jnp.ndarray] = None,
) -> dict:
    """(ref: models/nerfplayer_ngp_complete.py:150-220)."""
    assert ray_bundle.times is not None
    if ray_bundle.nears is None:
        nears, fars = intersect_aabb(
            ray_bundle.origins, ray_bundle.directions, aabb, near_plane=cfg.near_plane
        )
        ray_bundle = ray_bundle.replace(nears=nears, fars=jnp.minimum(fars, cfg.far_plane))
    if occ_binary is None:
        occ_binary = jnp.ones((cfg.grid_resolution**3,), bool)

    rng_s, rng_bg = jax.random.split(rng) if rng is not None else (None, None)
    ray_samples, valid = volumetric_sample(
        cfg.occ, occ_binary, ray_bundle, aabb,
        num_probes=cfg.num_probes_per_ray,
        max_samples_per_ray=cfg.max_num_samples_per_ray,
        rng=rng_s, stratified=train,
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
    sigmas = density.reshape(n, s) * valid
    probs = probs.reshape(n, s, 3)

    weights = ray_samples.get_weights(sigmas)
    background = cfg.train_background_color if train else cfg.eval_background_color
    outputs = {
        "rgb": render_rgb(rgb_s, weights, background, rng_bg, train),
        "accumulation": render_accumulation(weights),
        "depth": render_depth(weights, ray_samples),
        "probs": render_decomposition(probs, weights),
        "alive_ray_mask": jnp.any(valid, axis=-1),
        "num_samples_per_ray": jnp.sum(valid, axis=-1),
        "sigmas": sigmas,
        "weights": weights,
        "ray_samples": ray_samples,
        "valid": valid,
    }
    if ray_bundle.directions_norm is not None:
        outputs["directions_norm"] = ray_bundle.directions_norm
    return outputs


def get_metrics_dict(cfg: Config, outputs: dict, batch: dict, step=0) -> dict:
    return _ngp.get_metrics_dict(cfg, outputs, batch, step)


def get_loss_dict(
    cfg: Config, params: dict, outputs: dict, batch: dict, metrics_dict=None, train=True,
    rng=None,
) -> Dict:
    """(ref: models/nerfplayer_ngp_complete.py:240-285)."""
    image = batch["image"]
    mask = outputs["alive_ray_mask"][:, None]
    denom = jnp.maximum(jnp.sum(mask) * 3, 1.0)
    rgb_loss = jnp.sum(jnp.where(mask, (image - outputs["rgb"]) ** 2, 0.0)) / denom
    loss_dict = {"rgb_loss": rgb_loss}
    if not train:
        return loss_dict

    if "depth_image" in batch and cfg.depth_weight > 0:
        depth_gt = batch["depth_image"]
        dmask = depth_gt != 0
        l1 = jnp.sum(jnp.where(dmask, jnp.abs(outputs["depth"] - depth_gt), 0.0))
        loss_dict["depth_loss"] = (
            l1 / jnp.maximum(jnp.sum(dmask), 1.0)
        ) * cfg.depth_weight

    if cfg.temporal_tv_weight > 0:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        loss_dict["temporal_tv_loss"] = (
            nerfplayer_temporal_tv(cfg.field_config(), params["fields"], rng)
            * cfg.temporal_tv_weight
            / 2.0  # two temporal grids in the field
        )

    probs = outputs["probs"].reshape(-1, 3).mean(axis=0)
    loss_dict["prob_loss"] = (0.01 * probs[1] + probs[2]) * cfg.prob_reg_loss_mult
    return loss_dict
