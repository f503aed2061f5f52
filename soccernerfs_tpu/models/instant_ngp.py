"""Instant-NGP model (ref: models/instant_ngp.py:53-266).

Occupancy-grid volumetric sampling with static shapes (ops/occupancy.py
replaces nerfacc), alive-ray-masked RGB loss, periodic grid EMA updates
folded into the jitted step via ``update_aux`` (replaces the every-16-
steps training callback, ref: instant_ngp.py:144-162).

``instant-ngp-bounded`` is this model with contraction_type="aabb" and
the fork's DynamicDataManager tuning (ref: method_configs.py:217-248).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from soccernerfs_tpu.core.math import intersect_aabb
from soccernerfs_tpu.core.rays import RayBundle
from soccernerfs_tpu.fields.instant_ngp import (
    InstantNGPFieldConfig,
    init_instant_ngp_field,
    instant_ngp_density,
    instant_ngp_rgb,
)
from soccernerfs_tpu.ops.occupancy import (
    OccupancyGridConfig,
    init_occupancy_grid,
    occupancy_binary,
    update_occupancy_grid,
    volumetric_sample,
)
from soccernerfs_tpu.ops.rendering import render_accumulation, render_depth, render_rgb


@dataclass(frozen=True)
class Config:
    """(ref: models/instant_ngp.py:53-85)."""

    enable_collider: bool = False
    max_num_samples_per_ray: int = 24
    num_probes_per_ray: int = 256
    grid_resolution: int = 128
    max_res: int = 2048
    log2_hashmap_size: int = 19
    contraction_type: str = "un_bounded_sphere"
    cone_angle: float = 0.004
    render_step_size: float = 0.01
    near_plane: float = 0.05
    far_plane: float = 1e3
    use_appearance_embedding: bool = False
    background_color: str = "random"
    eval_num_rays_per_chunk: int = 8192

    def field_config(self, num_images: int = 0) -> InstantNGPFieldConfig:
        return InstantNGPFieldConfig(
            max_res=self.max_res,
            log2_hashmap_size=self.log2_hashmap_size,
            use_appearance_embedding=self.use_appearance_embedding,
            contraction_type=self.contraction_type,
            num_images=num_images,
        )

    @property
    def occ(self) -> OccupancyGridConfig:
        return OccupancyGridConfig(resolution=self.grid_resolution)


def init(rng: jax.Array, cfg: Config, num_train_data: int = 0) -> dict:
    return {"fields": init_instant_ngp_field(rng, cfg.field_config(num_train_data))}


def init_aux(cfg: Config) -> dict:
    return {"occs": init_occupancy_grid(cfg.occ)}


def schedules(cfg: Config, step, aux):
    return {"occ_binary": occupancy_binary(cfg.occ, aux["occs"])}, aux


def eval_kwargs(cfg: Config, aux):
    """Extra get_outputs kwargs for eval renders (trainer hook)."""
    return {"occ_binary": occupancy_binary(cfg.occ, aux["occs"])}


def update_aux(cfg: Config, params: dict, aabb, step, aux: dict, rng) -> dict:
    """Periodic occupancy EMA update inside the jitted step
    (ref: instant_ngp.py:144-162 update_every_num_iters=16)."""
    occ = cfg.occ
    fcfg = cfg.field_config()

    def density_fn(positions):
        d, _ = instant_ngp_density(fcfg, params["fields"], aabb, positions)
        return d

    def do_update(occs):
        return update_occupancy_grid(
            occ, occs, aabb, density_fn, rng, cfg.render_step_size,
            step=step,
        )

    occs = jax.lax.cond(
        step % occ.update_every == 0, do_update, lambda o: o, aux["occs"]
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
    """(ref: models/instant_ngp.py:170-213)."""
    n = ray_bundle.origins.shape[0]
    if ray_bundle.nears is None:
        nears, fars = intersect_aabb(
            ray_bundle.origins, ray_bundle.directions, aabb, near_plane=cfg.near_plane
        )
        fars = jnp.minimum(fars, cfg.far_plane)
        ray_bundle = ray_bundle.replace(nears=nears, fars=fars)

    if occ_binary is None:
        occ_binary = jnp.ones((cfg.grid_resolution**3,), bool)

    rng_s, rng_bg = jax.random.split(rng) if rng is not None else (None, None)
    ray_samples, valid = volumetric_sample(
        cfg.occ,
        occ_binary,
        ray_bundle,
        aabb,
        num_probes=cfg.num_probes_per_ray,
        max_samples_per_ray=cfg.max_num_samples_per_ray,
        rng=rng_s,
        stratified=train,
    )

    fcfg = cfg.field_config()
    positions = ray_samples.get_positions()
    nn, s = positions.shape[:2]
    density, geo = instant_ngp_density(fcfg, params["fields"], aabb, positions.reshape(-1, 3))
    flat_dirs = jnp.broadcast_to(ray_samples.directions[:, None, :], (nn, s, 3)).reshape(-1, 3)
    flat_cam = (
        jnp.repeat(ray_samples.camera_indices, s)
        if ray_samples.camera_indices is not None
        else None
    )
    rgb_s = instant_ngp_rgb(fcfg, params["fields"], geo, flat_dirs, flat_cam, train).reshape(nn, s, 3)
    density = density.reshape(nn, s) * valid  # masked: invalid samples contribute 0

    weights = ray_samples.get_weights(density)
    alive_ray_mask = jnp.any(valid, axis=-1)

    outputs = {
        "rgb": render_rgb(rgb_s, weights, cfg.background_color, rng_bg, train),
        "accumulation": render_accumulation(weights),
        "depth": render_depth(weights, ray_samples),
        "alive_ray_mask": alive_ray_mask,
        "num_samples_per_ray": jnp.sum(valid, axis=-1),
        "weights": weights,
        "ray_samples": ray_samples,
        "valid": valid,
    }
    if ray_bundle.directions_norm is not None:
        outputs["directions_norm"] = ray_bundle.directions_norm
    return outputs


def get_metrics_dict(cfg: Config, outputs: dict, batch: dict, step=0) -> dict:
    """(ref: models/instant_ngp.py:215-220)."""
    image = batch["image"]
    mse = jnp.mean((outputs["rgb"] - image) ** 2)
    return {
        "psnr": -10.0 * jnp.log10(mse),
        "num_samples_per_batch": jnp.sum(outputs["num_samples_per_ray"]),
    }


def get_loss_dict(
    cfg: Config, params: dict, outputs: dict, batch: dict, metrics_dict=None, train=True,
    rng=None,
) -> Dict:
    """Alive-ray-masked MSE (ref: models/instant_ngp.py:222-227)."""
    image = batch["image"]
    mask = outputs["alive_ray_mask"][:, None]
    denom = jnp.maximum(jnp.sum(mask) * 3, 1.0)
    rgb_loss = jnp.sum(jnp.where(mask, (image - outputs["rgb"]) ** 2, 0.0)) / denom
    return {"rgb_loss": rgb_loss}
