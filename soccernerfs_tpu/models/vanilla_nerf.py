"""Vanilla NeRF model (ref: models/vanilla_nerf.py:48-239).

Coarse (uniform) + fine (PDF, include_original) sampling over two
separate NeRF fields; MSE supervision on both renders.  Optional
time-conditioned variant via a temporal embedding is kept out per the
reference (its TemporalDistortion is only used by the dnerf variant).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from soccernerfs_tpu.core.rays import RayBundle
from soccernerfs_tpu.fields.vanilla_nerf import (
    NeRFFieldConfig,
    init_nerf_field,
    nerf_field_forward,
)
from soccernerfs_tpu.ops import losses as L
from soccernerfs_tpu.ops.rendering import render_accumulation, render_depth, render_rgb
from soccernerfs_tpu.ops.samplers import pdf_samples, spaced_samples


@dataclass(frozen=True)
class Config:
    """(ref: models/vanilla_nerf.py:48-67)."""

    num_coarse_samples: int = 64
    num_importance_samples: int = 128
    near_plane: float = 2.0
    far_plane: float = 6.0
    background_color: str = "white"
    eval_num_rays_per_chunk: int = 4096

    def field_config(self) -> NeRFFieldConfig:
        return NeRFFieldConfig()


def init(rng: jax.Array, cfg: Config, num_train_data: int = 0) -> dict:
    k1, k2 = jax.random.split(rng)
    fcfg = cfg.field_config()
    return {
        "fields": {
            "coarse": init_nerf_field(k1, fcfg),
            "fine": init_nerf_field(k2, fcfg),
        }
    }


def _field_on_samples(fcfg, fparams, ray_samples):
    positions = ray_samples.get_positions()
    n, s = positions.shape[:2]
    dirs = jnp.broadcast_to(ray_samples.directions[:, None, :], (n, s, 3))
    density, rgb = nerf_field_forward(
        fcfg, fparams, positions.reshape(-1, 3), dirs.reshape(-1, 3)
    )
    return density.reshape(n, s), rgb.reshape(n, s, 3)


def get_outputs(
    cfg: Config,
    params: dict,
    aabb: jnp.ndarray,
    ray_bundle: RayBundle,
    rng: Optional[jax.Array] = None,
    train: bool = True,
) -> dict:
    """(ref: models/vanilla_nerf.py:139-192)."""
    n = ray_bundle.origins.shape[0]
    if ray_bundle.nears is None:
        ray_bundle = ray_bundle.replace(
            nears=jnp.full((n,), cfg.near_plane), fars=jnp.full((n,), cfg.far_plane)
        )
    rng_u, rng_pdf, rng_bg = (
        jax.random.split(rng, 3) if rng is not None else (None, None, None)
    )
    fcfg = cfg.field_config()

    coarse_samples = spaced_samples(
        ray_bundle, cfg.num_coarse_samples, "uniform", rng_u, stratified=train
    )
    density_c, rgb_c = _field_on_samples(fcfg, params["fields"]["coarse"], coarse_samples)
    weights_c = coarse_samples.get_weights(density_c)

    fine_samples = pdf_samples(
        ray_bundle,
        coarse_samples,
        weights_c,
        cfg.num_importance_samples,
        rng=rng_pdf,
        stratified=train,
        include_original=True,
    )
    density_f, rgb_f = _field_on_samples(fcfg, params["fields"]["fine"], fine_samples)
    weights_f = fine_samples.get_weights(density_f)

    outputs = {
        "rgb_coarse": render_rgb(rgb_c, weights_c, cfg.background_color, rng_bg, train),
        "rgb_fine": render_rgb(rgb_f, weights_f, cfg.background_color, rng_bg, train),
        "accumulation_coarse": render_accumulation(weights_c),
        "accumulation": render_accumulation(weights_f),
        "depth_coarse": render_depth(weights_c, coarse_samples),
        "depth": render_depth(weights_f, fine_samples),
    }
    outputs["rgb"] = outputs["rgb_fine"]
    return outputs


def get_metrics_dict(cfg: Config, outputs: dict, batch: dict, step=0) -> dict:
    image = batch["image"]
    mse = jnp.mean((outputs["rgb_fine"] - image) ** 2)
    return {"psnr": -10.0 * jnp.log10(mse)}


def get_loss_dict(
    cfg: Config, params: dict, outputs: dict, batch: dict, metrics_dict=None, train=True,
    rng=None,
) -> Dict:
    """(ref: models/vanilla_nerf.py:194-203)."""
    image = batch["image"]
    return {
        "rgb_loss_coarse": L.mse_loss(image, outputs["rgb_coarse"]),
        "rgb_loss_fine": L.mse_loss(image, outputs["rgb_fine"]),
    }
