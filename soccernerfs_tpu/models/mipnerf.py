"""mip-NeRF model (ref: models/mipnerf.py:38-192).

Single shared field queried with integrated positional encoding from
conical-frustum Gaussians; coarse uniform + fine PDF (include_original)
passes; MSE on both renders.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from soccernerfs_tpu.core.rays import RayBundle, RaySamples
from soccernerfs_tpu.fields.vanilla_nerf import (
    NeRFFieldConfig,
    init_nerf_field,
    nerf_field_forward,
)
from soccernerfs_tpu.ops import losses as L
from soccernerfs_tpu.ops.encodings import conical_frustum_to_gaussian
from soccernerfs_tpu.ops.rendering import render_accumulation, render_depth, render_rgb
from soccernerfs_tpu.ops.samplers import pdf_samples, spaced_samples


@dataclass(frozen=True)
class Config:
    """(ref: models/mipnerf.py:38-52; vanilla config base)."""

    num_coarse_samples: int = 128
    num_importance_samples: int = 128
    near_plane: float = 2.0
    far_plane: float = 6.0
    background_color: str = "white"
    eval_num_rays_per_chunk: int = 1024

    def field_config(self) -> NeRFFieldConfig:
        return NeRFFieldConfig(
            position_encoding_num_frequencies=16,
            position_encoding_max=16.0,
            use_integrated_encoding=True,
        )


def init(rng: jax.Array, cfg: Config, num_train_data: int = 0) -> dict:
    return {"fields": init_nerf_field(rng, cfg.field_config())}


def _field_on_samples(fcfg, fparams, ray_samples: RaySamples):
    n, s = ray_samples.starts.shape
    origins = jnp.broadcast_to(ray_samples.origins[:, None, :], (n, s, 3))
    dirs = jnp.broadcast_to(ray_samples.directions[:, None, :], (n, s, 3))
    radius = jnp.sqrt(ray_samples.pixel_area)[:, None, None] / 1.7724538509055159
    radius = jnp.broadcast_to(radius, (n, s, 1))
    means, covs = conical_frustum_to_gaussian(
        origins,
        dirs,
        ray_samples.starts[..., None],
        ray_samples.ends[..., None],
        radius,
    )
    density, rgb = nerf_field_forward(
        fcfg,
        fparams,
        means.reshape(-1, 3),
        dirs.reshape(-1, 3),
        covs=covs.reshape(-1, 3, 3),
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
    """(ref: models/mipnerf.py:95-152)."""
    n = ray_bundle.origins.shape[0]
    if ray_bundle.nears is None:
        ray_bundle = ray_bundle.replace(
            nears=jnp.full((n,), cfg.near_plane), fars=jnp.full((n,), cfg.far_plane)
        )
    rng_u, rng_pdf, rng_bg = (
        jax.random.split(rng, 3) if rng is not None else (None, None, None)
    )
    fcfg = cfg.field_config()

    coarse = spaced_samples(
        ray_bundle, cfg.num_coarse_samples, "uniform", rng_u, stratified=train
    )
    density_c, rgb_c = _field_on_samples(fcfg, params["fields"], coarse)
    weights_c = coarse.get_weights(density_c)

    fine = pdf_samples(
        ray_bundle, coarse, weights_c, cfg.num_importance_samples,
        rng=rng_pdf, stratified=train, include_original=True,
    )
    density_f, rgb_f = _field_on_samples(fcfg, params["fields"], fine)
    weights_f = fine.get_weights(density_f)

    outputs = {
        "rgb_coarse": render_rgb(rgb_c, weights_c, cfg.background_color, rng_bg, train),
        "rgb_fine": render_rgb(rgb_f, weights_f, cfg.background_color, rng_bg, train),
        "accumulation": render_accumulation(weights_f),
        "depth": render_depth(weights_f, fine),
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
    """(ref: models/mipnerf.py:154-165)."""
    image = batch["image"]
    return {
        "rgb_loss_coarse": L.mse_loss(image, outputs["rgb_coarse"]),
        "rgb_loss_fine": L.mse_loss(image, outputs["rgb_fine"]),
    }
