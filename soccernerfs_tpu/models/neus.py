"""NeuS surface model (ref: models/neus.py:40-119 +
models/base_surface_model.py:55-397).

SDF field + NeuS hierarchical sampler; alphas from the learned-variance
logistic CDF ratio; eikonal regularization on SDF gradients; normals
output.  Background network and the base surface model's mono-depth /
mono-normal losses are configurable off (as in the neus method default).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from soccernerfs_tpu.core.rays import (
    RayBundle,
    get_weights_and_transmittance_from_alphas,
)
from soccernerfs_tpu.fields.sdf import (
    SDFFieldConfig,
    init_sdf_field,
    inv_s,
    sdf_and_features,
    sdf_normals,
    sdf_rgb,
    sdf_value,
)
from soccernerfs_tpu.ops import losses as L
from soccernerfs_tpu.ops.neus_sampler import neus_sample
from soccernerfs_tpu.ops.rendering import (
    render_accumulation,
    render_depth,
    render_normals,
    render_rgb,
)


@dataclass(frozen=True)
class Config:
    """(ref: models/neus.py:40-60 + base_surface_model.py:55-115)."""

    near_plane: float = 0.05
    far_plane: float = 1000.0
    num_samples: int = 64
    num_samples_importance: int = 64
    num_upsample_steps: int = 4
    base_variance: float = 64.0
    eikonal_loss_mult: float = 0.1
    background_color: str = "black"
    sdf_field: SDFFieldConfig = SDFFieldConfig()
    eval_num_rays_per_chunk: int = 1024


def init(rng: jax.Array, cfg: Config, num_train_data: int = 0) -> dict:
    return {"fields": init_sdf_field(rng, cfg.sdf_field)}


def get_outputs(
    cfg: Config,
    params: dict,
    aabb: jnp.ndarray,
    ray_bundle: RayBundle,
    rng: Optional[jax.Array] = None,
    train: bool = True,
) -> dict:
    """(ref: base_surface_model.py:216-295 + neus.py sample_and_forward)."""
    n = ray_bundle.origins.shape[0]
    if ray_bundle.nears is None:
        ray_bundle = ray_bundle.replace(
            nears=jnp.full((n,), cfg.near_plane), fars=jnp.full((n,), cfg.far_plane)
        )
    fcfg = cfg.sdf_field
    fparams = params["fields"]

    rng_s, rng_bg = jax.random.split(rng) if rng is not None else (None, None)
    ray_samples = neus_sample(
        ray_bundle,
        lambda p: sdf_value(fcfg, fparams, p),
        num_samples=cfg.num_samples,
        num_samples_importance=cfg.num_samples_importance,
        num_upsample_steps=cfg.num_upsample_steps,
        base_variance=cfg.base_variance,
        rng=rng_s,
        stratified=train,
    )

    positions = ray_samples.get_positions()
    nn, s = positions.shape[:2]
    flat_pos = positions.reshape(-1, 3)
    sdf, feats = sdf_and_features(fcfg, fparams, flat_pos)
    normals = sdf_normals(fcfg, fparams, flat_pos)
    unit_normals = normals / (jnp.linalg.norm(normals, axis=-1, keepdims=True) + 1e-10)
    flat_dirs = jnp.broadcast_to(ray_samples.directions[:, None, :], (nn, s, 3)).reshape(-1, 3)
    rgb_s = sdf_rgb(fcfg, fparams, flat_pos, flat_dirs, unit_normals, feats).reshape(nn, s, 3)

    # NeuS alpha: ratio of logistic CDFs along the ray direction
    # (ref: fields/sdf_field.py get_alpha)
    s_inv = inv_s(fparams)
    sdf_r = sdf.reshape(nn, s)
    cos = jnp.sum(
        unit_normals.reshape(nn, s, 3)
        * jnp.broadcast_to(ray_samples.directions[:, None, :], (nn, s, 3)),
        axis=-1,
    )
    # iter_cos trick: always non-positive
    true_cos = cos
    iter_cos = -(jax.nn.relu(-true_cos * 0.5 + 0.5) * 0.5 + jax.nn.relu(-true_cos) * 0.5)
    deltas = ray_samples.deltas
    est_prev = sdf_r + iter_cos * deltas * 0.5
    est_next = sdf_r - iter_cos * deltas * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev * s_inv)
    next_cdf = jax.nn.sigmoid(est_next * s_inv)
    alphas = jnp.clip((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5), 0.0, 1.0)

    weights = get_weights_and_transmittance_from_alphas(alphas, weights_only=True)

    outputs = {
        "rgb": render_rgb(rgb_s, weights, cfg.background_color, rng_bg, train),
        "accumulation": render_accumulation(weights),
        "depth": render_depth(weights, ray_samples),
        "normals": render_normals(unit_normals.reshape(nn, s, 3), weights),
        "inv_s": s_inv,
    }
    if train:
        outputs["eikonal_gradients"] = normals.reshape(nn, s, 3)
    return outputs


def get_metrics_dict(cfg: Config, outputs: dict, batch: dict, step=0) -> dict:
    mse = jnp.mean((outputs["rgb"] - batch["image"]) ** 2)
    return {"psnr": -10.0 * jnp.log10(mse), "inv_s": outputs["inv_s"]}


def get_loss_dict(
    cfg: Config, params: dict, outputs: dict, batch: dict, metrics_dict=None, train=True,
    rng=None,
) -> Dict:
    """(ref: base_surface_model.py:297-335)."""
    loss_dict = {"rgb_loss": L.mse_loss(batch["image"], outputs["rgb"])}
    if train:
        grad_norm = jnp.linalg.norm(outputs["eikonal_gradients"], axis=-1)
        loss_dict["eikonal_loss"] = cfg.eikonal_loss_mult * jnp.mean(
            (grad_norm - 1.0) ** 2
        )
    return loss_dict
