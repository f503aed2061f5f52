"""TensoRF model (ref: models/tensorf.py:55-345 + fields/tensorf_field.py).

VM/CP/triplane factorized density and color encodings; density = ReLU of
the summed density features, color via a learned B matrix + NeRF-encoded
MLP head; coarse uniform + PDF sampling; coarse-to-fine grid upsampling
at fixed iterations (host-side param resize between jitted steps).

Deviation noted: the reference reinitializes only the encodings
optimizer at upsample (models/tensorf.py:118-152); here the whole optax
state is rebuilt at those steps (param shapes change, forcing a fresh
compile anyway).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from soccernerfs_tpu.core.math import intersect_aabb
from soccernerfs_tpu.core.rays import RayBundle
from soccernerfs_tpu.core.scene_box import SceneBox
from soccernerfs_tpu.ops import losses as L
from soccernerfs_tpu.ops.encodings import (
    init_tensor_cp,
    init_tensor_vm,
    init_triplane,
    nerf_encoding,
    tensor_cp_encoding,
    tensor_vm_encoding,
    triplane_encoding,
    upsample_tensor_vm,
)
from soccernerfs_tpu.ops.mlp import init_mlp, mlp_apply
from soccernerfs_tpu.ops.rendering import render_accumulation, render_depth, render_rgb
from soccernerfs_tpu.ops.samplers import pdf_samples, spaced_samples


@dataclass(frozen=True)
class Config:
    """(ref: models/tensorf.py:59-83)."""

    init_resolution: int = 128
    final_resolution: int = 300
    upsampling_iters: Tuple[int, ...] = (2000, 3000, 4000, 5500, 7000)
    num_samples: int = 50
    num_uniform_samples: int = 200
    num_den_components: int = 16
    num_color_components: int = 48
    appearance_dim: int = 27
    tensorf_encoding: str = "vm"  # vm | cp | triplane
    background_color: str = "white"
    eval_num_rays_per_chunk: int = 4096

    def __post_init__(self):
        object.__setattr__(self, "upsampling_iters", tuple(self.upsampling_iters))

    def upsampling_resolutions(self):
        """(ref: models/tensorf.py:103-115): log-spaced schedule."""
        steps = (
            np.round(
                np.exp(
                    np.linspace(
                        np.log(self.init_resolution),
                        np.log(self.final_resolution),
                        len(self.upsampling_iters) + 1,
                    )
                )
            )
            .astype(int)
            .tolist()[1:]
        )
        return dict(zip(self.upsampling_iters, steps))


def _init_encoding(rng, kind, resolution, components):
    if kind == "vm":
        return init_tensor_vm(rng, resolution, components)
    if kind == "cp":
        return init_tensor_cp(rng, resolution, components)
    if kind == "triplane":
        return init_triplane(rng, resolution, components)
    raise ValueError(kind)


def _apply_encoding(kind, params, x):
    if kind == "vm":
        return tensor_vm_encoding(params, x)
    if kind == "cp":
        return tensor_cp_encoding(params, x)
    return triplane_encoding(params, x)


def _color_dim(cfg: Config) -> int:
    if cfg.tensorf_encoding == "vm":
        return 3 * cfg.num_color_components
    return cfg.num_color_components


def init(rng: jax.Array, cfg: Config, num_train_data: int = 0) -> dict:
    keys = jax.random.split(rng, 4)
    r = cfg.init_resolution
    # head input mirrors the reference: rgb_features(B) + dirs + feature
    # encoding of rgb_features + dir encoding (tensorf_field.py:66-72)
    feat_enc_dim = cfg.appearance_dim * 2 * 2  # 2 freqs, sin+cos
    dir_enc_dim = 3 * 2 * 2
    head_in = cfg.appearance_dim + 3 + feat_enc_dim + dir_enc_dim
    bound = 1.0 / jnp.sqrt(_color_dim(cfg))
    return {
        "encodings": {
            "density": _init_encoding(keys[0], cfg.tensorf_encoding, r, cfg.num_den_components),
            "color": _init_encoding(keys[1], cfg.tensorf_encoding, r, cfg.num_color_components),
        },
        "fields": {
            "B": jax.random.uniform(
                keys[2], (_color_dim(cfg), cfg.appearance_dim), jnp.float32, -bound, bound
            ),
            "mlp_head": init_mlp(keys[3], head_in, 128, 1, 3),
        },
    }


def host_update(cfg: Config, state, step: int, optimizer):
    """Coarse-to-fine upsampling between steps (trainer host hook).

    Returns a new state at upsampling iterations, else None
    (ref: models/tensorf.py:118-152).
    """
    schedule = cfg.upsampling_resolutions()
    if step not in schedule or cfg.tensorf_encoding != "vm":
        return None
    new_res = schedule[step]
    params = jax.device_get(state.params)
    params["encodings"]["density"] = jax.device_get(
        upsample_tensor_vm(state.params["encodings"]["density"], new_res)
    )
    params["encodings"]["color"] = jax.device_get(
        upsample_tensor_vm(state.params["encodings"]["color"], new_res)
    )
    return state.replace(params=params, opt_state=optimizer.init(params))


def _density(cfg, params, aabb, positions):
    pts = SceneBox.get_normalized_positions(positions, aabb) * 2.0 - 1.0
    feats = _apply_encoding(cfg.tensorf_encoding, params["encodings"]["density"], pts)
    return jax.nn.relu(jnp.sum(feats, axis=-1))


def _rgb(cfg, params, aabb, positions, directions):
    pts = SceneBox.get_normalized_positions(positions, aabb) * 2.0 - 1.0
    feats = _apply_encoding(cfg.tensorf_encoding, params["encodings"]["color"], pts)
    rgb_features = feats @ params["fields"]["B"]
    d_enc = nerf_encoding(directions, 2, 0.0, 2.0)
    f_enc = nerf_encoding(rgb_features, 2, 0.0, 2.0)
    h = jnp.concatenate([rgb_features, directions, f_enc, d_enc], axis=-1)
    out = mlp_apply(params["fields"]["mlp_head"], h, activation="relu", output_activation="relu")
    return jax.nn.sigmoid(out)


def get_outputs(
    cfg: Config,
    params: dict,
    aabb: jnp.ndarray,
    ray_bundle: RayBundle,
    rng: Optional[jax.Array] = None,
    train: bool = True,
) -> dict:
    """(ref: models/tensorf.py:246-287)."""
    if ray_bundle.nears is None:
        nears, fars = intersect_aabb(ray_bundle.origins, ray_bundle.directions, aabb)
        ray_bundle = ray_bundle.replace(nears=nears, fars=fars)
    rng_u, rng_pdf, rng_bg = (
        jax.random.split(rng, 3) if rng is not None else (None, None, None)
    )

    coarse = spaced_samples(
        ray_bundle, cfg.num_uniform_samples, "uniform", rng_u,
        stratified=train, single_jitter=True,
    )
    pos_c = coarse.get_positions()
    dens_c = _density(cfg, params, aabb, pos_c.reshape(-1, 3)).reshape(pos_c.shape[:2])
    weights_c = coarse.get_weights(dens_c)

    fine = pdf_samples(
        ray_bundle, coarse, weights_c, cfg.num_samples,
        rng=rng_pdf, stratified=train, single_jitter=True, include_original=False,
    )
    pos_f = fine.get_positions()
    n, s = pos_f.shape[:2]
    dens_f = _density(cfg, params, aabb, pos_f.reshape(-1, 3)).reshape(n, s)
    dirs = jnp.broadcast_to(fine.directions[:, None, :], (n, s, 3)).reshape(-1, 3)
    rgb_f = _rgb(cfg, params, aabb, pos_f.reshape(-1, 3), dirs).reshape(n, s, 3)
    weights = fine.get_weights(dens_f)

    return {
        "rgb": render_rgb(rgb_f, weights, cfg.background_color, rng_bg, train),
        "accumulation": render_accumulation(weights),
        "depth": render_depth(weights, fine),
    }


def get_metrics_dict(cfg: Config, outputs: dict, batch: dict, step=0) -> dict:
    mse = jnp.mean((outputs["rgb"] - batch["image"]) ** 2)
    return {"psnr": -10.0 * jnp.log10(mse)}


def get_loss_dict(
    cfg: Config, params: dict, outputs: dict, batch: dict, metrics_dict=None, train=True,
    rng=None,
) -> Dict:
    """(ref: models/tensorf.py:289-298)."""
    return {"rgb_loss": L.mse_loss(batch["image"], outputs["rgb"])}
