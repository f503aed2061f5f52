"""NeRFPlayer-NGP field (ref: fields/nerfplayer_ngp_field.py).

Temporal hash grid + base MLP + (optionally view-dependent) color MLP,
with instant-ngp-style contraction.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from soccernerfs_tpu.core.math import (
    components_from_spherical_harmonics,
    scene_contraction,
    trunc_exp,
)
from soccernerfs_tpu.core.scene_box import SceneBox
from soccernerfs_tpu.ops.hash_grid import (
    HashGridConfig,
    hash_grid_encode,
    init_hash_grid,
    temporal_tv_loss,
)
from soccernerfs_tpu.ops.mlp import init_mlp, mlp_apply


@dataclass(frozen=True)
class NerfplayerNGPFieldConfig:
    """(ref: nerfplayer_ngp_field.py:40-130)."""

    temporal_dim: int = 64
    num_levels: int = 16
    features_per_level: int = 2
    base_resolution: int = 16
    max_res: int = 2048
    log2_hashmap_size: int = 17
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    use_appearance_embedding: bool = False
    appearance_embedding_dim: int = 32
    num_images: int = 0
    disable_viewing_dependent: bool = True
    contraction_type: str = "aabb"
    sh_degree: int = 4
    # see NerfplayerNerfactoFieldConfig.detached_inputs
    detached_inputs: bool = True

    @property
    def grid(self) -> HashGridConfig:
        return HashGridConfig(
            temporal_dim=self.temporal_dim,
            num_levels=self.num_levels,
            level_dim=self.features_per_level,
            base_resolution=self.base_resolution,
            desired_resolution=self.max_res,
            log2_hashmap_size=self.log2_hashmap_size,
        )


def init_nerfplayer_ngp_field(rng: jax.Array, cfg: NerfplayerNGPFieldConfig) -> dict:
    keys = jax.random.split(rng, 4)
    grid_dim = cfg.num_levels * cfg.features_per_level
    params = {
        "grid": init_hash_grid(keys[0], cfg.grid),
        "mlp_base": init_mlp(
            keys[1], grid_dim, cfg.hidden_dim, cfg.num_layers - 1, 1 + cfg.geo_feat_dim
        ),
    }
    in_dim = cfg.geo_feat_dim
    if not cfg.disable_viewing_dependent:
        in_dim += cfg.sh_degree**2
    if cfg.use_appearance_embedding:
        in_dim += cfg.appearance_embedding_dim
        params["appearance_embedding"] = jax.random.normal(
            keys[2], (max(cfg.num_images, 1), cfg.appearance_embedding_dim)
        )
    params["mlp_head"] = init_mlp(
        keys[3], in_dim, cfg.hidden_dim_color, cfg.num_layers_color - 1, 3
    )
    return params


def _normalize(cfg, positions, aabb):
    if cfg.contraction_type == "aabb":
        return SceneBox.get_normalized_positions(positions, aabb)
    order = None if cfg.contraction_type == "un_bounded_sphere" else jnp.inf
    return (scene_contraction(positions, order=order) + 2.0) / 4.0


def nerfplayer_ngp_density(
    cfg: NerfplayerNGPFieldConfig,
    params: dict,
    aabb: jnp.ndarray,
    positions: jnp.ndarray,
    times: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    pts = _normalize(cfg, positions, aabb)
    feats = hash_grid_encode(cfg.grid, params["grid"], pts, times,
                             input_grads=not cfg.detached_inputs)
    out = mlp_apply(params["mlp_base"], feats, activation="relu")
    return trunc_exp(out[..., 0]), out[..., 1:]


def nerfplayer_ngp_rgb(
    cfg: NerfplayerNGPFieldConfig,
    params: dict,
    geo: jnp.ndarray,
    directions: jnp.ndarray,
    camera_indices: Optional[jnp.ndarray],
    train: bool = True,
) -> jnp.ndarray:
    parts = []
    if not cfg.disable_viewing_dependent:
        parts.append(components_from_spherical_harmonics(cfg.sh_degree, directions))
    parts.append(geo)
    if cfg.use_appearance_embedding:
        emb = params["appearance_embedding"]
        if train:
            assert camera_indices is not None
            parts.append(jnp.take(emb, camera_indices, axis=0))
        else:
            parts.append(
                jnp.broadcast_to(emb.mean(axis=0), (directions.shape[0], emb.shape[-1]))
            )
    h = jnp.concatenate(parts, axis=-1)
    return mlp_apply(params["mlp_head"], h, activation="relu", output_activation="sigmoid")


def ngp_field_temporal_tv(cfg: NerfplayerNGPFieldConfig, params: dict, rng) -> jnp.ndarray:
    return temporal_tv_loss(cfg.grid, params["grid"], rng)
