"""Nerfacto field — hash-grid compound field.

Functional re-design of ``fields/nerfacto_field.py`` (TCNNNerfactoField)
and ``fields/density_fields.py`` (HashMLPDensityField): tcnn
NetworkWithInputEncoding becomes ops/hash_grid + bf16 MLPs; the SH
direction encoding and appearance embeddings match the reference wiring.
Optional predicted normals use a small head on the geo features
(ref: nerfacto_field.py:204-232); density-gradient normals come from
jax.grad where the reference used autograd (base_field.py:70-91).
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
from soccernerfs_tpu.ops.hash_grid import HashGridConfig, hash_grid_encode, init_hash_grid
from soccernerfs_tpu.ops.mlp import init_mlp, mlp_apply


@dataclass(frozen=True)
class NerfactoFieldConfig:
    """(ref: nerfacto_field.py:85-108 constructor defaults)."""

    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_levels: int = 16
    base_res: int = 16
    max_res: int = 2048
    log2_hashmap_size: int = 19
    features_per_level: int = 2
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    appearance_embedding_dim: int = 32
    use_appearance_embedding: bool = True
    use_average_appearance_embedding: bool = False
    use_pred_normals: bool = False
    disable_scene_contraction: bool = False
    num_images: int = 0
    sh_degree: int = 4

    @property
    def grid(self) -> HashGridConfig:
        return HashGridConfig(
            temporal_dim=0,
            num_levels=self.num_levels,
            level_dim=self.features_per_level,
            base_resolution=self.base_res,
            desired_resolution=self.max_res,
            log2_hashmap_size=self.log2_hashmap_size,
            # paired z-corner gathers on TPU (see HashGridConfig.hash_scheme)
            hash_scheme="zline",
        )


def init_nerfacto_field(rng: jax.Array, cfg: NerfactoFieldConfig) -> dict:
    keys = jax.random.split(rng, 5)
    grid_dim = cfg.num_levels * cfg.features_per_level
    params = {
        "grid": init_hash_grid(keys[0], cfg.grid),
        "mlp_base": init_mlp(
            keys[1], grid_dim, cfg.hidden_dim, cfg.num_layers - 1, 1 + cfg.geo_feat_dim
        ),
    }
    in_dim_color = cfg.geo_feat_dim + cfg.sh_degree**2
    if cfg.use_appearance_embedding:
        in_dim_color += cfg.appearance_embedding_dim
        params["appearance_embedding"] = jax.random.normal(
            keys[2], (max(cfg.num_images, 1), cfg.appearance_embedding_dim)
        )
    params["mlp_head"] = init_mlp(
        keys[3], in_dim_color, cfg.hidden_dim_color, cfg.num_layers_color - 1, 3
    )
    if cfg.use_pred_normals:
        params["mlp_pred_normals"] = init_mlp(
            keys[4], cfg.geo_feat_dim + 3, 64, 2, 3
        )
    return params


def _normalize(cfg, positions: jnp.ndarray, aabb: jnp.ndarray) -> jnp.ndarray:
    """World -> [0, 1]^3 grid coords (ref: nerfacto_field.py:252-262)."""
    if cfg.disable_scene_contraction:
        return SceneBox.get_normalized_positions(positions, aabb)
    pos = scene_contraction(positions, order=jnp.inf)
    return (pos + 2.0) / 4.0


def nerfacto_density(
    cfg: NerfactoFieldConfig, params: dict, aabb: jnp.ndarray, positions: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """density + geo features at world positions [M, 3]
    (ref: nerfacto_field.py:249-271)."""
    pts = _normalize(cfg, positions, aabb)
    feats = hash_grid_encode(cfg.grid, params["grid"], pts)
    out = mlp_apply(params["mlp_base"], feats, activation="relu")
    density_before, geo = out[..., 0], out[..., 1:]
    return trunc_exp(density_before), geo


def nerfacto_rgb(
    cfg: NerfactoFieldConfig,
    params: dict,
    geo_feats: jnp.ndarray,
    directions: jnp.ndarray,
    camera_indices: Optional[jnp.ndarray],
    train: bool = True,
) -> jnp.ndarray:
    """(ref: nerfacto_field.py:273-326 get_outputs color path)."""
    d_enc = components_from_spherical_harmonics(cfg.sh_degree, directions)
    parts = [d_enc, geo_feats]
    if cfg.use_appearance_embedding:
        emb = params["appearance_embedding"]
        if train:
            assert camera_indices is not None
            parts.append(jnp.take(emb, camera_indices, axis=0))
        elif cfg.use_average_appearance_embedding:
            parts.append(
                jnp.broadcast_to(emb.mean(axis=0), (directions.shape[0], emb.shape[-1]))
            )
        else:
            parts.append(jnp.zeros((directions.shape[0], emb.shape[-1])))
    h = jnp.concatenate(parts, axis=-1)
    return mlp_apply(params["mlp_head"], h, activation="relu", output_activation="sigmoid")


def nerfacto_pred_normals(
    cfg: NerfactoFieldConfig, params: dict, geo_feats: jnp.ndarray, positions: jnp.ndarray
) -> jnp.ndarray:
    """Predicted normals head (ref: nerfacto_field.py:300-312)."""
    h = jnp.concatenate([positions, geo_feats], axis=-1)
    n = mlp_apply(params["mlp_pred_normals"], h, activation="relu")
    return n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-10)


def nerfacto_normals(
    cfg: NerfactoFieldConfig, params: dict, aabb: jnp.ndarray, positions: jnp.ndarray
) -> jnp.ndarray:
    """Density-gradient normals (ref: base_field.py:70-91) via jax.grad."""

    def density_sum(p):
        d, _ = nerfacto_density(cfg, params, aabb, p)
        return jnp.sum(d)

    g = jax.grad(density_sum)(positions)
    return -g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-10)


# ---------------------------------------------------------------------------
# Proposal density field (ref: density_fields.py:39-128)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class HashMLPDensityFieldConfig:
    num_layers: int = 2
    hidden_dim: int = 64
    use_linear: bool = False
    num_levels: int = 8
    max_res: int = 1024
    base_res: int = 16
    log2_hashmap_size: int = 18
    features_per_level: int = 2
    disable_scene_contraction: bool = False

    @property
    def grid(self) -> HashGridConfig:
        return HashGridConfig(
            temporal_dim=0,
            num_levels=self.num_levels,
            level_dim=self.features_per_level,
            base_resolution=self.base_res,
            desired_resolution=self.max_res,
            log2_hashmap_size=self.log2_hashmap_size,
            # paired z-corner gathers on TPU (see HashGridConfig.hash_scheme)
            hash_scheme="zline",
        )


def init_hash_density_field(rng: jax.Array, cfg: HashMLPDensityFieldConfig) -> dict:
    k1, k2 = jax.random.split(rng)
    grid_dim = cfg.num_levels * cfg.features_per_level
    if cfg.use_linear:
        mlp = init_mlp(k2, grid_dim, cfg.hidden_dim, 0, 1)
    else:
        mlp = init_mlp(k2, grid_dim, cfg.hidden_dim, cfg.num_layers - 1, 1)
    return {"grid": init_hash_grid(k1, cfg.grid), "mlp": mlp}


def hash_density_field_density(
    cfg: HashMLPDensityFieldConfig, params: dict, aabb: jnp.ndarray, positions: jnp.ndarray
) -> jnp.ndarray:
    """(ref: density_fields.py:101-128)."""
    pts = _normalize(cfg, positions, aabb)
    feats = hash_grid_encode(cfg.grid, params["grid"], pts)
    act = "none" if cfg.use_linear else "relu"
    density_before = mlp_apply(params["mlp"], feats, activation=act)[..., 0]
    return trunc_exp(density_before)
