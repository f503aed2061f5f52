"""NeRFPlayer-nerfacto field: temporal hash grid + nerfacto color path.

Functional re-design of ``fields/nerfplayer_nerfacto_field.py``:
NerfplayerNerfactoField (temporal grid encoder -> decode MLP -> SH-dir +
appearance color MLP, ref: :152-409) and TemporalHashMLPDensityField
(temporal grid -> linear density, ref: :50-150).
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


def _normalize(disable_contraction: bool, positions, aabb):
    """(ref: nerfplayer_nerfacto_field.py:135-139, 330-339)."""
    if disable_contraction:
        return SceneBox.get_normalized_positions(positions, aabb)
    return (scene_contraction(positions, order=jnp.inf) + 2.0) / 4.0


@dataclass(frozen=True)
class NerfplayerNerfactoFieldConfig:
    """(ref: nerfplayer_nerfacto_field.py:177-200)."""

    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    temporal_dim: int = 64
    num_levels: int = 16
    features_per_level: int = 2
    log2_hashmap_size: int = 19
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    appearance_embedding_dim: int = 32
    use_appearance_embedding: bool = True
    use_average_appearance_embedding: bool = False
    disable_viewing_dependent: bool = False
    disable_scene_contraction: bool = False
    num_images: int = 0
    sh_degree: int = 4
    desired_resolution: int = 1024  # scaled by aabb extent in the reference
    # True when sample positions/times carry no loss gradient (PDF bins
    # stop-gradient'ed, camera optimizer off — the registry defaults):
    # the encode backward then skips the dead input-cotangent work.  The
    # Trainer flips this off when a camera optimizer is enabled.
    detached_inputs: bool = True

    @property
    def grid(self) -> HashGridConfig:
        return HashGridConfig(
            temporal_dim=self.temporal_dim,
            num_levels=self.num_levels,
            level_dim=self.features_per_level,
            log2_hashmap_size=self.log2_hashmap_size,
            desired_resolution=self.desired_resolution,
        )


def init_nerfplayer_nerfacto_field(rng, cfg: NerfplayerNerfactoFieldConfig) -> dict:
    keys = jax.random.split(rng, 4)
    grid_dim = cfg.num_levels * cfg.features_per_level
    params = {
        "grid": init_hash_grid(keys[0], cfg.grid),
        "mlp_base_decode": init_mlp(
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


def nerfplayer_nerfacto_density(
    cfg: NerfplayerNerfactoFieldConfig,
    params: dict,
    aabb: jnp.ndarray,
    positions: jnp.ndarray,
    times: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(ref: nerfplayer_nerfacto_field.py:318-352 get_density)."""
    pts = _normalize(cfg.disable_scene_contraction, positions, aabb)
    feats = hash_grid_encode(cfg.grid, params["grid"], pts, times,
                             input_grads=not cfg.detached_inputs)
    out = mlp_apply(params["mlp_base_decode"], feats, activation="relu")
    return trunc_exp(out[..., 0]), out[..., 1:]


def nerfplayer_nerfacto_rgb(
    cfg: NerfplayerNerfactoFieldConfig,
    params: dict,
    geo_feats: jnp.ndarray,
    directions: jnp.ndarray,
    camera_indices: Optional[jnp.ndarray],
    train: bool = True,
) -> jnp.ndarray:
    """(ref: nerfplayer_nerfacto_field.py:354-409 color path)."""
    parts = []
    if not cfg.disable_viewing_dependent:
        parts.append(components_from_spherical_harmonics(cfg.sh_degree, directions))
    parts.append(geo_feats)
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


def field_temporal_tv(cfg: NerfplayerNerfactoFieldConfig, params: dict, rng) -> jnp.ndarray:
    return temporal_tv_loss(cfg.grid, params["grid"], rng)


# ---------------------------------------------------------------------------
# Temporal proposal density field (ref: nerfplayer_nerfacto_field.py:50-150)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class TemporalHashMLPDensityFieldConfig:
    temporal_dim: int = 64
    num_layers: int = 2
    hidden_dim: int = 64
    num_levels: int = 8
    max_res: int = 1024
    base_res: int = 16
    log2_hashmap_size: int = 18
    features_per_level: int = 2
    disable_scene_contraction: bool = False
    detached_inputs: bool = True  # see NerfplayerNerfactoFieldConfig

    @property
    def grid(self) -> HashGridConfig:
        return HashGridConfig(
            temporal_dim=self.temporal_dim,
            num_levels=self.num_levels,
            level_dim=self.features_per_level,
            base_resolution=self.base_res,
            desired_resolution=self.max_res,
            log2_hashmap_size=self.log2_hashmap_size,
            # additive z hash: the registry prop nets run temporal_dim=32
            # (c_row=34, pair row = 68 bf16 lanes = one tile), so the
            # encode's paired forward halves the gather rows of the
            # HASHED levels too (dense levels pair via the linear stride
            # regardless of scheme); collision quality A/B'd equal for
            # the static grids (PERF.md r3) and re-checked for the
            # temporal prop fit (tests/test_hash_grid.py)
            hash_scheme="zline",
        )


def init_temporal_density_field(rng, cfg: TemporalHashMLPDensityFieldConfig) -> dict:
    k1, k2 = jax.random.split(rng)
    grid_dim = cfg.num_levels * cfg.features_per_level
    return {
        "grid": init_hash_grid(k1, cfg.grid),
        "mlp": init_mlp(k2, grid_dim, cfg.hidden_dim, cfg.num_layers - 1, 1),
    }


def temporal_density_field_density(
    cfg: TemporalHashMLPDensityFieldConfig,
    params: dict,
    aabb: jnp.ndarray,
    positions: jnp.ndarray,
    times: jnp.ndarray,
) -> jnp.ndarray:
    """(ref: nerfplayer_nerfacto_field.py:133-150)."""
    pts = _normalize(cfg.disable_scene_contraction, positions, aabb)
    feats = hash_grid_encode(cfg.grid, params["grid"], pts, times,
                             input_grads=not cfg.detached_inputs)
    density_before = mlp_apply(params["mlp"], feats, activation="relu")[..., 0]
    return trunc_exp(density_before)


def proposal_temporal_tv(cfg: TemporalHashMLPDensityFieldConfig, params: dict, rng):
    return temporal_tv_loss(cfg.grid, params["grid"], rng)
