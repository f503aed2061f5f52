"""Full NeRFPlayer field — static/deform/new-content decomposition.

Functional re-design of ``fields/nerfplayer_field.py:147-415``:
  deformation MLP (3 -> 128x3 -> 3 offset),
  stationary hash grid sampled at original AND deformed positions, each
    passed through a (features, t) -> features MLP,
  newness temporal grid,
  decomposition temporal grid -> MLP -> softmax(P_stat, P_deform, P_new),
  probability-mixed features -> decode MLP -> (density, geo) -> color MLP.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

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
class NerfplayerFieldConfig:
    """(ref: nerfplayer_field.py:174-198)."""

    num_layers: int = 3
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    temporal_dim: int = 64
    num_levels: int = 16
    features_per_level: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    num_layers_color: int = 4
    hidden_dim_color: int = 64
    disable_viewing_dependent: bool = False
    disable_scene_contraction: bool = False
    num_images: int = 0
    sh_degree: int = 4
    desired_resolution: int = 1024
    # True when sample positions/times carry no loss gradient (PDF bins
    # stop-gradient'ed, camera optimizer off — the registry defaults):
    # the encode backward then skips the dead input-cotangent work.  The
    # Trainer flips this off when a camera optimizer is enabled.  The
    # DEFORMED-position encode always keeps the full backward (the
    # deformation MLP's gradient rides the encode's position cotangent).
    detached_inputs: bool = True

    @property
    def feature_dim(self) -> int:
        return self.num_levels * self.features_per_level

    @property
    def static_grid(self) -> HashGridConfig:
        # per_level_scale 1.4473 fixed in the reference (nerfplayer_field.py:252)
        return HashGridConfig(
            temporal_dim=0,
            num_levels=self.num_levels,
            level_dim=self.features_per_level,
            base_resolution=self.base_resolution,
            per_level_scale=1.4472692012786865,
            log2_hashmap_size=self.log2_hashmap_size,
            # paired z-corner gathers on TPU — halves the stationary
            # encodes' gather rows (see HashGridConfig.hash_scheme)
            hash_scheme="zline",
        )

    @property
    def temporal_grid(self) -> HashGridConfig:
        return HashGridConfig(
            temporal_dim=self.temporal_dim,
            num_levels=self.num_levels,
            level_dim=self.features_per_level,
            base_resolution=self.base_resolution,
            desired_resolution=self.desired_resolution,
            log2_hashmap_size=self.log2_hashmap_size,
        )


def init_nerfplayer_field(rng: jax.Array, cfg: NerfplayerFieldConfig) -> dict:
    keys = jax.random.split(rng, 8)
    F = cfg.feature_dim
    params = {
        "deformation_field": init_mlp(keys[0], 3, 128, 3, 3),
        "stationary_field": init_hash_grid(keys[1], cfg.static_grid),
        "stationary_field_mlp": init_mlp(keys[2], F + 1, 64, 1, F),
        "newness_field": init_hash_grid(keys[3], cfg.temporal_grid),
        "decomposition_field": init_hash_grid(keys[4], cfg.temporal_grid),
        "decomposition_mlp": init_mlp(keys[5], F, 64, 1, 3),
        "mlp_base_decode": init_mlp(
            keys[6], F, cfg.hidden_dim, cfg.num_layers - 1, 1 + cfg.geo_feat_dim
        ),
    }
    in_dim = cfg.geo_feat_dim
    if not cfg.disable_viewing_dependent:
        in_dim += cfg.sh_degree**2
    params["mlp_head"] = init_mlp(
        keys[7], in_dim, cfg.hidden_dim_color, cfg.num_layers_color - 1, 3
    )
    return params


def _normalize(cfg, positions, aabb):
    if cfg.disable_scene_contraction:
        return SceneBox.get_normalized_positions(positions, aabb)
    return (scene_contraction(positions, order=jnp.inf) + 2.0) / 4.0


def nerfplayer_density(
    cfg: NerfplayerFieldConfig,
    params: dict,
    aabb: jnp.ndarray,
    positions: jnp.ndarray,
    times: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(ref: nerfplayer_field.py:331-383 get_density).

    Returns (density [M], geo [M, geo_feat], probs [M, 3]).
    """
    pts = _normalize(cfg, positions, aabb)
    t = times[:, None]

    # 1. deformation offset
    deformation = mlp_apply(params["deformation_field"], pts, activation="relu")
    deformed = pts + deformation

    # 2. stationary features at both positions, time-conditioned MLP.
    # DEFORMED positions carry gradient into the deformation MLP and
    # keep the full backward; the raw-pts encodes skip the dead
    # input-cotangent work when cfg.detached_inputs (see config).
    ig = not cfg.detached_inputs
    v_stat = hash_grid_encode(
        cfg.static_grid, params["stationary_field"], pts, input_grads=ig
    )
    v_deform = hash_grid_encode(cfg.static_grid, params["stationary_field"], deformed)
    v_stat = mlp_apply(
        params["stationary_field_mlp"], jnp.concatenate([v_stat, t], -1), activation="relu"
    )
    v_deform = mlp_apply(
        params["stationary_field_mlp"], jnp.concatenate([v_deform, t], -1), activation="relu"
    )

    # 3. newness features
    v_new = hash_grid_encode(
        cfg.temporal_grid, params["newness_field"], pts, times,
        input_grads=ig,
    )

    # 4. decomposition probabilities
    v_decomp = hash_grid_encode(
        cfg.temporal_grid, params["decomposition_field"], pts, times,
        input_grads=ig,
    )
    probs = jax.nn.softmax(
        mlp_apply(params["decomposition_mlp"], v_decomp, activation="relu"), axis=-1
    )

    v = (
        probs[:, 0:1] * v_stat + probs[:, 1:2] * v_deform + probs[:, 2:3] * v_new
    )
    h = mlp_apply(params["mlp_base_decode"], v, activation="relu")
    return trunc_exp(h[..., 0]), h[..., 1:], probs


def nerfplayer_rgb(
    cfg: NerfplayerFieldConfig,
    params: dict,
    geo: jnp.ndarray,
    directions: jnp.ndarray,
) -> jnp.ndarray:
    """(ref: nerfplayer_field.py:385-415)."""
    if cfg.disable_viewing_dependent:
        h = geo
    else:
        h = jnp.concatenate(
            [components_from_spherical_harmonics(cfg.sh_degree, directions), geo], -1
        )
    return mlp_apply(params["mlp_head"], h, activation="relu", output_activation="sigmoid")


def nerfplayer_temporal_tv(cfg: NerfplayerFieldConfig, params: dict, rng) -> jnp.ndarray:
    """TV over both temporal grids (newness + decomposition)."""
    k1, k2 = jax.random.split(rng)
    return temporal_tv_loss(cfg.temporal_grid, params["newness_field"], k1) + temporal_tv_loss(
        cfg.temporal_grid, params["decomposition_field"], k2
    )
