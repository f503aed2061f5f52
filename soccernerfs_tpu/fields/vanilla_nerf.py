"""Classic NeRF field (ref: fields/vanilla_nerf_field.py NeRFField).

Positional-encoded MLP with a skip connection, density + view-dependent
RGB heads; supports mip-NeRF's integrated positional encoding via
optional sample covariances.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from soccernerfs_tpu.ops.encodings import nerf_encoding
from soccernerfs_tpu.ops.mlp import init_mlp, mlp_apply


@dataclass(frozen=True)
class NeRFFieldConfig:
    """(ref: vanilla_nerf_field.py:38-80): 8x256 base MLP, skip at 4."""

    position_encoding_num_frequencies: int = 10
    position_encoding_max: float = 8.0
    direction_encoding_num_frequencies: int = 4
    direction_encoding_max: float = 4.0
    base_mlp_num_layers: int = 8
    base_mlp_layer_width: int = 256
    skip_connections: Tuple[int, ...] = (4,)
    head_mlp_num_layers: int = 2
    head_mlp_layer_width: int = 128
    use_integrated_encoding: bool = False

    @property
    def pos_dim(self) -> int:
        return 3 * self.position_encoding_num_frequencies * 2

    @property
    def dir_dim(self) -> int:
        return 3 * self.direction_encoding_num_frequencies * 2


def init_nerf_field(rng: jax.Array, cfg: NeRFFieldConfig) -> dict:
    keys = jax.random.split(rng, 4)
    W = cfg.base_mlp_layer_width
    # base MLP split at the skip connection
    skip = cfg.skip_connections[0]
    params = {
        "mlp_pre": init_mlp(keys[0], cfg.pos_dim, W, skip - 1, W),
        "mlp_post": init_mlp(
            keys[1], W + cfg.pos_dim, W, cfg.base_mlp_num_layers - skip - 1, W
        ),
        "density_head": init_mlp(keys[2], W, W, 0, 1),
        "rgb_head": init_mlp(
            keys[3], W + cfg.dir_dim, cfg.head_mlp_layer_width,
            cfg.head_mlp_num_layers - 1, 3,
        ),
    }
    return params


def nerf_field_forward(
    cfg: NeRFFieldConfig,
    params: dict,
    positions: jnp.ndarray,
    directions: jnp.ndarray,
    covs: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(density [M], rgb [M, 3]) at positions with view directions."""
    pe = nerf_encoding(
        positions,
        cfg.position_encoding_num_frequencies,
        0.0,
        cfg.position_encoding_max,
        covs=covs if cfg.use_integrated_encoding else None,
    )
    h = mlp_apply(params["mlp_pre"], pe, activation="relu", output_activation="relu")
    h = mlp_apply(
        params["mlp_post"],
        jnp.concatenate([h, pe], axis=-1),
        activation="relu",
        output_activation="relu",
    )
    density = jax.nn.relu(
        mlp_apply(params["density_head"], h, activation="none")[..., 0]
    )
    de = nerf_encoding(
        directions,
        cfg.direction_encoding_num_frequencies,
        0.0,
        cfg.direction_encoding_max,
    )
    rgb = mlp_apply(
        params["rgb_head"],
        jnp.concatenate([h, de], axis=-1),
        activation="relu",
        output_activation="sigmoid",
    )
    return density, rgb
