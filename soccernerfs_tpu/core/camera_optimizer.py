"""Camera pose optimization (ref: cameras/camera_optimizers.py).

Learned per-camera SE(3)/SO(3)xR3 pose corrections applied inside the
jitted train step.  The reference's nn.Module with an internal Parameter
becomes an init/apply pair; the optional synthetic pose noise
(ref: camera_optimizers.py:79-91) is baked into a non-trainable buffer at
init so eval can undo it deterministically.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from soccernerfs_tpu.core.lie_groups import exp_map_SE3, exp_map_SO3xR3


@dataclass(frozen=True)
class CameraOptimizerConfig:
    """(ref: camera_optimizers.py:41-64).  ``mode``: off | SO3xR3 | SE3."""

    mode: str = "off"
    position_noise_std: float = 0.0
    orientation_noise_std: float = 0.0


def init_camera_optimizer(
    rng: jax.Array, cfg: CameraOptimizerConfig, num_cameras: int
) -> dict:
    """Zero pose adjustments + optional frozen synthetic noise."""
    params = {"pose_adjustment": jnp.zeros((num_cameras, 6), jnp.float32)}
    if cfg.position_noise_std != 0.0 or cfg.orientation_noise_std != 0.0:
        assert cfg.position_noise_std >= 0.0 and cfg.orientation_noise_std >= 0.0
        std = jnp.asarray(
            [cfg.position_noise_std] * 3 + [cfg.orientation_noise_std] * 3
        )
        noise = jax.random.normal(rng, (num_cameras, 6)) * std
        params["pose_noise"] = exp_map_SE3(noise)  # [N, 3, 4], non-trainable
    return params


def apply_camera_optimizer(
    cfg: CameraOptimizerConfig,
    params: Optional[dict],
    indices: jnp.ndarray,
) -> Optional[jnp.ndarray]:
    """Per-ray [R, 3, 4] camera_opt_to_camera correction, or None when off
    (ref: camera_optimizers.py:93-130)."""
    if cfg.mode == "off" or params is None:
        return None
    adj = params["pose_adjustment"][indices]
    if cfg.mode == "SO3xR3":
        correction = exp_map_SO3xR3(adj)
    elif cfg.mode == "SE3":
        correction = exp_map_SE3(adj)
    else:
        raise ValueError(f"unknown camera optimizer mode {cfg.mode}")
    if "pose_noise" in params:
        noise = jax.lax.stop_gradient(params["pose_noise"][indices])
        R1, t1 = noise[..., :3], noise[..., 3:]
        R2, t2 = correction[..., :3], correction[..., 3:]
        correction = jnp.concatenate([R1 @ R2, R1 @ t2 + t1], axis=-1)
    return correction
