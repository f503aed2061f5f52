"""Scene bounding box (ref: data/scene_box.py)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class SceneBox:
    """Axis-aligned scene bounds (ref: data/scene_box.py:27-80)."""

    aabb: jnp.ndarray  # [2, 3] min and max corners

    @staticmethod
    def get_normalized_positions(positions: jnp.ndarray, aabb: jnp.ndarray) -> jnp.ndarray:
        """Map world positions into [0, 1]^3 w.r.t. the aabb
        (ref: data/scene_box.py:56-65)."""
        return (positions - aabb[0]) / (aabb[1] - aabb[0])

    def get_diagonal_length(self) -> jnp.ndarray:
        diff = self.aabb[1] - self.aabb[0]
        return jnp.sqrt(jnp.sum(diff**2))

    def get_center(self) -> jnp.ndarray:
        return (self.aabb[0] + self.aabb[1]) / 2.0

    @staticmethod
    def from_camera_poses(poses: np.ndarray, scale_factor: float) -> "SceneBox":
        """Box bounding the camera origins, scaled (ref: data/scene_box.py:82-97)."""
        xyzs = poses[..., :3, -1]
        aabb = np.stack([xyzs.min(axis=0), xyzs.max(axis=0)])
        return SceneBox(aabb=jnp.asarray(aabb * scale_factor, dtype=jnp.float32))
