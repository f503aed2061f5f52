"""Cameras and ray generation.

TPU-native re-design of ``cameras/cameras.py``: Cameras is a flat flax
pytree of per-camera tensors (``times`` and ``ids`` are the fork's dynamic
-scene additions, ref: cameras/cameras.py:94-95), and ``generate_rays`` is
a branchless vectorized function that runs *inside* the jitted train step —
the reference's masked_select per-camera-type scatter writes
(cameras.py:662-702) become jnp.where selects over all three camera
models, which XLA fuses into one pass.
"""
from __future__ import annotations

import enum
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from soccernerfs_tpu.core.rays import RayBundle


class CameraType(enum.IntEnum):
    """Supported camera models (ref: cameras/cameras.py:42-48)."""

    PERSPECTIVE = 1
    FISHEYE = 2
    EQUIRECTANGULAR = 3


CAMERA_MODEL_TO_TYPE = {
    "SIMPLE_PINHOLE": CameraType.PERSPECTIVE,
    "PINHOLE": CameraType.PERSPECTIVE,
    "SIMPLE_RADIAL": CameraType.PERSPECTIVE,
    "RADIAL": CameraType.PERSPECTIVE,
    "OPENCV": CameraType.PERSPECTIVE,
    "OPENCV_FISHEYE": CameraType.FISHEYE,
    "EQUIRECTANGULAR": CameraType.EQUIRECTANGULAR,
}


@struct.dataclass
class Cameras:
    """Batched cameras (ref: cameras/cameras.py:61-95).

    All per-camera scalars are [N]; ``camera_to_worlds`` is [N, 3, 4] in
    [R|t] form.  ``times``/``ids`` are the SoccerNeRFs fork's additions for
    dynamic scenes and per-physical-camera bookkeeping.
    """

    camera_to_worlds: jnp.ndarray  # [N, 3, 4]
    fx: jnp.ndarray  # [N]
    fy: jnp.ndarray  # [N]
    cx: jnp.ndarray  # [N]
    cy: jnp.ndarray  # [N]
    width: jnp.ndarray  # [N] int32
    height: jnp.ndarray  # [N] int32
    distortion_params: Optional[jnp.ndarray] = None  # [N, 6] k1 k2 k3 k4 p1 p2
    camera_type: Optional[jnp.ndarray] = None  # [N] int32 CameraType values
    times: Optional[jnp.ndarray] = None  # [N] in [0, 1]
    ids: Optional[jnp.ndarray] = None  # [N] int32 physical-camera ids

    @property
    def num_cameras(self) -> int:
        return self.camera_to_worlds.shape[0]

    @property
    def image_height(self):
        return self.height

    @property
    def image_width(self):
        return self.width

    @classmethod
    def create(
        cls,
        camera_to_worlds,
        fx,
        fy,
        cx,
        cy,
        width,
        height,
        distortion_params=None,
        camera_type=CameraType.PERSPECTIVE,
        times=None,
        ids=None,
    ) -> "Cameras":
        """Build Cameras with scalar broadcasting, mirroring the reference
        constructor's convenience (ref: cameras/cameras.py:97-186)."""
        c2w = jnp.asarray(camera_to_worlds, jnp.float32)
        n = c2w.shape[0]

        def bc(v, dtype=jnp.float32):
            arr = jnp.asarray(v, dtype)
            return jnp.broadcast_to(arr, (n,)) if arr.ndim == 0 else arr

        if isinstance(camera_type, CameraType):
            camera_type = int(camera_type)
        return cls(
            camera_to_worlds=c2w,
            fx=bc(fx),
            fy=bc(fy),
            cx=bc(cx),
            cy=bc(cy),
            width=bc(width, jnp.int32),
            height=bc(height, jnp.int32),
            distortion_params=(
                None
                if distortion_params is None
                else jnp.asarray(distortion_params, jnp.float32)
            ),
            camera_type=bc(camera_type, jnp.int32),
            times=None if times is None else jnp.asarray(times, jnp.float32),
            ids=None if ids is None else jnp.asarray(ids, jnp.int32),
        )


def get_image_coords(height: int, width: int, pixel_offset: float = 0.5) -> jnp.ndarray:
    """[H, W, 2] (row, col) pixel-center coordinates
    (ref: cameras/cameras.py:271-287)."""
    y = jnp.arange(height, dtype=jnp.float32) + pixel_offset
    x = jnp.arange(width, dtype=jnp.float32) + pixel_offset
    yy, xx = jnp.meshgrid(y, x, indexing="ij")
    return jnp.stack([yy, xx], axis=-1)


def radial_and_tangential_undistort(
    coords: jnp.ndarray,
    distortion_params: jnp.ndarray,
    max_iterations: int = 10,
) -> jnp.ndarray:
    """Iteratively invert the OpenCV radial+tangential distortion model.

    Newton iterations on the residual f(x,y) = distort(x,y) - (xd,yd)
    (ref: cameras/camera_utils.py:297-413, from MultiNeRF).  Fixed
    iteration count keeps the loop jit-static.

    Args:
        coords: [..., 2] distorted normalized image coords.
        distortion_params: [..., 6] (k1, k2, k3, k4, p1, p2).
    """
    k1, k2, k3, k4, p1, p2 = (distortion_params[..., i] for i in range(6))
    xd, yd = coords[..., 0], coords[..., 1]

    def body(_, xy):
        x, y = xy
        r = x * x + y * y
        d = 1.0 + r * (k1 + r * (k2 + r * (k3 + r * k4)))
        fx = d * x + 2 * p1 * x * y + p2 * (r + 2 * x * x) - xd
        fy = d * y + 2 * p2 * x * y + p1 * (r + 2 * y * y) - yd
        d_r = k1 + r * (2.0 * k2 + r * (3.0 * k3 + r * 4.0 * k4))
        d_x = 2.0 * x * d_r
        d_y = 2.0 * y * d_r
        fx_x = d + d_x * x + 2.0 * p1 * y + 6.0 * p2 * x
        fx_y = d_y * x + 2.0 * p1 * x + 2.0 * p2 * y
        fy_x = d_x * y + 2.0 * p2 * y + 2.0 * p1 * x
        fy_y = d + d_y * y + 2.0 * p2 * x + 6.0 * p1 * y
        denom = fy_x * fx_y - fx_x * fy_y
        x_num = fx * fy_y - fy * fx_y
        y_num = fy * fx_x - fx * fy_x
        step_x = jnp.where(jnp.abs(denom) > 1e-3, x_num / denom, jnp.zeros_like(denom))
        step_y = jnp.where(jnp.abs(denom) > 1e-3, y_num / denom, jnp.zeros_like(denom))
        return (x + step_x, y + step_y)

    x, y = jax.lax.fori_loop(0, max_iterations, body, (xd, yd))
    return jnp.stack([x, y], axis=-1)


def generate_rays(
    cameras: Cameras,
    camera_indices: jnp.ndarray,
    coords: jnp.ndarray,
    camera_opt_to_camera: Optional[jnp.ndarray] = None,
    disable_distortion: bool = False,
) -> RayBundle:
    """Generate world-space rays for (camera, pixel) pairs.

    Functional core of Cameras.generate_rays /
    _generate_rays_from_coords (ref: cameras/cameras.py:327-760):
    x/y offsets for the pixel-footprint estimate, iterative undistortion,
    per-type camera-frame directions (perspective / fisheye /
    equirectangular selected branchlessly), rotation into world space,
    pixel_area from adjacent-ray direction deltas, and per-ray ``times``
    lifted from the camera.  ``directions_norm`` (ref: cameras.py:740,
    stored in metadata) is a first-class RayBundle field here.

    Args:
        camera_indices: [R] int32 indices into ``cameras``.
        coords: [R, 2] (row, col) pixel coordinates (typically +0.5).
        camera_opt_to_camera: [R, 3, 4] optional pose-optimizer correction.
    Returns:
        RayBundle with R rays.
    """
    idx = camera_indices
    y = coords[..., 0]
    x = coords[..., 1]
    fx = cameras.fx[idx]
    fy = cameras.fy[idx]
    cx = cameras.cx[idx]
    cy = cameras.cy[idx]

    # base coord and +1px offsets in x and y for the footprint estimate
    coord = jnp.stack([(x - cx) / fx, -(y - cy) / fy], axis=-1)
    coord_x = jnp.stack([(x - cx + 1) / fx, -(y - cy) / fy], axis=-1)
    coord_y = jnp.stack([(x - cx) / fx, -(y - cy + 1) / fy], axis=-1)
    coord_stack = jnp.stack([coord, coord_x, coord_y], axis=0)  # [3, R, 2]

    cam_type = (
        cameras.camera_type[idx]
        if cameras.camera_type is not None
        else jnp.full(idx.shape, int(CameraType.PERSPECTIVE), jnp.int32)
    )

    if not disable_distortion and cameras.distortion_params is not None:
        dist = cameras.distortion_params[idx]
        undistorted = radial_and_tangential_undistort(
            coord_stack, jnp.broadcast_to(dist, (3,) + dist.shape)
        )
        # equirectangular cameras skip undistortion (ref: cameras.py:652-661)
        skip = (cam_type == int(CameraType.EQUIRECTANGULAR))[None, :, None]
        coord_stack = jnp.where(skip, coord_stack, undistorted)

    cs0, cs1 = coord_stack[..., 0], coord_stack[..., 1]

    # perspective (ref: cameras.py:669-674)
    persp = jnp.stack([cs0, cs1, -jnp.ones_like(cs0)], axis=-1)

    # fisheye (ref: cameras.py:676-687)
    theta = jnp.sqrt(cs0**2 + cs1**2)
    theta = jnp.clip(theta, 0.0, jnp.pi)
    sin_over_theta = jnp.sin(theta) / jnp.maximum(theta, 1e-9)
    fisheye = jnp.stack(
        [cs0 * sin_over_theta, cs1 * sin_over_theta, -jnp.cos(theta)], axis=-1
    )

    # equirectangular (ref: cameras.py:689-700)
    eq_theta = -jnp.pi * cs0
    eq_phi = jnp.pi * (0.5 - cs1)
    equirect = jnp.stack(
        [
            -jnp.sin(eq_theta) * jnp.sin(eq_phi),
            jnp.cos(eq_phi),
            -jnp.cos(eq_theta) * jnp.sin(eq_phi),
        ],
        axis=-1,
    )

    ct = cam_type[None, :, None]
    directions_stack = jnp.where(
        ct == int(CameraType.FISHEYE),
        fisheye,
        jnp.where(ct == int(CameraType.EQUIRECTANGULAR), equirect, persp),
    )  # [3, R, 3] camera-frame directions

    c2w = cameras.camera_to_worlds[idx]  # [R, 3, 4]
    if camera_opt_to_camera is not None:
        R1, t1 = c2w[..., :3], c2w[..., 3:]
        R2, t2 = camera_opt_to_camera[..., :3], camera_opt_to_camera[..., 3:]
        c2w = jnp.concatenate([R1 @ R2, R1 @ t2 + t1], axis=-1)
    rotation = c2w[..., :3, :3]

    # rotate camera-frame dirs to world: sum over the last axis of R
    directions_stack = jnp.einsum("srj,rij->sri", directions_stack, rotation)
    norms = jnp.maximum(
        jnp.linalg.norm(directions_stack, axis=-1, keepdims=True), 1e-10
    )
    directions_stack = directions_stack / norms

    origins = c2w[..., :3, 3]
    directions = directions_stack[0]
    dx = jnp.sqrt(jnp.sum((directions - directions_stack[1]) ** 2, axis=-1))
    dy = jnp.sqrt(jnp.sum((directions - directions_stack[2]) ** 2, axis=-1))
    pixel_area = dx * dy

    times = cameras.times[idx] if cameras.times is not None else None

    return RayBundle(
        origins=origins,
        directions=directions,
        pixel_area=pixel_area,
        camera_indices=idx,
        times=times,
        directions_norm=jax.lax.stop_gradient(norms[0, :, 0]),
    )


def generate_image_rays(
    cameras: Cameras, camera_index: int, camera_opt_to_camera=None
) -> RayBundle:
    """All rays of one camera's image, flattened row-major
    (ref: Cameras.generate_rays with coords=None)."""
    h = int(np.asarray(cameras.height)[camera_index])
    w = int(np.asarray(cameras.width)[camera_index])
    coords = get_image_coords(h, w).reshape(-1, 2)
    idx = jnp.full((coords.shape[0],), camera_index, jnp.int32)
    return generate_rays(cameras, idx, coords, camera_opt_to_camera)
