"""Lie-group exponential maps for pose optimization.

TPU-native re-design of ``cameras/lie_groups.py``: branchless jnp (the
reference's in-place skew assembly becomes stacked tensors), used by the
camera optimizer (ref: cameras/camera_optimizers.py:41-112).
"""
from __future__ import annotations

import jax.numpy as jnp


def _skew(v: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] skew-symmetric cross-product matrices."""
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def exp_map_SO3xR3(tangent_vector: jnp.ndarray) -> jnp.ndarray:
    """exp of the direct product SO(3) x R^3 (ref: lie_groups.py:23-59).

    Args:
        tangent_vector: [B, 6] — translation (3) then so(3) tangent (3).
    Returns:
        [B, 3, 4] [R|t] matrices; translation is copied verbatim.
    """
    log_rot = tangent_vector[:, 3:]
    nrms = jnp.sum(log_rot * log_rot, axis=1)
    rot_angles = jnp.sqrt(jnp.maximum(nrms, 1e-4))
    inv = 1.0 / rot_angles
    fac1 = inv * jnp.sin(rot_angles)
    fac2 = inv * inv * (1.0 - jnp.cos(rot_angles))
    skews = _skew(log_rot)
    skews_square = jnp.matmul(skews, skews)
    rot = (
        fac1[:, None, None] * skews
        + fac2[:, None, None] * skews_square
        + jnp.eye(3)[None]
    )
    return jnp.concatenate([rot, tangent_vector[:, :3, None]], axis=-1)


def exp_map_SE3(tangent_vector: jnp.ndarray) -> jnp.ndarray:
    """exp se(3) -> SE(3) with small-angle Taylor guards
    (ref: lie_groups.py:61-112).

    Args:
        tangent_vector: [B, 6] — translation part (3) then rotation (3).
    Returns:
        [B, 3, 4] [R|t].
    """
    lin = tangent_vector[:, :3]
    ang = tangent_vector[:, 3:]

    theta2 = jnp.sum(ang * ang, axis=1, keepdims=True)
    theta = jnp.sqrt(theta2)
    near_zero = theta < 1e-2
    theta_nz = jnp.where(near_zero, 1.0, theta)
    theta2_nz = jnp.where(near_zero, 1.0, theta2)
    theta3_nz = jnp.where(near_zero, 1.0, theta2 * theta)

    sine = jnp.sin(theta)
    cosine = jnp.where(near_zero, 8.0 / (4.0 + theta2) - 1.0, jnp.cos(theta))
    sine_by_theta = jnp.where(near_zero, 0.5 * cosine + 0.5, sine / theta_nz)
    one_minus_cos_by_t2 = jnp.where(
        near_zero, 0.5 * sine_by_theta, (1.0 - cosine) / theta2_nz
    )

    outer = ang[:, :, None] * ang[:, None, :]
    rot = (
        one_minus_cos_by_t2[:, :, None] * outer
        + cosine[:, :, None] * jnp.eye(3)[None]
        + sine_by_theta[:, :, None] * _skew(ang)
    )

    # V matrix for the translation
    sine_by_theta_t = jnp.where(near_zero, 1.0 - theta2 / 6.0, sine_by_theta)
    one_minus_cos_by_t2_t = jnp.where(
        near_zero, 0.5 - theta2 / 24.0, one_minus_cos_by_t2
    )
    theta_minus_sine_by_t3 = jnp.where(
        near_zero, 1.0 / 6.0 - theta2 / 120.0, (theta - sine) / theta3_nz
    )
    V = (
        sine_by_theta_t[:, :, None] * jnp.eye(3)[None]
        + one_minus_cos_by_t2_t[:, :, None] * _skew(ang)
        + theta_minus_sine_by_t3[:, :, None] * outer
    )
    trans = jnp.matmul(V, lin[:, :, None])
    return jnp.concatenate([rot, trans], axis=-1)
