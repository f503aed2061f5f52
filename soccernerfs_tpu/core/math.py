"""Math primitives shared across the framework.

TPU-native counterparts of the reference's ``utils/math.py`` and
``field_components/activations.py`` (trunc_exp), re-expressed as pure jnp
functions.  Reference behaviors mirrored (file:line cited per function).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_jvp
def trunc_exp(x: jnp.ndarray) -> jnp.ndarray:
    """exp with a clamped-input backward pass.

    Forward is exact exp; the JVP evaluates exp(clip(x, -15, 15)) so gradients
    neither vanish nor explode (ref: field_components/activations.py:26-40).
    """
    return jnp.exp(x)


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    return jnp.exp(x), dx * jnp.exp(jnp.clip(x, -15.0, 15.0))


def intersect_aabb(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    aabb: jnp.ndarray,
    near_plane: float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Ray/AABB slab intersection returning per-ray (nears, fars).

    Mirrors AABBBoxCollider._intersect_with_aabb
    (ref: model_components/scene_colliders.py:47-96): epsilon-stabilised
    direction reciprocal, nears clamped to ``near_plane`` and
    ``fars >= nears + 1e-6``.

    Args:
        origins: [..., 3] ray origins.
        directions: [..., 3] ray directions.
        aabb: [2, 3] min/max corners.
    Returns:
        (nears, fars) each shaped [...].
    """
    inv_d = 1.0 / (directions + 1e-6)
    t0 = (aabb[0] - origins) * inv_d  # [..., 3]
    t1 = (aabb[1] - origins) * inv_d
    nears = jnp.max(jnp.minimum(t0, t1), axis=-1)
    fars = jnp.min(jnp.maximum(t0, t1), axis=-1)
    nears = jnp.maximum(nears, near_plane)
    fars = jnp.maximum(fars, nears + 1e-6)
    return nears, fars


def scene_contraction(x: jnp.ndarray, order: float | None = jnp.inf) -> jnp.ndarray:
    """MipNeRF-360 scene contraction onto a radius-2 ball/cube.

    f(x) = x where ||x|| <= 1 else (2 - 1/||x||) * x/||x||
    (ref: field_components/spatial_distortions.py:42-70).  ``order=inf``
    contracts to a cube (recommended for grid encodings); ``order=None``
    uses the L2 norm.
    """
    if order is None:
        mag = jnp.linalg.norm(x, axis=-1, keepdims=True)
    elif order == jnp.inf:
        mag = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    else:
        mag = jnp.linalg.norm(x, ord=order, axis=-1, keepdims=True)
    mag = jnp.maximum(mag, 1e-12)
    return jnp.where(mag < 1.0, x, (2.0 - 1.0 / mag) * (x / mag))


def components_from_spherical_harmonics(levels: int, directions: jnp.ndarray) -> jnp.ndarray:
    """Real spherical-harmonics basis values for unit directions.

    Matches utils/math.py:27-100 of the reference (levels up to 4 supported).

    Args:
        levels: number of SH bands (1..4); output has ``levels**2`` components.
        directions: [..., 3] unit direction vectors.
    Returns:
        [..., levels**2] basis values.
    """
    if not 1 <= levels <= 4:
        raise ValueError(f"SH levels must be in [1, 4], got {levels}")
    x, y, z = directions[..., 0], directions[..., 1], directions[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    comps = [jnp.full_like(x, 0.28209479177387814)]
    if levels > 1:
        comps += [
            0.4886025119029199 * y,
            0.4886025119029199 * z,
            0.4886025119029199 * x,
        ]
    if levels > 2:
        comps += [
            1.0925484305920792 * x * y,
            1.0925484305920792 * y * z,
            0.9461746957575601 * zz - 0.31539156525252005,
            1.0925484305920792 * x * z,
            0.5462742152960396 * (xx - yy),
        ]
    if levels > 3:
        comps += [
            0.5900435899266435 * y * (3.0 * xx - yy),
            2.890611442640554 * x * y * z,
            0.4570457994644658 * y * (5.0 * zz - 1.0),
            0.3731763325901154 * z * (5.0 * zz - 3.0),
            0.4570457994644658 * x * (5.0 * zz - 1.0),
            1.445305721320277 * z * (xx - yy),
            0.5900435899266435 * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(comps, axis=-1)


def normalized_depth_scale_and_shift(
    prediction: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Least-squares scale/shift aligning a predicted depth map to a target.

    Solves ``argmin_{s,t} sum(mask * (s*pred + t - target)^2)`` per image
    (ref: utils/math.py:316-360, from the MiDaS paper).

    Args:
        prediction/target/mask: [B, H, W].
    Returns:
        (scale [B], shift [B]); zero where the system is singular.
    """
    a_00 = jnp.sum(mask * prediction * prediction, axis=(1, 2))
    a_01 = jnp.sum(mask * prediction, axis=(1, 2))
    a_11 = jnp.sum(mask, axis=(1, 2))
    b_0 = jnp.sum(mask * prediction * target, axis=(1, 2))
    b_1 = jnp.sum(mask * target, axis=(1, 2))
    det = a_00 * a_11 - a_01 * a_01
    valid = det > 0
    safe_det = jnp.where(valid, det, 1.0)
    scale = jnp.where(valid, (a_11 * b_0 - a_01 * b_1) / safe_det, 0.0)
    shift = jnp.where(valid, (-a_01 * b_0 + a_00 * b_1) / safe_det, 0.0)
    return scale, shift


def masked_reduction(image_loss: jnp.ndarray, m: jnp.ndarray, reduction_type: str) -> jnp.ndarray:
    """Reduce a per-image loss with a valid-pixel count ``m``.

    (ref: utils/math.py:291-314.)  ``image``: divide each image by its count
    then sum; ``batch``: sum of losses / sum of counts (2M in the caller).
    """
    if reduction_type == "batch":
        divisor = jnp.sum(m)
        return jnp.where(divisor == 0, 0.0, jnp.sum(image_loss) / jnp.maximum(divisor, 1e-12))
    if reduction_type == "image":
        valid = m > 0
        image_loss = jnp.where(valid, image_loss / jnp.maximum(2 * m, 1e-12), 0.0)
        return jnp.mean(image_loss)
    raise ValueError(f"unknown reduction_type {reduction_type}")


def safe_normalize(vectors: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Normalize vectors with an epsilon guard (ref: utils/math.py)."""
    return vectors / (jnp.linalg.norm(vectors, axis=-1, keepdims=True) + eps)
