"""Bilinear plane sampling — the K-Planes interpolation primitive.

TPU-native replacement for the reference's ``F.grid_sample`` wrapper
(ref: utils/interpolation.py:5-33; cuDNN kernel N5 in SURVEY §2.1).

Semantics match grid_sample(align_corners=True, padding_mode="border",
mode="bilinear") for 2D planes.  Planes are stored [H, W, F] — features
last so corner fetches are contiguous along the TPU lane dimension — where
the reference stores [1, F, H, W].  Coordinates are (x, y) in [-1, 1] with
x indexing W and y indexing H, exactly like grid_sample's grid argument.

This pure-XLA gather version is the semantic reference that any fused
Pallas variant is validated against (see ops/pallas/).
"""
from __future__ import annotations

import jax.numpy as jnp


def sample_plane_bilinear(plane: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinearly sample a feature plane at normalized coordinates.

    Args:
        plane: [H, W, F] feature plane.
        coords: [..., 2] (x, y) in [-1, 1]; align_corners=True mapping,
            out-of-range coords clamp to the border.
    Returns:
        [..., F] interpolated features.
    """
    H, W, F = plane.shape
    x = (coords[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (coords[..., 1] + 1.0) * 0.5 * (H - 1)
    # border padding: clamp the continuous coordinate first so weights are
    # consistent with clamped indices
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, W - 1)
    y1i = jnp.minimum(y0i + 1, H - 1)

    flat = plane.reshape(H * W, F)
    idx00 = y0i * W + x0i
    idx01 = y0i * W + x1i
    idx10 = y1i * W + x0i
    idx11 = y1i * W + x1i

    p00 = jnp.take(flat, idx00, axis=0)
    p01 = jnp.take(flat, idx01, axis=0)
    p10 = jnp.take(flat, idx10, axis=0)
    p11 = jnp.take(flat, idx11, axis=0)

    tx = tx[..., None]
    ty = ty[..., None]
    top = p00 * (1.0 - tx) + p01 * tx
    bot = p10 * (1.0 - tx) + p11 * tx
    return top * (1.0 - ty) + bot * ty


def quad_pack(plane: jnp.ndarray) -> jnp.ndarray:
    """[H, W, F] -> [H*W, 4F] with each row holding the 2x2 corner block
    (P[h,w], P[h,w+1], P[h+1,w], P[h+1,w+1]); edge rows replicate the
    border (border padding).

    TPU gathers pay per row, not per byte, so fetching all four bilinear
    corners in ONE full-lane row quarters the dominant cost of plane
    sampling (see SURVEY §7.7a).  The pack itself is pure slicing —
    cheap, fused, and differentiable without scatters.
    """
    H, W, F = plane.shape
    right = jnp.concatenate([plane[:, 1:], plane[:, -1:]], axis=1)
    down = jnp.concatenate([plane[1:], plane[-1:]], axis=0)
    down_right = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
    packed = jnp.concatenate([plane, right, down, down_right], axis=-1)
    return packed.reshape(H * W, 4 * F)


def sample_plane_bilinear_packed(
    plane: jnp.ndarray, coords: jnp.ndarray, gather_dtype=jnp.bfloat16
) -> jnp.ndarray:
    """Bilinear plane sample via one quad-packed gather per point.

    Same clamping and align_corners=True mapping as
    ``sample_plane_bilinear``; 4x fewer gather rows.  The packed table is
    gathered in ``gather_dtype`` (bf16 by default: ~9% step-time win and
    the reference's tcnn path stored fp16 features anyway); interpolation
    weights and outputs stay fp32.
    """
    H, W, F = plane.shape
    x = (coords[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (coords[..., 1] + 1.0) * 0.5 * (H - 1)
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0)[..., None]
    ty = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    packed = quad_pack(plane)
    if gather_dtype is not None:
        packed = packed.astype(gather_dtype)
    rows = jnp.take(packed, y0i * W + x0i, axis=0).astype(jnp.float32)  # [..., 4F]
    p00, p01, p10, p11 = (
        rows[..., :F],
        rows[..., F : 2 * F],
        rows[..., 2 * F : 3 * F],
        rows[..., 3 * F :],
    )
    top = p00 * (1.0 - tx) + p01 * tx
    bot = p10 * (1.0 - tx) + p11 * tx
    return top * (1.0 - ty) + bot * ty
