"""Bilinear plane sampling — the K-Planes interpolation primitive.

TPU-native replacement for the reference's ``F.grid_sample`` wrapper
(ref: utils/interpolation.py:5-33; cuDNN kernel N5 in SURVEY §2.1).

Semantics match grid_sample(align_corners=True, padding_mode="border",
mode="bilinear") for 2D planes.  Planes are stored [H, W, F] — features
last so corner fetches are contiguous along the TPU lane dimension — where
the reference stores [1, F, H, W].  Coordinates are (x, y) in [-1, 1] with
x indexing W and y indexing H, exactly like grid_sample's grid argument.

A fused multiscale Pallas kernel lives in ops/pallas/plane_sample.py; this
pure-XLA gather version is the reference implementation it is validated
against.
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
