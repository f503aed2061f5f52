"""Volume-rendering compositors as pure functions.

TPU-native re-design of ``model_components/renderers.py``: renderers are
stateless functions over [N, S] sample tensors.  Packed/ragged nerfacc
modes are replaced by fixed-shape masked variants (see ops/occupancy.py).
"""
from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from soccernerfs_tpu.core.rays import RaySamples
from soccernerfs_tpu.ops.searching import searchsorted_scalar

BACKGROUND_COLORS = {
    "white": (1.0, 1.0, 1.0),
    "black": (0.0, 0.0, 0.0),
}


def render_rgb(
    rgb: jnp.ndarray,
    weights: jnp.ndarray,
    background_color: Union[str, jnp.ndarray] = "random",
    rng: Optional[jax.Array] = None,
    train: bool = True,
) -> jnp.ndarray:
    """Composite per-sample RGB along rays with a background fill.

    Mirrors RGBRenderer.combine_rgb/forward
    (ref: model_components/renderers.py:58-141): comp = sum(w * rgb) +
    bg * (1 - acc); background may be "random" (needs rng), "last_sample",
    "white", "black", or an explicit [3] color.  Outside training, rgb is
    NaN-scrubbed and clamped to [0, 1].

    Args:
        rgb: [N, S, 3]; weights: [N, S].
    Returns:
        [N, 3] composited colors.
    """
    if not train:
        rgb = jnp.nan_to_num(rgb)
    comp_rgb = jnp.sum(weights[..., None] * rgb, axis=-2)
    acc = jnp.sum(weights, axis=-1, keepdims=True)

    if isinstance(background_color, str):
        if background_color == "last_sample":
            bg = rgb[..., -1, :]
        elif background_color == "random":
            # the reference draws from the global torch RNG even at eval
            # (renderers.py:104-105); outside training a fixed key keeps
            # whole-image renders deterministic
            assert rng is not None or not train, (
                "random background needs an rng key in training"
            )
            key = rng if rng is not None else jax.random.PRNGKey(0)
            bg = jax.random.uniform(key, comp_rgb.shape)
        else:
            bg = jnp.asarray(BACKGROUND_COLORS[background_color], dtype=comp_rgb.dtype)
    else:
        bg = jnp.asarray(background_color, dtype=comp_rgb.dtype)

    comp_rgb = comp_rgb + bg * (1.0 - acc)
    if not train:
        comp_rgb = jnp.clip(comp_rgb, 0.0, 1.0)
    return comp_rgb


def render_accumulation(weights: jnp.ndarray) -> jnp.ndarray:
    """Sum of weights per ray, [N] (ref: renderers.py:197-224)."""
    return jnp.sum(weights, axis=-1)


def render_depth(
    weights: jnp.ndarray, ray_samples: RaySamples, method: str = "median"
) -> jnp.ndarray:
    """Depth along each ray, [N].

    Mirrors DepthRenderer (ref: renderers.py:226-288):
      median — distance where cumulative weight crosses 0.5;
      expected — weight-normalized mean distance, clipped to sample range.
    """
    steps = ray_samples.midpoints()  # [N, S]
    if method == "median":
        cumulative_weights = jnp.cumsum(weights, axis=-1)
        median_index = searchsorted_scalar(cumulative_weights, 0.5, side="left")
        median_index = jnp.clip(median_index, 0, steps.shape[-1] - 1)
        return jnp.take_along_axis(steps, median_index[..., None], axis=-1)[..., 0]
    if method == "expected":
        eps = 1e-10
        depth = jnp.sum(weights * steps, axis=-1) / (jnp.sum(weights, axis=-1) + eps)
        return jnp.clip(depth, jnp.min(steps), jnp.max(steps))
    raise NotImplementedError(f"depth method {method}")


def render_median_rgb(rgb: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """RGB at the sample where cumulative weight crosses 0.5.

    Mirrors MedianRGBRenderer.combine_rgb (ref: renderers.py:290-340).

    Args:
        rgb: [N, S, 3]; weights: [N, S].
    Returns:
        [N, 3].
    """
    cumulative_weights = jnp.cumsum(weights, axis=-1)
    median_index = searchsorted_scalar(cumulative_weights, 0.5, side="left")
    median_index = jnp.clip(median_index, 0, weights.shape[-1] - 1)
    return jnp.take_along_axis(rgb, median_index[:, None, None], axis=-2)[:, 0, :]


def render_uncertainty(betas: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Uncertainty compositing (ref: renderers.py:365-383). [N, S]->[N]."""
    return jnp.sum(weights * betas, axis=-1)


def render_semantics(semantics: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Semantic-logit compositing (ref: renderers.py:385-397)."""
    return jnp.sum(weights[..., None] * semantics, axis=-2)


def render_normals(
    normals: jnp.ndarray, weights: jnp.ndarray, normalize: bool = True
) -> jnp.ndarray:
    """Normals compositing (ref: renderers.py:399-420)."""
    n = jnp.sum(weights[..., None] * normals, axis=-2)
    if normalize:
        n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-10)
    return n


def render_decomposition(probs: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """NeRFPlayer static/deform/new probability compositing
    (ref: renderers.py:422-441). probs: [N, S, 3] -> [N, 3]."""
    return jnp.sum(weights[..., None] * probs, axis=-2)
