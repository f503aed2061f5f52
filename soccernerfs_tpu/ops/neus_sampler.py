"""NeuS hierarchical SDF sampler (ref: ray_samplers.py:603-763 NeuSSampler).

Fixed-iteration upsampling: start uniform, repeatedly (a) convert SDF to
alphas with a doubling fixed inv_s, (b) PDF-sample new points, (c) merge
sorted.  Shapes stay static — each iteration's sample count is known at
trace time.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from soccernerfs_tpu.core.rays import (
    RayBundle,
    RaySamples,
    get_weights_and_transmittance_from_alphas,
)
from soccernerfs_tpu.ops.samplers import pdf_samples, spaced_samples


def rendering_sdf_with_fixed_inv_s(
    ray_samples: RaySamples, sdf: jnp.ndarray, inv_s: float
) -> jnp.ndarray:
    """Alpha from SDF with fixed variance (ref: ray_samplers.py:684-731):
    sdf [N, S] sampled at bin starts; alphas [N, S-1]."""
    prev_sdf, next_sdf = sdf[:, :-1], sdf[:, 1:]
    deltas = ray_samples.deltas[:, :-1]
    mid_sdf = (prev_sdf + next_sdf) * 0.5
    cos_val = (next_sdf - prev_sdf) / (deltas + 1e-5)
    prev_cos = jnp.concatenate([jnp.zeros_like(cos_val[:, :1]), cos_val[:, :-1]], axis=-1)
    cos_val = jnp.minimum(cos_val, prev_cos)
    cos_val = jnp.clip(cos_val, -1e3, 0.0)

    prev_esti = mid_sdf - cos_val * deltas * 0.5
    next_esti = mid_sdf + cos_val * deltas * 0.5
    prev_cdf = jax.nn.sigmoid(prev_esti * inv_s)
    next_cdf = jax.nn.sigmoid(next_esti * inv_s)
    return (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)


def _merge_ray_samples(
    ray_bundle: RayBundle, s1: RaySamples, s2: RaySamples
) -> RaySamples:
    """Sorted union of two sample sets (ref: ray_samplers.py:733-763)."""
    starts = jnp.concatenate([s1.spacing_starts, s2.spacing_starts], axis=-1)
    bins = jnp.sort(starts, axis=-1)
    ends = jnp.maximum(s1.spacing_ends[:, -1:], s2.spacing_ends[:, -1:])
    bins = jnp.concatenate([bins, ends], axis=-1)
    bins = jax.lax.stop_gradient(bins)
    merged = ray_bundle.get_ray_samples(
        bin_starts=jnp.zeros_like(bins[..., :-1]),
        bin_ends=jnp.zeros_like(bins[..., 1:]),
        spacing_starts=bins[..., :-1],
        spacing_ends=bins[..., 1:],
        spacing=s1.spacing,
        s_near=s1.s_near,
        s_far=s1.s_far,
    )
    euclid = merged.spacing_to_euclidean(bins)
    return merged.replace(starts=euclid[..., :-1], ends=euclid[..., 1:])


def neus_sample(
    ray_bundle: RayBundle,
    sdf_fn: Callable[[jnp.ndarray], jnp.ndarray],
    num_samples: int = 64,
    num_samples_importance: int = 64,
    num_upsample_steps: int = 4,
    base_variance: float = 64.0,
    rng=None,
    stratified: bool = False,
    single_jitter: bool = True,
) -> RaySamples:
    """(ref: ray_samplers.py:632-682 generate_ray_samples).

    Args:
        sdf_fn: positions [M, 3] -> sdf [M].
    """
    rngs = jax.random.split(rng, num_upsample_steps + 1) if rng is not None else [None] * (
        num_upsample_steps + 1
    )
    ray_samples = spaced_samples(
        ray_bundle, num_samples, "uniform", rngs[0], stratified, single_jitter
    )
    per_step = num_samples_importance // num_upsample_steps

    for it in range(num_upsample_steps):
        pos = ray_samples.get_positions()
        n, s = pos.shape[:2]
        sdf = sdf_fn(pos.reshape(-1, 3)).reshape(n, s)
        alphas = rendering_sdf_with_fixed_inv_s(
            ray_samples, sdf, base_variance * 2**it
        )
        weights = get_weights_and_transmittance_from_alphas(alphas, weights_only=True)
        weights = jnp.concatenate([weights, jnp.zeros_like(weights[:, :1])], axis=1)
        new_samples = pdf_samples(
            ray_bundle,
            ray_samples,
            weights,
            per_step,
            rng=rngs[it + 1],
            stratified=stratified,
            single_jitter=single_jitter,
            include_original=False,
            histogram_padding=1e-5,
        )
        ray_samples = _merge_ray_samples(ray_bundle, ray_samples, new_samples)
    return ray_samples
