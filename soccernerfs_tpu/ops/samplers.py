"""Ray samplers as pure functions.

TPU-native re-design of ``model_components/ray_samplers.py``: every sampler
is a pure function of (rng, rays, ...) returning fixed-shape RaySamples —
ideal for XLA.  The stateful torch modules (train flags, anneal state,
step-schedule counters) become explicit arguments threaded by the jitted
train step.

Sampler inventory vs reference:
  spaced_samples(spacing=...)      <- Spaced/Uniform/LinearDisparity/Sqrt/Log/
                                      UniformLinDispPiecewise (ray_samplers.py:54-246)
  pdf_samples                      <- PDFSampler (ray_samplers.py:249-369)
  proposal_sample                  <- ProposalNetworkSampler (ray_samplers.py:510-600)
  volumetric samplers live in ops/occupancy.py (nerfacc replacement).
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from soccernerfs_tpu.core.rays import RayBundle, RaySamples, spacing_fn
from soccernerfs_tpu.ops.searching import searchsorted


def spaced_samples(
    ray_bundle: RayBundle,
    num_samples: int,
    spacing: str = "uniform",
    rng: Optional[jax.Array] = None,
    stratified: bool = False,
    single_jitter: bool = False,
) -> RaySamples:
    """Sample bins between nears/fars under a spacing warp.

    Mirrors SpacedSampler.generate_ray_samples
    (ref: ray_samplers.py:79-126): linspace bins in s-space, optional
    stratified jitter between bin centers, then the inverse warp maps to
    euclidean distances.

    Args:
        ray_bundle: rays with ``nears``/``fars`` set.
        num_samples: S; produces S bins from S+1 edges.
        spacing: one of uniform|lindisp|sqrt|log|piecewise.
        rng: key for stratified jitter (required when ``stratified``).
        stratified: jitter bin edges (training only).
        single_jitter: one jitter value per ray instead of per edge.
    """
    assert ray_bundle.nears is not None and ray_bundle.fars is not None
    num_rays = ray_bundle.num_rays
    bins = jnp.linspace(0.0, 1.0, num_samples + 1)[None, :]  # [1, S+1]

    if stratified:
        assert rng is not None
        shape = (num_rays, 1) if single_jitter else (num_rays, num_samples + 1)
        t_rand = jax.random.uniform(rng, shape)
        bin_centers = (bins[..., 1:] + bins[..., :-1]) / 2.0
        bin_upper = jnp.concatenate([bin_centers, bins[..., -1:]], axis=-1)
        bin_lower = jnp.concatenate([bins[..., :1], bin_centers], axis=-1)
        bins = bin_lower + (bin_upper - bin_lower) * t_rand  # [N, S+1]
    else:
        bins = jnp.broadcast_to(bins, (num_rays, num_samples + 1))

    s_near = spacing_fn(spacing, ray_bundle.nears)  # [N]
    s_far = spacing_fn(spacing, ray_bundle.fars)

    samples = ray_bundle.get_ray_samples(
        bin_starts=jnp.zeros((num_rays, num_samples)),  # placeholder, set below
        bin_ends=jnp.zeros((num_rays, num_samples)),
        spacing_starts=bins[..., :-1],
        spacing_ends=bins[..., 1:],
        spacing=spacing,
        s_near=s_near,
        s_far=s_far,
    )
    euclidean_bins = samples.spacing_to_euclidean(bins)  # [N, S+1]
    return samples.replace(
        starts=euclidean_bins[..., :-1], ends=euclidean_bins[..., 1:]
    )


def pdf_samples(
    ray_bundle: RayBundle,
    ray_samples: RaySamples,
    weights: jnp.ndarray,
    num_samples: int,
    rng: Optional[jax.Array] = None,
    stratified: bool = False,
    single_jitter: bool = False,
    include_original: bool = True,
    histogram_padding: float = 0.01,
    eps: float = 1e-5,
) -> RaySamples:
    """Importance-resample bins from a weight histogram.

    Mirrors PDFSampler.generate_ray_samples (ref: ray_samplers.py:274-369):
    histogram padding, zero-sum guard, inverse-CDF sampling with stratified
    or midpoint u's, optional merge with the original bins, and gradient
    stop on the new bins.

    Args:
        weights: [N, S] histogram weights over ``ray_samples``'s bins.
    Returns:
        RaySamples with ``num_samples`` bins (+S if include_original).
    """
    num_bins = num_samples + 1
    weights = weights + histogram_padding

    weights_sum = jnp.sum(weights, axis=-1, keepdims=True)
    padding = jax.nn.relu(eps - weights_sum)
    weights = weights + padding / weights.shape[-1]
    weights_sum = weights_sum + padding

    pdf = weights / weights_sum
    cdf = jnp.minimum(jnp.ones_like(pdf), jnp.cumsum(pdf, axis=-1))
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [N, S+1]

    u = jnp.linspace(0.0, 1.0 - 1.0 / num_bins, num_bins)[None, :]
    if stratified:
        assert rng is not None
        shape = (cdf.shape[0], 1) if single_jitter else (cdf.shape[0], num_bins)
        u = u + jax.random.uniform(rng, shape) / num_bins
    else:
        u = u + 1.0 / (2 * num_bins)
        u = jnp.broadcast_to(u, (cdf.shape[0], num_bins))

    existing_bins = jnp.concatenate(
        [ray_samples.spacing_starts, ray_samples.spacing_ends[..., -1:]], axis=-1
    )  # [N, S_old+1]

    # Equivalent of searchsorted(cdf, u) + 4x take_along_axis, as fused
    # masked reductions over one comparison tensor.  take_along_axis
    # lowers to per-row gathers (~10 ns/row on TPU -> ~40 ms/step across
    # the PDF levels); cdf and the bins are SORTED along the last axis, so
    # "value at the last index with cdf<=u" is a masked max and "value at
    # the first index with cdf>u" is a masked min (with the boundary
    # behavior of the clipped indices reproduced by the fill values).
    big = jnp.float32(3.4e38)
    le = cdf[..., None, :] <= u[..., :, None]                 # [N, Q, K]
    cdf_g0 = jnp.max(jnp.where(le, cdf[..., None, :], 0.0), axis=-1)
    bins_g0 = jnp.max(jnp.where(le, existing_bins[..., None, :], 0.0), axis=-1)
    cdf_g1 = jnp.minimum(
        jnp.min(jnp.where(le, big, cdf[..., None, :]), axis=-1),
        cdf[..., -1:],
    )
    bins_g1 = jnp.minimum(
        jnp.min(jnp.where(le, big, existing_bins[..., None, :]), axis=-1),
        existing_bins[..., -1:],
    )

    t = jnp.clip(jnp.nan_to_num((u - cdf_g0) / (cdf_g1 - cdf_g0)), 0.0, 1.0)
    bins = bins_g0 + t * (bins_g1 - bins_g0)

    if include_original:
        bins = jnp.sort(jnp.concatenate([existing_bins, bins], axis=-1), axis=-1)

    bins = jax.lax.stop_gradient(bins)

    new_samples = ray_bundle.get_ray_samples(
        bin_starts=jnp.zeros_like(bins[..., :-1]),
        bin_ends=jnp.zeros_like(bins[..., 1:]),
        spacing_starts=bins[..., :-1],
        spacing_ends=bins[..., 1:],
        spacing=ray_samples.spacing,
        s_near=ray_samples.s_near,
        s_far=ray_samples.s_far,
    )
    euclidean_bins = new_samples.spacing_to_euclidean(bins)
    return new_samples.replace(
        starts=euclidean_bins[..., :-1], ends=euclidean_bins[..., 1:]
    )


def proposal_sample(
    ray_bundle: RayBundle,
    density_fns: Sequence[Callable[[RaySamples], jnp.ndarray]],
    num_proposal_samples_per_ray: Tuple[int, ...],
    num_nerf_samples_per_ray: int,
    rng: Optional[jax.Array] = None,
    stratified: bool = False,
    single_jitter: bool = False,
    initial_spacing: str = "piecewise",
    anneal: jnp.ndarray | float = 1.0,
    train_proposal_networks: jnp.ndarray | bool = True,
) -> Tuple[RaySamples, List[jnp.ndarray], List[RaySamples]]:
    """Hierarchical proposal-network sampling.

    Mirrors ProposalNetworkSampler.generate_ray_samples
    (ref: ray_samplers.py:559-600): level 0 draws from the initial spaced
    sampler, later levels PDF-resample annealed weights; each proposal level
    evaluates its density field and records (weights, samples).

    The reference's ``updated`` schedule (grad flow into proposal nets only
    every-n steps, ray_samplers.py:573,586-595) becomes the traced boolean
    ``train_proposal_networks``: when False the density is wrapped in
    stop_gradient, exactly matching torch.no_grad() semantics.

    Args:
        density_fns: one callable per proposal level; takes RaySamples,
            returns [N, S] density.
        anneal: exponent applied to weights before PDF resampling.
    Returns:
        (final RaySamples, weights_list, ray_samples_list) where the lists
        hold each proposal level (the caller appends the nerf level).
    """
    n = len(density_fns)
    weights_list: List[jnp.ndarray] = []
    ray_samples_list: List[RaySamples] = []

    rngs = (
        list(jax.random.split(rng, n + 1)) if rng is not None else [None] * (n + 1)
    )

    weights = None
    ray_samples: Optional[RaySamples] = None
    for i_level in range(n + 1):
        is_prop = i_level < n
        num_samples = (
            num_proposal_samples_per_ray[i_level] if is_prop else num_nerf_samples_per_ray
        )
        if i_level == 0:
            ray_samples = spaced_samples(
                ray_bundle,
                num_samples,
                spacing=initial_spacing,
                rng=rngs[i_level],
                stratified=stratified,
                single_jitter=single_jitter,
            )
        else:
            assert weights is not None and ray_samples is not None
            annealed_weights = jnp.power(weights, anneal)
            ray_samples = pdf_samples(
                ray_bundle,
                ray_samples,
                annealed_weights,
                num_samples,
                rng=rngs[i_level],
                stratified=stratified,
                single_jitter=single_jitter,
                include_original=False,
            )
        if is_prop:
            density = density_fns[i_level](ray_samples)
            density = _cond_stop_gradient(train_proposal_networks, density)
            weights = ray_samples.get_weights(density)
            weights_list.append(weights)
            ray_samples_list.append(ray_samples)

    assert ray_samples is not None
    return ray_samples, weights_list, ray_samples_list


def _cond_stop_gradient(flag, x):
    """x with gradient scaled by the (traced) boolean flag.

    jnp.where(flag, x, stop_gradient(x)) — forward value is x either way,
    backward is masked when flag is False.
    """
    if isinstance(flag, bool):
        return x if flag else jax.lax.stop_gradient(x)
    return jnp.where(flag, x, jax.lax.stop_gradient(x))
