"""Occupancy grid + fixed-shape volumetric sampling — the nerfacc
replacement (N4 in SURVEY §2.1).

The reference uses nerfacc's CUDA ray marching producing ragged "packed"
samples (ref: ray_samplers.py:372-507 VolumetricSampler;
models/instant_ngp.py:117-162 OccupancyGrid + update callback).  Ragged
shapes don't exist under XLA, so the TPU design is two-phase with static
shapes:

  1. probe: T equally-spaced probes per ray through [near, far] are
     tested against the occupancy bitfield (one cheap gather each);
  2. select: the first S occupied probes per ray become the samples
     (prefix-sum selection — no sort, no nonzero), padded + masked when a
     ray has fewer than S occupied probes.

Compositing then runs on dense [N, S] tensors with a validity mask —
functionally equivalent to nerfacc's alpha-thresholded packed samples
with ``render_step_size`` = ray extent / T.

The grid itself matches nerfacc semantics: EMA density decay 0.95 every
update, binarized at min(mean(occ), threshold), updated every
``update_every`` steps from jittered cell-center density queries
(ref: nerfacc OccupancyGrid.every_n_step, models/instant_ngp.py:144-162).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from soccernerfs_tpu.core.rays import RayBundle, RaySamples
from soccernerfs_tpu.ops.searching import searchsorted


@dataclass(frozen=True)
class OccupancyGridConfig:
    resolution: int = 128
    ema_decay: float = 0.95
    occ_threshold: float = 0.01
    update_every: int = 16
    warmup_steps: int = 256


def init_occupancy_grid(cfg: OccupancyGridConfig) -> jnp.ndarray:
    """Dense [R^3] running density estimate, zero-initialized."""
    r = cfg.resolution
    return jnp.zeros((r * r * r,), jnp.float32)


def occupancy_binary(cfg: OccupancyGridConfig, occs: jnp.ndarray) -> jnp.ndarray:
    """nerfacc binarization: occ > min(mean(occ), threshold)."""
    thresh = jnp.minimum(jnp.mean(occs), cfg.occ_threshold)
    return occs > thresh


def update_occupancy_grid(
    cfg: OccupancyGridConfig,
    occs: jnp.ndarray,
    aabb: jnp.ndarray,
    density_fn: Callable[[jnp.ndarray], jnp.ndarray],
    rng: jax.Array,
    render_step_size: float,
    step: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """One EMA update from jittered cell-center density queries.

    density contribution follows nerfacc: occ_new = density * step_size
    is compared pre-threshold; we store max(occ * decay, density) like
    nerfacc's _update (density itself, thresholded later against
    alpha-derived cutoff).

    Cell selection follows nerfacc's warmup split (ref: nerfacc
    OccupancyGrid.every_n_step / _sample_uniform_and_occupied_cells):
    while ``step < warmup_steps`` EVERY cell is probed; afterwards only
    ``n_cells // 4`` are — half drawn uniformly, half from currently
    occupied cells.  The occupied draw is a static-shape CDF sample
    (with replacement) in place of nerfacc's variable-length
    nonzero+randperm, which has no static-shape equivalent; unprobed
    cells keep their EMA untouched, duplicates resolve by max — both
    exactly nerfacc's ``occs[idx] = max(occs[idx]*decay, new)``
    semantics.  The density probe is the dominant cost of the update
    (n_cells field evaluations — seconds at NGP scale), so the 4x
    post-warmup cut is the difference between the probe dominating and
    disappearing into the step mix.  ``step=None`` keeps the
    all-cells behavior (used by tests / non-step callers).
    """
    r = cfg.resolution
    n_cells = r * r * r
    k_jit, k_uni, k_occ = jax.random.split(rng, 3)

    def _probe(cells: jnp.ndarray) -> jnp.ndarray:
        ijk = jnp.stack(
            [cells // (r * r), (cells // r) % r, cells % r], axis=-1
        )
        jitter = jax.random.uniform(k_jit, (cells.shape[0], 3))
        pos01 = (ijk + jitter) / r
        positions = aabb[0] + pos01 * (aabb[1] - aabb[0])
        return density_fn(positions) * render_step_size

    def full_update(occs: jnp.ndarray) -> jnp.ndarray:
        density = _probe(jnp.arange(n_cells))
        return jnp.maximum(occs * cfg.ema_decay, density)

    if step is None:
        return full_update(occs)

    m = max(n_cells // 4, 1)
    m_uni = m // 2
    m_occ = m - m_uni

    def sampled_update(occs: jnp.ndarray) -> jnp.ndarray:
        uni = jax.random.randint(k_uni, (m_uni,), 0, n_cells)
        # occupied-cell draw: uniform over the binarized grid via its
        # CDF (all-empty grids degrade to uniform through the epsilon)
        w = occupancy_binary(cfg, occs).astype(jnp.float32) + 1e-12
        cdf = jnp.cumsum(w)
        draws = jax.random.uniform(k_occ, (m_occ,)) * cdf[-1]
        occ_cells = jnp.clip(
            jnp.searchsorted(cdf, draws), 0, n_cells - 1
        ).astype(uni.dtype)
        cells = jnp.concatenate([uni, occ_cells])
        density = _probe(cells)
        # duplicate-safe scatter: probed mask + per-cell max of the new
        # contributions, then one elementwise select
        probed = jnp.zeros((n_cells,), bool).at[cells].set(True)
        dmax = jnp.zeros((n_cells,), occs.dtype).at[cells].max(density)
        return jnp.where(
            probed, jnp.maximum(occs * cfg.ema_decay, dmax), occs
        )

    return jax.lax.cond(
        step < cfg.warmup_steps, full_update, sampled_update, occs
    )


def occupancy_lookup(
    cfg: OccupancyGridConfig,
    binary: jnp.ndarray,
    aabb: jnp.ndarray,
    positions: jnp.ndarray,
) -> jnp.ndarray:
    """Boolean occupancy at world positions [..., 3]."""
    r = cfg.resolution
    pos01 = (positions - aabb[0]) / (aabb[1] - aabb[0])
    inside = jnp.all((pos01 >= 0.0) & (pos01 < 1.0), axis=-1)
    ijk = jnp.clip((pos01 * r).astype(jnp.int32), 0, r - 1)
    idx = (ijk[..., 0] * r + ijk[..., 1]) * r + ijk[..., 2]
    return jnp.take(binary, idx) & inside


def volumetric_sample(
    cfg: OccupancyGridConfig,
    binary: jnp.ndarray,
    ray_bundle: RayBundle,
    aabb: jnp.ndarray,
    num_probes: int,
    max_samples_per_ray: int,
    rng: Optional[jax.Array] = None,
    stratified: bool = False,
) -> Tuple[RaySamples, jnp.ndarray]:
    """Occupancy-guided sampling with static shapes.

    Args:
        num_probes: T probes per ray (sets the effective step size).
        max_samples_per_ray: S kept samples per ray.
    Returns:
        (RaySamples [N, S], valid mask [N, S]).
    """
    assert ray_bundle.nears is not None and ray_bundle.fars is not None
    n = ray_bundle.num_rays
    T, S = num_probes, max_samples_per_ray

    edges = jnp.linspace(0.0, 1.0, T + 1)[None, :]  # [1, T+1]
    if stratified and rng is not None:
        jitter = jax.random.uniform(rng, (n, 1)) / T
        edges = edges + jitter
    nears = ray_bundle.nears[:, None]
    fars = ray_bundle.fars[:, None]
    t_edges = nears + edges * (fars - nears)  # [N, T+1]
    t_mid = (t_edges[:, :-1] + t_edges[:, 1:]) / 2.0  # [N, T]

    probe_pos = (
        ray_bundle.origins[:, None, :]
        + ray_bundle.directions[:, None, :] * t_mid[..., None]
    )
    occupied = occupancy_lookup(cfg, binary, aabb, probe_pos)  # [N, T]

    # select first S occupied probes: rank = 1-based prefix count
    rank = jnp.cumsum(occupied.astype(jnp.int32), axis=-1)
    # position of the s-th occupied probe = #\{rank < s\}
    targets = jnp.arange(1, S + 1)[None, :]  # [1, S]
    sel = searchsorted(rank, jnp.broadcast_to(targets, (n, S)), side="left")
    sel = jnp.clip(sel, 0, T - 1)  # [N, S]
    valid = targets <= rank[:, -1:]  # s-th occupied exists

    starts = jnp.take_along_axis(t_edges[:, :-1], sel, axis=-1)
    ends = jnp.take_along_axis(t_edges[:, 1:], sel, axis=-1)
    spacing_starts = jnp.take_along_axis(
        jnp.broadcast_to(edges[..., :-1], (n, T)), sel, axis=-1
    )
    spacing_ends = jnp.take_along_axis(
        jnp.broadcast_to(edges[..., 1:], (n, T)), sel, axis=-1
    )

    samples = RaySamples(
        origins=ray_bundle.origins,
        directions=ray_bundle.directions,
        pixel_area=ray_bundle.pixel_area,
        starts=starts,
        ends=ends,
        spacing_starts=spacing_starts,
        spacing_ends=spacing_ends,
        spacing="uniform",
        s_near=ray_bundle.nears,
        s_far=ray_bundle.fars,
        camera_indices=ray_bundle.camera_indices,
        times=ray_bundle.times,
    )
    return samples, valid
