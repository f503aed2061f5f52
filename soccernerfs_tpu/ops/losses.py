"""Loss library as pure functions.

TPU-native re-design of ``model_components/losses.py``.  Plane tensors here
use the framework's [H, W, F] layout (features last, lane-friendly); the
reference keeps [1, F, H, W].  The TV/smoothness/transient formulas operate
on the same H/W axes so values match exactly.

Known reference defects intentionally NOT replicated: the debug prints in
``compute_plane_tv_old`` (ref: losses.py:346-347).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from soccernerfs_tpu.core.rays import RaySamples
from soccernerfs_tpu.ops.searching import searchsorted

EPS = 1.0e-7
URF_SIGMA_SCALE_FACTOR = 3.0


# ---------------------------------------------------------------------------
# Interlevel (proposal distillation) loss — ref: losses.py:46-121
# ---------------------------------------------------------------------------

def outer(t0_starts, t0_ends, t1_starts, t1_ends, y1):
    """Sum of histogram (t1, y1) mass inside each (t0) interval.

    Vectorised equivalent of the reference's searchsorted construction
    (ref: losses.py:46-75).  All inputs [..., S]; returns [..., S0].
    """
    cy1 = jnp.concatenate(
        [jnp.zeros_like(y1[..., :1]), jnp.cumsum(y1, axis=-1)], axis=-1
    )
    # cy1 is nondecreasing (y1 >= 0), so the searchsorted+take pairs become
    # masked max reductions (take_along_axis is ~10 ns/row on TPU).
    # cy1[:-1][clip(cnt(t1s<=t0s)-1, 0)]: clip-low lands on cy1[0] == 0,
    # which is exactly the empty-mask max.  cy1[1:][clip(cnt(t1e<=t0e),
    # hi=S-1)]: the empty mask must produce cy1[1], hence the maximum().
    lo_mask = t1_starts[..., None, :] <= t0_starts[..., :, None]  # [.., S0, S]
    cy1_lo = jnp.max(jnp.where(lo_mask, cy1[..., None, :-1], 0.0), axis=-1)
    hi_mask = t1_ends[..., None, :] <= t0_ends[..., :, None]
    cy1_hi = jnp.maximum(
        jnp.max(jnp.where(hi_mask, cy1[..., None, 1:], 0.0), axis=-1),
        cy1[..., 1:2],
    )
    return cy1_hi - cy1_lo


def lossfun_outer(t, w, t_env, w_env):
    """Proposal histogram bound violation (ref: losses.py:78-95)."""
    w_outer = outer(t[..., :-1], t[..., 1:], t_env[..., :-1], t_env[..., 1:], w_env)
    return jnp.clip(w - w_outer, min=0) ** 2 / (w + EPS)


def ray_samples_to_sdist(ray_samples: RaySamples) -> jnp.ndarray:
    """s-space bin edges, [N, S+1] (ref: losses.py:98-103)."""
    return jnp.concatenate(
        [ray_samples.spacing_starts, ray_samples.spacing_ends[..., -1:]], axis=-1
    )


def interlevel_loss(weights_list, ray_samples_list) -> jnp.ndarray:
    """MipNeRF-360 proposal loss; final level detached so only proposal
    networks are driven (ref: losses.py:106-121)."""
    c = jax.lax.stop_gradient(ray_samples_to_sdist(ray_samples_list[-1]))
    w = jax.lax.stop_gradient(weights_list[-1])
    loss_interlevel = 0.0
    for ray_samples, weights in zip(ray_samples_list[:-1], weights_list[:-1]):
        sdist = ray_samples_to_sdist(ray_samples)
        loss_interlevel += jnp.mean(lossfun_outer(c, w, sdist, weights))
    return loss_interlevel


# ---------------------------------------------------------------------------
# Distortion loss — ref: losses.py:125-144
# ---------------------------------------------------------------------------

def lossfun_distortion(t, w):
    """MipNeRF-360 distortion on one histogram (ref: losses.py:125-136)."""
    ut = (t[..., 1:] + t[..., :-1]) / 2.0
    dut = jnp.abs(ut[..., :, None] - ut[..., None, :])
    loss_inter = jnp.sum(w * jnp.sum(w[..., None, :] * dut, axis=-1), axis=-1)
    loss_intra = jnp.sum(w**2 * (t[..., 1:] - t[..., :-1]), axis=-1) / 3.0
    return loss_inter + loss_intra


def distortion_loss(weights_list, ray_samples_list) -> jnp.ndarray:
    """Distortion on the final (nerf) level (ref: losses.py:139-144)."""
    c = ray_samples_to_sdist(ray_samples_list[-1])
    w = weights_list[-1]
    return jnp.mean(lossfun_distortion(c, w))


# ---------------------------------------------------------------------------
# K-Planes plane regularizers — ref: losses.py:355-452
# Planes here are [H, W, F]; a "grids" entry is the per-scale list of planes
# ordered (XY, XZ, XT, YZ, YT, ZT) for 4D or (XY, XZ, YZ) for 3D.
# ---------------------------------------------------------------------------

def compute_plane_tv(t: jnp.ndarray, only_w: bool = False) -> jnp.ndarray:
    """Mean squared difference TV over plane rows/cols (ref: losses.py:356-366).

    Differences are taken in bf16 (halves the dominant whole-table reads;
    squares/means accumulate in f32) — the same precision the tables are
    sampled at on the render path.
    """
    t = t.astype(jnp.bfloat16)
    h_tv = jnp.mean(jnp.square((t[1:, :, :] - t[:-1, :, :]).astype(jnp.float32)))
    w_tv = jnp.mean(jnp.square((t[:, 1:, :] - t[:, :-1, :]).astype(jnp.float32)))
    return w_tv if only_w else h_tv + w_tv


def compute_plane_smoothness(t: jnp.ndarray) -> jnp.ndarray:
    """1D second-difference (Laplacian) over the H axis — for time planes H
    is time (ref: losses.py:369-380).  bf16 diffs, f32 accumulation."""
    t = t.astype(jnp.bfloat16)
    first = t[1:, :, :] - t[:-1, :, :]
    second = (first[1:, :, :] - first[:-1, :, :]).astype(jnp.float32)
    return jnp.mean(jnp.square(second))


def _spatial_and_time_ids(num_planes: int):
    if num_planes == 3:
        return [0, 1, 2], []
    return [0, 1, 3], [2, 4, 5]


def space_tv_loss(multi_res_grids: Sequence[Sequence[jnp.ndarray]]) -> jnp.ndarray:
    """2D TV on space planes; 1D (space-axis) TV on space-time planes
    (ref: losses.py:383-406).  Time planes are [T, space, F] so the space
    axis is W -> only_w=True."""
    total = 0.0
    for grids in multi_res_grids:
        spatial_ids, _ = _spatial_and_time_ids(len(grids))
        for grid_id, grid in enumerate(grids):
            total += compute_plane_tv(grid, only_w=grid_id not in spatial_ids)
    return total


def time_smoothness_loss(multi_res_grids: Sequence[Sequence[jnp.ndarray]]) -> jnp.ndarray:
    """Second-derivative penalty on the time axis of space-time planes
    (ref: losses.py:409-428)."""
    total = 0.0
    for grids in multi_res_grids:
        _, time_ids = _spatial_and_time_ids(len(grids))
        for grid_id in time_ids:
            total += compute_plane_smoothness(grids[grid_id])
    return jnp.asarray(total)


def sparse_transients_loss(multi_res_grids: Sequence[Sequence[jnp.ndarray]]) -> jnp.ndarray:
    """L1 pull of space-time planes toward 1 (the multiplicative identity)
    (ref: losses.py:431-452)."""
    total = 0.0
    for grids in multi_res_grids:
        _, time_ids = _spatial_and_time_ids(len(grids))
        for grid_id in time_ids:
            total += jnp.mean(jnp.abs(1.0 - grids[grid_id]))
    return jnp.asarray(total)


# ---------------------------------------------------------------------------
# Depth losses — ref: losses.py:213-313
# ---------------------------------------------------------------------------

def ds_nerf_depth_loss(weights, termination_depth, steps, lengths, sigma):
    """Depth-supervised NeRF loss (ref: losses.py:213-235).

    Args:
        weights: [N, S]; termination_depth: [N]; steps/lengths: [N, S];
        sigma: scalar (treated as the reference does: divisor is 2*sigma).
    """
    depth_mask = termination_depth > 0
    loss = (
        -jnp.log(weights + EPS)
        * jnp.exp(-((steps - termination_depth[:, None]) ** 2) / (2 * sigma))
        * lengths
    )
    loss = jnp.sum(loss, axis=-1) * depth_mask
    return jnp.mean(loss)


def urban_radiance_field_depth_loss(
    weights, termination_depth, predicted_depth, steps, sigma
):
    """URF lidar loss (ref: losses.py:238-274)."""
    depth_mask = termination_depth > 0
    expected_depth_loss = (termination_depth - predicted_depth) ** 2

    urf_sigma = sigma / URF_SIGMA_SCALE_FACTOR
    td = termination_depth[:, None]
    target_pdf = jnp.exp(
        -0.5 * ((steps - td) / urf_sigma) ** 2
    ) / (urf_sigma * jnp.sqrt(2.0 * jnp.pi))
    near_mask = jnp.logical_and(steps <= td + sigma, steps >= td - sigma)
    loss_near = jnp.sum(near_mask * (weights - target_pdf) ** 2, axis=-1)
    empty_mask = steps < td - sigma
    loss_empty = jnp.sum(empty_mask * weights**2, axis=-1)

    loss = (expected_depth_loss + loss_near + loss_empty) * depth_mask
    return jnp.mean(loss)


def depth_loss(
    weights: jnp.ndarray,
    ray_samples: RaySamples,
    termination_depth: jnp.ndarray,
    predicted_depth: jnp.ndarray,
    sigma,
    directions_norm: jnp.ndarray,
    is_euclidean: bool,
    depth_loss_type: str = "ds_nerf",
) -> jnp.ndarray:
    """Dispatch DS-NeRF / URF depth supervision (ref: losses.py:277-313).

    Args:
        weights: [N, S]; termination_depth/predicted_depth/directions_norm: [N].
    """
    if not is_euclidean:
        termination_depth = termination_depth * directions_norm
    steps = ray_samples.midpoints()
    if depth_loss_type == "ds_nerf":
        lengths = ray_samples.deltas
        return ds_nerf_depth_loss(weights, termination_depth, steps, lengths, sigma)
    if depth_loss_type == "urf":
        return urban_radiance_field_depth_loss(
            weights, termination_depth, predicted_depth, steps, sigma
        )
    raise NotImplementedError(f"depth loss type {depth_loss_type}")


# ---------------------------------------------------------------------------
# Misc shared losses
# ---------------------------------------------------------------------------

def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def orientation_loss(weights, normals, viewdirs):
    """Ref-NeRF orientation loss (ref: losses.py:189-201).
    weights [N,S], normals [N,S,3], viewdirs [N,3] -> [N]."""
    n_dot_v = jnp.sum(normals * -viewdirs[..., None, :], axis=-1)
    return jnp.sum(weights * jnp.minimum(0.0, n_dot_v) ** 2, axis=-1)


def pred_normal_loss(weights, normals, pred_normals):
    """Density-vs-predicted normal consistency (ref: losses.py:204-210)."""
    return jnp.sum(weights * (1.0 - jnp.sum(normals * pred_normals, axis=-1)), axis=-1)


def scale_dict(d: dict, coefficients: dict) -> dict:
    """Multiply each loss by its coefficient (ref: utils/misc.py scale_dict)."""
    return {k: d[k] * coefficients.get(k, 1.0) for k in d}
