"""Coordinate encodings (ref: field_components/encodings.py).

NeRF positional (with optional integrated/IPE covariance weighting for
mip-NeRF), random Fourier features, and the TensoRF factorized encodings
(CP / VM / triplane).  Hash-grid encodings live in ops/hash_grid.py; SH
basis in core/math.py.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from soccernerfs_tpu.ops.grid_sample import sample_plane_bilinear_packed


def nerf_encoding(
    x: jnp.ndarray,
    num_frequencies: int,
    min_freq_exp: float,
    max_freq_exp: float,
    include_input: bool = False,
    covs: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """NeRF sinusoidal encoding (ref: encodings.py:99-160).

    Args:
        x: [..., D] (the reference scales to [0, 2pi] internally).
        covs: optional [..., D, D] covariances for mip-NeRF integrated
            encoding — expectation of sin under a Gaussian damps by
            exp(-var/2) (ref: encodings.py:139-155).
    Returns:
        [..., D * num_frequencies * 2 (+ D)].
    """
    x_scaled = 2.0 * jnp.pi * x
    freqs = 2.0 ** jnp.linspace(min_freq_exp, max_freq_exp, num_frequencies)
    scaled = x_scaled[..., None] * freqs  # [..., D, F]
    scaled = scaled.reshape(*x.shape[:-1], -1)  # [..., D*F]
    if covs is None:
        encoded = jnp.sin(
            jnp.concatenate([scaled, scaled + jnp.pi / 2.0], axis=-1)
        )
    else:
        var = jnp.diagonal(covs, axis1=-2, axis2=-1)[..., None] * freqs[None, :] ** 2
        var = (2.0 * jnp.pi) ** 2 * var  # scale matches x scaling
        var = var.reshape(*x.shape[:-1], -1)
        damp = jnp.exp(-0.5 * var)
        encoded = jnp.sin(
            jnp.concatenate([scaled, scaled + jnp.pi / 2.0], axis=-1)
        ) * jnp.concatenate([damp, damp], axis=-1)
    if include_input:
        encoded = jnp.concatenate([encoded, x], axis=-1)
    return encoded


def rff_encoding(
    x: jnp.ndarray, b_matrix: jnp.ndarray, include_input: bool = False
) -> jnp.ndarray:
    """Random Fourier features (ref: encodings.py:162-218).

    Args:
        b_matrix: [D, num_features] ~ N(0, scale^2), fixed at init.
    """
    scaled = 2.0 * jnp.pi * (x @ b_matrix)
    encoded = jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=-1)
    if include_input:
        encoded = jnp.concatenate([encoded, x], axis=-1)
    return encoded


def init_rff(rng: jax.Array, in_dim: int, num_features: int, scale: float) -> jnp.ndarray:
    return jax.random.normal(rng, (in_dim, num_features)) * scale


# ---------------------------------------------------------------------------
# TensoRF factorized encodings (ref: encodings.py:357-558)
# ---------------------------------------------------------------------------

def init_tensor_cp(rng, resolution: int, num_components: int, init_scale: float = 0.1):
    """CP decomposition: per-axis line features [3, R, C]
    (ref: encodings.py:357-405)."""
    return {"line_coef": init_scale * jax.random.normal(rng, (3, resolution, num_components))}


def tensor_cp_encoding(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """x in [-1, 1]^3 -> [..., C] product of per-axis line interps."""
    line = params["line_coef"]  # [3, R, C]
    R = line.shape[1]
    pos = (x + 1.0) * 0.5 * (R - 1)  # align_corners
    pos = jnp.clip(pos, 0, R - 1)
    p0 = jnp.floor(pos).astype(jnp.int32)
    p1 = jnp.minimum(p0 + 1, R - 1)
    t = (pos - p0)[..., None]
    out = 1.0
    for axis in range(3):
        f0 = jnp.take(line[axis], p0[..., axis], axis=0)
        f1 = jnp.take(line[axis], p1[..., axis], axis=0)
        out = out * (f0 * (1 - t[..., axis, :]) + f1 * t[..., axis, :])
    return out


def init_tensor_vm(rng, resolution: int, num_components: int, init_scale: float = 0.1):
    """VM decomposition: 3 planes + 3 lines (ref: encodings.py:407-474)."""
    k1, k2 = jax.random.split(rng)
    return {
        "plane_coef": init_scale
        * jax.random.normal(k1, (3, resolution, resolution, num_components)),
        "line_coef": init_scale * jax.random.normal(k2, (3, resolution, num_components)),
    }


def tensor_vm_encoding(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """x in [-1, 1]^3 -> [..., 3C]: plane(y,z etc.) * line(orthogonal axis)
    following the reference's (plane, line) index pairing."""
    planes = params["plane_coef"]  # [3, R, R, C]
    lines = params["line_coef"]  # [3, R, C]
    R = lines.shape[1]
    # reference pairing: plane coords ([0,1],[0,2],[1,2]); line axes (2,1,0)
    plane_pairs = ((0, 1), (0, 2), (1, 2))
    line_axes = (2, 1, 0)
    pos = (x + 1.0) * 0.5 * (R - 1)
    pos = jnp.clip(pos, 0, R - 1)
    p0 = jnp.floor(pos).astype(jnp.int32)
    p1 = jnp.minimum(p0 + 1, R - 1)
    t = pos - p0

    outs = []
    for i in range(3):
        a, b = plane_pairs[i]
        coords = jnp.stack([x[..., a], x[..., b]], axis=-1)
        plane_feat = sample_plane_bilinear_packed(planes[i], coords)
        la = line_axes[i]
        f0 = jnp.take(lines[i], p0[..., la], axis=0)
        f1 = jnp.take(lines[i], p1[..., la], axis=0)
        line_feat = f0 * (1 - t[..., la, None]) + f1 * t[..., la, None]
        outs.append(plane_feat * line_feat)
    return jnp.concatenate(outs, axis=-1)


def upsample_tensor_vm(params: dict, new_resolution: int) -> dict:
    """Bilinear upsampling of VM grids for TensoRF's coarse-to-fine
    schedule (ref: encodings.py:463-474)."""
    planes = params["plane_coef"]
    lines = params["line_coef"]
    new_planes = jax.image.resize(
        planes,
        (3, new_resolution, new_resolution, planes.shape[-1]),
        method="bilinear",
    )
    new_lines = jax.image.resize(
        lines, (3, new_resolution, lines.shape[-1]), method="bilinear"
    )
    return {"plane_coef": new_planes, "line_coef": new_lines}


def init_triplane(rng, resolution: int, num_components: int, init_scale: float = 0.1):
    """Triplane: 3 planes, features summed (ref: encodings.py:476-558)."""
    return {
        "plane_coef": init_scale
        * jax.random.normal(rng, (3, resolution, resolution, num_components))
    }


def triplane_encoding(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    planes = params["plane_coef"]
    plane_pairs = ((0, 1), (0, 2), (1, 2))
    out = 0.0
    for i, (a, b) in enumerate(plane_pairs):
        coords = jnp.stack([x[..., a], x[..., b]], axis=-1)
        out = out + sample_plane_bilinear_packed(planes[i], coords)
    return out


def conical_frustum_to_gaussian(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    starts: jnp.ndarray,
    ends: jnp.ndarray,
    radius: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """mip-NeRF conical frustum -> (mean, cov) Gaussian approximation
    (ref: utils/math.py:120-185, eq. 7 of the paper).

    Args:
        origins/directions: [..., 3]; starts/ends/radius: [..., 1].
    Returns:
        (means [..., 3], covs [..., 3, 3]).
    """
    mu = (starts + ends) / 2.0
    hw = (ends - starts) / 2.0
    denom = 3.0 * mu**2 + hw**2
    t_mean = mu + (2.0 * mu * hw**2) / denom
    t_var = (hw**2) / 3.0 - (4.0 / 15.0) * ((hw**4 * (12.0 * mu**2 - hw**2)) / denom**2)
    r_var = radius**2 * (
        (mu**2) / 4.0 + (5.0 / 12.0) * hw**2 - (4.0 / 15.0) * (hw**4) / denom
    )
    means = origins + directions * t_mean
    d_outer = directions[..., :, None] * directions[..., None, :]
    eye = jnp.eye(3)
    null_outer = eye - d_outer  # P = I - dd^T (directions unit)
    covs = t_var[..., None] * d_outer + r_var[..., None] * null_outer
    return means, covs
