"""Ray pytrees.

TPU-native re-design of the reference's ``cameras/rays.py`` (Frustums /
RaySamples / RayBundle TensorDataclasses).  Everything is a flax.struct
pytree with static shapes: a bundle is a flat batch of N rays, samples are
[N, S] with S fixed per call site, and scalar-per-ray fields drop the
trailing singleton dim the torch code carries around.

Spacing ("s-space") bookkeeping: instead of storing a
``spacing_to_euclidean_fn`` closure (ref: cameras/rays.py:119), RaySamples
records the spacing-warp name (static) plus the warped near/far per ray, so
resampling passes stay pure and jit-friendly.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

# Spacing warps, matching the reference samplers' spacing_fn / spacing_fn_inv
# pairs (ref: model_components/ray_samplers.py:129-246).
_SPACING_FNS = {
    "uniform": (lambda x: x, lambda x: x),
    "lindisp": (lambda x: 1.0 / x, lambda x: 1.0 / x),
    "sqrt": (jnp.sqrt, lambda x: x**2),
    "log": (jnp.log, jnp.exp),
    "piecewise": (
        lambda x: jnp.where(x < 1, x / 2.0, 1.0 - 1.0 / (2.0 * x)),
        lambda x: jnp.where(x < 0.5, 2.0 * x, 1.0 / (2.0 - 2.0 * x)),
    ),
}


def spacing_fn(name: str, x: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distance -> warped s-space."""
    return _SPACING_FNS[name][0](x)


def spacing_fn_inv(name: str, x: jnp.ndarray) -> jnp.ndarray:
    """Warped s-space -> euclidean distance."""
    return _SPACING_FNS[name][1](x)


@struct.dataclass
class Frustums:
    """Conical frustum segments along rays (ref: cameras/rays.py:31-102)."""

    origins: jnp.ndarray  # [..., 3]
    directions: jnp.ndarray  # [..., 3]
    starts: jnp.ndarray  # [...]
    ends: jnp.ndarray  # [...]
    pixel_area: jnp.ndarray  # [...]

    def get_positions(self) -> jnp.ndarray:
        """Frustum center positions (ref: cameras/rays.py:48-57)."""
        mids = (self.starts + self.ends) / 2.0
        return self.origins + self.directions * mids[..., None]

    def get_start_positions(self) -> jnp.ndarray:
        return self.origins + self.directions * self.starts[..., None]


@struct.dataclass
class RayBundle:
    """A flat batch of rays (ref: cameras/rays.py:173-232).

    All optional per-ray scalars are [N] (no trailing 1-dim).
    ``directions_norm`` replaces the reference's
    ``metadata["directions_norm"]`` side channel (ref: cameras/cameras.py:740).
    """

    origins: jnp.ndarray  # [N, 3]
    directions: jnp.ndarray  # [N, 3] unit vectors
    pixel_area: jnp.ndarray  # [N]
    camera_indices: Optional[jnp.ndarray] = None  # [N] int32
    nears: Optional[jnp.ndarray] = None  # [N]
    fars: Optional[jnp.ndarray] = None  # [N]
    times: Optional[jnp.ndarray] = None  # [N] in [0, 1]
    directions_norm: Optional[jnp.ndarray] = None  # [N]

    @property
    def num_rays(self) -> int:
        return self.origins.shape[0]

    def get_ray_samples(
        self,
        bin_starts: jnp.ndarray,  # [N, S] euclidean
        bin_ends: jnp.ndarray,  # [N, S]
        spacing_starts: jnp.ndarray,  # [N, S] in [0, 1]
        spacing_ends: jnp.ndarray,  # [N, S]
        spacing: str,
        s_near: jnp.ndarray,  # [N] warped near
        s_far: jnp.ndarray,  # [N] warped far
    ) -> "RaySamples":
        """Project bin edges along rays into RaySamples
        (ref: cameras/rays.py:233-277)."""
        return RaySamples(
            origins=self.origins,
            directions=self.directions,
            pixel_area=self.pixel_area,
            starts=bin_starts,
            ends=bin_ends,
            spacing_starts=spacing_starts,
            spacing_ends=spacing_ends,
            spacing=spacing,
            s_near=s_near,
            s_far=s_far,
            camera_indices=self.camera_indices,
            times=self.times,
        )


@struct.dataclass
class RaySamples:
    """[N, S] samples along N rays (ref: cameras/rays.py:105-170)."""

    origins: jnp.ndarray  # [N, 3]
    directions: jnp.ndarray  # [N, 3]
    pixel_area: jnp.ndarray  # [N]
    starts: jnp.ndarray  # [N, S] euclidean bin starts
    ends: jnp.ndarray  # [N, S] euclidean bin ends
    spacing_starts: jnp.ndarray  # [N, S] s-space bin starts
    spacing_ends: jnp.ndarray  # [N, S] s-space bin ends
    s_near: jnp.ndarray  # [N]
    s_far: jnp.ndarray  # [N]
    spacing: str = struct.field(pytree_node=False, default="uniform")
    camera_indices: Optional[jnp.ndarray] = None  # [N] int32
    times: Optional[jnp.ndarray] = None  # [N]

    @property
    def num_samples(self) -> int:
        return self.starts.shape[-1]

    @property
    def deltas(self) -> jnp.ndarray:
        """Euclidean widths of each bin, [N, S]."""
        return self.ends - self.starts

    @property
    def frustums(self) -> Frustums:
        return Frustums(
            origins=self.origins[..., None, :],
            directions=self.directions[..., None, :],
            starts=self.starts,
            ends=self.ends,
            pixel_area=self.pixel_area[..., None],
        )

    def midpoints(self) -> jnp.ndarray:
        """[N, S] euclidean midpoints of each bin."""
        return (self.starts + self.ends) / 2.0

    def get_positions(self) -> jnp.ndarray:
        """[N, S, 3] world positions at bin midpoints."""
        return self.origins[..., None, :] + self.directions[..., None, :] * self.midpoints()[..., None]

    def spacing_to_euclidean(self, x: jnp.ndarray) -> jnp.ndarray:
        """Map s-space bin coordinates in [0,1] to euclidean distances.

        euclidean = spacing_fn_inv(x * s_far + (1 - x) * s_near)
        (ref: model_components/ray_samplers.py:114-116).
        """
        s_near = self.s_near[..., None]
        s_far = self.s_far[..., None]
        return spacing_fn_inv(self.spacing, x * s_far + (1.0 - x) * s_near)

    def get_weights(self, densities: jnp.ndarray) -> jnp.ndarray:
        """Volume-rendering weights from densities.

        w_i = (1 - exp(-sigma_i * delta_i)) * exp(-sum_{j<i} sigma_j delta_j)
        with NaN scrubbing (ref: cameras/rays.py:127-149).

        Args:
            densities: [N, S]
        Returns:
            weights: [N, S]
        """
        delta_density = self.deltas * densities
        alphas = 1.0 - jnp.exp(-delta_density)
        shifted = jnp.concatenate(
            [jnp.zeros_like(delta_density[..., :1]), delta_density[..., :-1]], axis=-1
        )
        transmittance = jnp.exp(-jnp.cumsum(shifted, axis=-1))
        return jnp.nan_to_num(alphas * transmittance)


def get_weights_and_transmittance_from_alphas(
    alphas: jnp.ndarray, weights_only: bool = False
):
    """Weights from per-sample alphas (ref: cameras/rays.py:151-170).

    Args:
        alphas: [N, S]
    Returns:
        weights [N, S] or (weights, transmittance [N, S+1]).
    """
    transmittance = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alphas[..., :1]), 1.0 - alphas + 1e-7], axis=-1),
        axis=-1,
    )
    weights = alphas * transmittance[..., :-1]
    if weights_only:
        return weights
    return weights, transmittance
