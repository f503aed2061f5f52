"""SDF field for surface models (ref: fields/sdf_field.py, ~700 LoC).

Functional essentials: a geometric-initialized MLP producing (sdf, geo
features), a color head conditioned on points/dirs/normals/features, a
learned single-parameter deviation network (NeuS's s), and Laplace
density (VolSDF) support.  Normals come from jax.grad of the SDF.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from soccernerfs_tpu.ops.encodings import nerf_encoding
from soccernerfs_tpu.ops.mlp import mlp_apply


@dataclass(frozen=True)
class SDFFieldConfig:
    """(ref: sdf_field.py SDFFieldConfig)."""

    num_layers: int = 8
    hidden_dim: int = 256
    geo_feat_dim: int = 256
    num_layers_color: int = 4
    hidden_dim_color: int = 256
    position_encoding_freqs: int = 6
    direction_encoding_freqs: int = 4
    bias: float = 0.8  # sphere-init radius
    inside_outside: bool = False
    beta_init: float = 0.1  # deviation init

    @property
    def pos_enc_dim(self) -> int:
        return 3 + 3 * self.position_encoding_freqs * 2

    @property
    def dir_enc_dim(self) -> int:
        return 3 + 3 * self.direction_encoding_freqs * 2


def init_sdf_field(rng: jax.Array, cfg: SDFFieldConfig) -> dict:
    """Geometric (sphere) initialization (ref: sdf_field.py geometric_init):
    weights ~ N(0, sqrt(2/dim)), last layer set so sdf(x) ≈ |x| - bias."""
    keys = jax.random.split(rng, cfg.num_layers + cfg.num_layers_color + 2)
    dims = [cfg.pos_enc_dim] + [cfg.hidden_dim] * (cfg.num_layers - 1) + [
        1 + cfg.geo_feat_dim
    ]
    ws, bs = [], []
    for i in range(len(dims) - 1):
        out_dim = dims[i + 1]
        in_dim = dims[i]
        if i == len(dims) - 2:
            # final layer: mean sqrt(pi/in_dim), tiny std; bias -r
            sign = -1.0 if not cfg.inside_outside else 1.0
            mean = np.sqrt(np.pi) / np.sqrt(in_dim)
            w = mean + 1e-4 * jax.random.normal(keys[i], (in_dim, out_dim))
            w = w.at[:, 1:].set(
                jax.random.normal(keys[i], (in_dim, out_dim - 1))
                * np.sqrt(2) / np.sqrt(out_dim - 1) * 1e-2
            )
            b = jnp.zeros((out_dim,)).at[0].set(sign * cfg.bias)
        else:
            w = jax.random.normal(keys[i], (in_dim, out_dim)) * np.sqrt(2.0 / out_dim)
            if i == 0:
                # zero the encoding part so init sees raw xyz only
                w = w.at[3:, :].set(0.0)
            b = jnp.zeros((out_dim,))
        ws.append(jnp.asarray(w, jnp.float32))
        bs.append(jnp.asarray(b, jnp.float32))
    params = {"sdf_mlp": {"w": ws, "b": bs}}

    cdims = (
        [3 + cfg.dir_enc_dim + 3 + cfg.geo_feat_dim]
        + [cfg.hidden_dim_color] * (cfg.num_layers_color - 1)
        + [3]
    )
    cws, cbs = [], []
    for i in range(len(cdims) - 1):
        k = keys[cfg.num_layers + i]
        bound = 1.0 / np.sqrt(cdims[i])
        cws.append(jax.random.uniform(k, (cdims[i], cdims[i + 1]), jnp.float32, -bound, bound))
        cbs.append(jnp.zeros((cdims[i + 1],)))
    params["color_mlp"] = {"w": cws, "b": cbs}
    params["deviation"] = jnp.asarray(cfg.beta_init, jnp.float32)
    return params


def _sdf_mlp(cfg: SDFFieldConfig, params, positions):
    pe = nerf_encoding(
        positions, cfg.position_encoding_freqs, 0.0,
        cfg.position_encoding_freqs - 1, include_input=True,
    )
    # softplus(beta=100) activation per the reference
    h = pe
    mlp = params["sdf_mlp"]
    n = len(mlp["w"])
    for i, (w, b) in enumerate(zip(mlp["w"], mlp["b"])):
        h = h @ w + b
        if i < n - 1:
            h = jax.nn.softplus(100.0 * h) / 100.0
    return h


def sdf_and_features(
    cfg: SDFFieldConfig, params: dict, positions: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    out = _sdf_mlp(cfg, params, positions)
    return out[..., 0], out[..., 1:]


def sdf_value(cfg: SDFFieldConfig, params: dict, positions: jnp.ndarray) -> jnp.ndarray:
    return sdf_and_features(cfg, params, positions)[0]


def sdf_normals(cfg: SDFFieldConfig, params: dict, positions: jnp.ndarray) -> jnp.ndarray:
    """Analytic SDF gradient via jax.grad (ref: sdf_field.py gradient)."""
    g = jax.grad(lambda p: jnp.sum(sdf_value(cfg, params, p)))(positions)
    return g


def sdf_rgb(
    cfg: SDFFieldConfig,
    params: dict,
    positions: jnp.ndarray,
    directions: jnp.ndarray,
    normals: jnp.ndarray,
    features: jnp.ndarray,
) -> jnp.ndarray:
    de = nerf_encoding(
        directions, cfg.direction_encoding_freqs, 0.0,
        cfg.direction_encoding_freqs - 1, include_input=True,
    )
    h = jnp.concatenate([positions, de, normals, features], axis=-1)
    return mlp_apply(params["color_mlp"], h, activation="relu", output_activation="sigmoid")


def inv_s(params: dict) -> jnp.ndarray:
    """NeuS deviation: s = exp(10 * variance-param)
    (ref: sdf_field.py LearnedVariance)."""
    return jnp.exp(10.0 * params["deviation"])
