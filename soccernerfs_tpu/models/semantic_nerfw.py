"""Semantic-NeRF-W (ref: models/semantic_nerfw.py:55-304).

Nerfacto backbone + a semantic head on (detached) geometry features,
composited with detached weights and supervised with cross-entropy.
The reference's transient-embedding path raises "not fully working"
(semantic_nerfw.py:88-90) and is likewise not exposed here.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from soccernerfs_tpu.core.rays import RayBundle
from soccernerfs_tpu.fields.nerfacto import nerfacto_density
from soccernerfs_tpu.models import nerfacto as _nerfacto
from soccernerfs_tpu.ops.mlp import init_mlp, mlp_apply
from soccernerfs_tpu.ops.rendering import render_semantics


@dataclass(frozen=True)
class Config(_nerfacto.Config):
    """(ref: semantic_nerfw.py:55-66)."""

    num_semantic_classes: int = 100
    semantic_loss_weight: float = 1.0
    pass_semantic_gradients: bool = False


def init(rng: jax.Array, cfg: Config, num_train_data: int = 0) -> dict:
    k1, k2 = jax.random.split(rng)
    params = _nerfacto.init(k1, cfg, num_train_data)
    # semantic head: geo features -> 64x1 MLP -> class logits
    # (ref: nerfacto_field.py:186-200 mlp_semantics + SemanticFieldHead)
    params["fields"]["mlp_semantics"] = init_mlp(
        k2, cfg.field_config().geo_feat_dim, 64, 1, cfg.num_semantic_classes
    )
    return params


init_aux = _nerfacto.init_aux
schedules = _nerfacto.schedules


def get_outputs(
    cfg: Config,
    params: dict,
    aabb: jnp.ndarray,
    ray_bundle: RayBundle,
    rng: Optional[jax.Array] = None,
    train: bool = True,
    anneal=1.0,
    train_proposal_networks=True,
) -> dict:
    """(ref: semantic_nerfw.py:160-230)."""
    outputs = _nerfacto.get_outputs(
        cfg, params, aabb, ray_bundle, rng, train, anneal, train_proposal_networks
    )
    # recompute geo feats on the final samples for the semantic head
    ray_samples = outputs["ray_samples_list"][-1]
    weights = outputs["weights_list"][-1]
    positions = ray_samples.get_positions()
    n, s = positions.shape[:2]
    _, geo = nerfacto_density(
        cfg.field_config(), params["fields"], aabb, positions.reshape(-1, 3)
    )
    if not cfg.pass_semantic_gradients:
        geo = jax.lax.stop_gradient(geo)
    logits = mlp_apply(
        params["fields"]["mlp_semantics"], geo, activation="relu"
    ).reshape(n, s, cfg.num_semantic_classes)
    sem_weights = jax.lax.stop_gradient(weights)
    outputs["semantics"] = render_semantics(logits, sem_weights)
    outputs["semantics_labels"] = jnp.argmax(outputs["semantics"], axis=-1)
    return outputs


def get_metrics_dict(cfg: Config, outputs: dict, batch: dict, step=0) -> dict:
    return _nerfacto.get_metrics_dict(cfg, outputs, batch, step)


def get_loss_dict(
    cfg: Config, params: dict, outputs: dict, batch: dict, metrics_dict=None, train=True,
    rng=None,
) -> Dict:
    """(ref: semantic_nerfw.py:240-260)."""
    loss_dict = _nerfacto.get_loss_dict(
        cfg, params, outputs, batch, metrics_dict, train, rng
    )
    if train and "semantics" in batch:
        labels = batch["semantics"].astype(jnp.int32)
        logp = jax.nn.log_softmax(outputs["semantics"], axis=-1)
        ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        loss_dict["semantics_loss"] = cfg.semantic_loss_weight * jnp.mean(ce)
    return loss_dict
