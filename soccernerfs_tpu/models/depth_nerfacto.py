"""Depth-supervised nerfacto (ref: models/depth_nerfacto.py:38-135).

Nerfacto plus DS-NeRF/URF depth supervision on the final weights, with
optionally decaying sigma.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax.numpy as jnp

from soccernerfs_tpu.models import kplanes as _kp
from soccernerfs_tpu.models import nerfacto as _nerfacto
from soccernerfs_tpu.ops import losses as L


@dataclass(frozen=True)
class Config(_nerfacto.Config):
    """(ref: depth_nerfacto.py:38-58)."""

    depth_loss_mult: float = 1e-3
    is_euclidean_depth: bool = False
    depth_sigma: float = 0.01
    should_decay_sigma: bool = True
    starting_depth_sigma: float = 0.2
    sigma_decay_rate: float = 0.99985
    depth_loss_type: str = "ds_nerf"


init = _nerfacto.init
init_aux = _nerfacto.init_aux
schedules = _nerfacto.schedules
get_outputs = _nerfacto.get_outputs


def get_metrics_dict(cfg: Config, outputs: dict, batch: dict, step=0) -> dict:
    """(ref: depth_nerfacto.py:81-100)."""
    metrics = _nerfacto.get_metrics_dict(cfg, outputs, batch, step)
    if "depth_image" in batch:
        sigma = _kp.depth_sigma_for_step(cfg, step)
        dn = outputs.get("directions_norm", jnp.ones_like(batch["depth_image"]))
        total = 0.0
        k = len(outputs["weights_list"])
        for w, rs in zip(outputs["weights_list"], outputs["ray_samples_list"]):
            total += (
                L.depth_loss(
                    w, rs, batch["depth_image"], outputs["depth"], sigma, dn,
                    cfg.is_euclidean_depth, cfg.depth_loss_type,
                )
                / k
            )
        metrics["depth_loss"] = total
    return metrics


def get_loss_dict(
    cfg: Config, params: dict, outputs: dict, batch: dict, metrics_dict=None, train=True,
    rng=None,
) -> Dict:
    """(ref: depth_nerfacto.py:102-112)."""
    loss_dict = _nerfacto.get_loss_dict(cfg, params, outputs, batch, metrics_dict, train, rng)
    if train and metrics_dict is not None and "depth_loss" in metrics_dict:
        loss_dict["depth_loss"] = cfg.depth_loss_mult * metrics_dict["depth_loss"]
    return loss_dict
