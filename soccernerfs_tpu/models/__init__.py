"""Model registry: each model module exposes
``Config`` (frozen dataclass), ``init``, ``get_outputs``,
``get_metrics_dict``, ``get_loss_dict``, and optionally
``init_aux``/``schedules`` — a functional re-expression of the reference's
Model interface (ref: models/base_model.py:55-186).
"""
from __future__ import annotations

import importlib

_MODEL_MODULES = {
    "kplanes": "soccernerfs_tpu.models.kplanes",
    "nerfacto": "soccernerfs_tpu.models.nerfacto",
    "instant_ngp": "soccernerfs_tpu.models.instant_ngp",
    "nerfplayer": "soccernerfs_tpu.models.nerfplayer",
    "nerfplayer_nerfacto": "soccernerfs_tpu.models.nerfplayer_nerfacto",
    "nerfplayer_ngp": "soccernerfs_tpu.models.nerfplayer_ngp",
    "nerfplayer_ngp_complete": "soccernerfs_tpu.models.nerfplayer_ngp_complete",
    "vanilla_nerf": "soccernerfs_tpu.models.vanilla_nerf",
    "depth_nerfacto": "soccernerfs_tpu.models.depth_nerfacto",
    "mipnerf": "soccernerfs_tpu.models.mipnerf",
    "tensorf": "soccernerfs_tpu.models.tensorf",
    "semantic_nerfw": "soccernerfs_tpu.models.semantic_nerfw",
    "neus": "soccernerfs_tpu.models.neus",
}


def get_model(name: str):
    """Resolve a model module by registry name."""
    if name not in _MODEL_MODULES:
        raise KeyError(f"unknown model {name!r}; known: {sorted(_MODEL_MODULES)}")
    return importlib.import_module(_MODEL_MODULES[name])


def register_model(name: str, module_path: str):
    """Plugin hook (ref: plugins/registry.py:34-60)."""
    _MODEL_MODULES[name] = module_path
