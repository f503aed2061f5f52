"""External method plugin discovery (ref: plugins/registry.py:34-60,
plugins/types.py).

Third-party packages register methods through the
``soccernerfs_tpu.method_configs`` entry point (same mechanism as the
reference's ``nerfstudio.method_configs``): each entry point resolves to
a ``MethodSpecification`` whose config is merged into the registry.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

from soccernerfs_tpu.configs.base import TrainerConfig


@dataclass
class MethodSpecification:
    """(ref: plugins/types.py)."""

    config: TrainerConfig
    description: str = ""


def discover_methods() -> Tuple[Dict[str, TrainerConfig], Dict[str, str]]:
    """Collect methods from installed packages' entry points
    (ref: plugins/registry.py:34-60)."""
    methods: Dict[str, TrainerConfig] = {}
    descriptions: Dict[str, str] = {}
    try:
        from importlib.metadata import entry_points

        eps = entry_points()
        group = (
            eps.select(group="soccernerfs_tpu.method_configs")
            if hasattr(eps, "select")
            else eps.get("soccernerfs_tpu.method_configs", [])
        )
        for ep in group:
            spec = ep.load()
            if callable(spec):
                spec = spec()
            assert isinstance(spec, MethodSpecification), (
                f"entry point {ep.name} must resolve to a MethodSpecification"
            )
            methods[spec.config.method_name] = spec.config
            descriptions[spec.config.method_name] = spec.description
    except Exception as e:  # discovery must never break the CLI
        print(f"[plugins] method discovery failed: {e}")
    return methods, descriptions
