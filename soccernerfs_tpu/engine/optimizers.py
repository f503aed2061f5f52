"""Per-param-group optimizers (ref: engine/optimizers.py).

The reference keeps a dict of torch optimizers keyed by param-group name
("fields", "proposal_networks", "camera_opt", ...) with per-group Adam /
RAdam configs, optional max-norm clipping, and per-group LR schedules
(ref: engine/optimizers.py:73-151).  Here each group gets an optax chain;
the groups are combined with a top-level dict so one optax update call
inside the jitted train step updates everything.

No GradScaler: bf16 matmuls with fp32 master weights and fp32 loss need no
loss scaling (replaces engine/trainer.py:382-409's AMP machinery).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax.numpy as jnp
import optax

from soccernerfs_tpu.engine.schedulers import (
    CosineDecaySchedulerConfig,
    ExponentialDecaySchedulerConfig,
    cosine_decay_schedule,
    exponential_decay_schedule,
)


@dataclass(frozen=True)
class AdamOptimizerConfig:
    """Adam (ref: engine/optimizers.py:55-62)."""

    lr: float = 5e-4
    eps: float = 1e-8
    weight_decay: float = 0.0
    max_norm: Optional[float] = None
    kind: str = "adam"


@dataclass(frozen=True)
class RAdamOptimizerConfig(AdamOptimizerConfig):
    """RAdam (ref: engine/optimizers.py:64-70)."""

    kind: str = "radam"


def schedule_fn(scheduler_config, lr_init: float) -> Callable:
    """Build a step->multiplier schedule from a scheduler config (or None)."""
    if scheduler_config is None:
        return lambda step: jnp.asarray(1.0)
    if isinstance(scheduler_config, CosineDecaySchedulerConfig):
        return cosine_decay_schedule(scheduler_config)
    if isinstance(scheduler_config, ExponentialDecaySchedulerConfig):
        return exponential_decay_schedule(scheduler_config, lr_init)
    raise TypeError(f"unknown scheduler config {scheduler_config!r}")


def build_group_optimizer(
    opt_cfg: AdamOptimizerConfig, scheduler_config=None
) -> optax.GradientTransformation:
    """One param-group's optax chain: [clip] -> [wd] -> adam/radam -> lr(t).

    Weight decay is COUPLED L2 added to the gradient before the Adam
    moments, matching torch.optim.Adam's ``weight_decay`` (the reference
    optimizer) — not decoupled AdamW semantics.
    """
    sched = schedule_fn(scheduler_config, opt_cfg.lr)
    parts = []
    if opt_cfg.max_norm is not None:
        parts.append(optax.clip_by_global_norm(opt_cfg.max_norm))
    if opt_cfg.weight_decay:
        parts.append(optax.add_decayed_weights(opt_cfg.weight_decay))
    if opt_cfg.kind == "adam":
        parts.append(optax.scale_by_adam(eps=opt_cfg.eps))
    elif opt_cfg.kind == "radam":
        parts.append(optax.scale_by_radam(eps=opt_cfg.eps))
    else:
        raise ValueError(f"unknown optimizer kind {opt_cfg.kind}")
    parts.append(
        optax.scale_by_schedule(lambda step: -opt_cfg.lr * sched(step))
    )
    return optax.chain(*parts)


def build_optimizers(
    optimizer_configs: Dict[str, Dict[str, Any]],
    param_groups: Tuple[str, ...],
) -> optax.GradientTransformation:
    """Combine per-group chains over the top-level params dict.

    ``optimizer_configs`` maps group name -> {"optimizer": AdamOptimizerConfig,
    "scheduler": scheduler config or None}, mirroring the reference's
    method-registry optimizers dict (ref: configs/method_configs.py:549-560).
    Groups present in ``param_groups`` but missing from the config fall back
    to the first configured group (reference would KeyError; we are lenient
    for plugin models).
    """
    transforms = {}
    default_key = next(iter(optimizer_configs))
    for group in param_groups:
        gcfg = optimizer_configs.get(group, optimizer_configs[default_key])
        transforms[group] = build_group_optimizer(
            gcfg["optimizer"], gcfg.get("scheduler")
        )

    def label_fn(params):
        return {k: k for k in params}

    return optax.multi_transform(transforms, label_fn)


def learning_rates_at_step(
    optimizer_configs: Dict[str, Dict[str, Any]], step
) -> Dict[str, float]:
    """Per-group lr for logging (ref: engine/optimizers.py:141-151)."""
    out = {}
    for group, gcfg in optimizer_configs.items():
        lr = gcfg["optimizer"].lr
        mult = schedule_fn(gcfg.get("scheduler"), lr)(step)
        out[f"learning_rate/{group}"] = float(lr * mult)
    return out
