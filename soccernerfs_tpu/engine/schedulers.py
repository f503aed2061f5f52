"""LR schedulers (ref: engine/schedulers.py).

Re-expressed as optax schedule functions: step -> multiplier applied to the
base lr, matching the reference's torch LambdaLR factors.
"""
from __future__ import annotations

from dataclasses import dataclass
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ExponentialDecaySchedulerConfig:
    """lr = lr_init * (lr_final/lr_init)^(step/max_steps) with optional
    pre-warmup (ref: engine/schedulers.py:77-124)."""

    lr_final: float = 5e-6
    max_steps: int = 100000
    lr_pre_warmup: float = 1e-8
    warmup_steps: int = 0
    ramp: str = "cosine"


def exponential_decay_schedule(cfg: ExponentialDecaySchedulerConfig, lr_init: float):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if cfg.warmup_steps > 0:
            if cfg.ramp == "cosine":
                warmup = cfg.lr_pre_warmup + (lr_init - cfg.lr_pre_warmup) * jnp.sin(
                    0.5 * jnp.pi * jnp.clip(step / cfg.warmup_steps, 0, 1)
                )
            else:
                warmup = cfg.lr_pre_warmup + (lr_init - cfg.lr_pre_warmup) * jnp.clip(
                    step / cfg.warmup_steps, 0, 1
                )
        else:
            warmup = jnp.asarray(lr_init)
        t = jnp.clip(
            (step - cfg.warmup_steps) / max(cfg.max_steps - cfg.warmup_steps, 1), 0, 1
        )
        decayed = jnp.exp(
            np.log(lr_init) * (1 - t) + np.log(max(cfg.lr_final, 1e-12)) * t
        )
        lr = jnp.where(step < cfg.warmup_steps, warmup, decayed)
        return lr / lr_init  # optax scale_by_schedule multiplier convention

    return schedule


@dataclass(frozen=True)
class CosineDecaySchedulerConfig:
    """Linear warmup then cosine decay to ``learning_rate_alpha`` * lr
    (ref: engine/schedulers.py:126-161; used by all k-planes/nerfplayer
    methods with warm_up_end=512, alpha=0)."""

    warm_up_end: int = 5000
    learning_rate_alpha: float = 0.05
    max_steps: int = 300000


def cosine_decay_schedule(cfg: CosineDecaySchedulerConfig):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(cfg.warm_up_end, 1)
        alpha = cfg.learning_rate_alpha
        progress = jnp.clip(
            (step - cfg.warm_up_end) / max(cfg.max_steps - cfg.warm_up_end, 1), 0, 1
        )
        cosine = (jnp.cos(jnp.pi * progress) + 1.0) * 0.5 * (1 - alpha) + alpha
        return jnp.where(step < cfg.warm_up_end, warm, cosine)

    return schedule
