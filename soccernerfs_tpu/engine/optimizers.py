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

import jax
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
    # "bfloat16" cuts Adam-moment HBM traffic (see scale_by_adam_lowp);
    # None keeps optax f32 moments (bit-compatible with the reference).
    # nu storage stays f32 regardless: its 0.1%/step EMA decay is below
    # the bf16 ulp and would stall (scale_by_adam_lowp docstring);
    # set nu_moment_dtype="bfloat16" to override.
    moment_dtype: Optional[str] = None
    nu_moment_dtype: str = "float32"


@dataclass(frozen=True)
class RAdamOptimizerConfig(AdamOptimizerConfig):
    """RAdam (ref: engine/optimizers.py:64-70)."""

    kind: str = "radam"


def scale_by_adam_lowp(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    moment_dtype=jnp.bfloat16,
    nu_dtype=jnp.float32,
) -> optax.GradientTransformation:
    """Adam scaling with low-precision moment STORAGE (f32 compute).

    The K-Planes param tree is ~155M entries of feature-plane tables and
    the TV losses make every entry's gradient dense, so a train step moves
    params + grads + both Adam moments through HBM (~4 GB at f32 — ~14 ms
    of a 165 ms step on v5e).  Storing mu in bfloat16 cuts the moment
    traffic; all arithmetic (moment EMAs, bias correction, the update
    quotient) stays f32, so the only difference from optax.scale_by_adam
    is a bf16 round of the moment between steps (~0.4% relative).  The
    fixture convergence run shows no PSNR change (PERF.md).

    ``nu`` defaults to f32 storage: with b2=0.999 the per-step EMA decay
    (0.1%) is BELOW bf16's ~0.39% ulp, so once nu is large and gradients
    shrink, ``b2 * nu`` rounds back to nu and the second moment stalls
    high, silently suppressing late-training updates (an EMA-stall the
    short fixture runs cannot see).  mu's 10%/step decay is ~25x the bf16
    ulp and does not stall.  Pass ``nu_dtype=jnp.bfloat16`` to accept the
    risk and halve nu traffic too.

    Matches torch.optim.Adam's update (the reference optimizer,
    ref: engine/optimizers.py:55-62) like optax.scale_by_adam does.
    """

    def init(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, moment_dtype), params
            ),
            nu=jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, nu_dtype), params
            ),
        )

    def update(grads, state, params=None):
        del params
        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def moments(g, mu, nu):
            g = g.astype(jnp.float32)
            mu_f = b1 * mu.astype(jnp.float32) + (1.0 - b1) * g
            nu_f = b2 * nu.astype(jnp.float32) + (1.0 - b2) * g * g
            upd = (mu_f / c1) / (jnp.sqrt(nu_f / c2) + eps)
            return upd, mu_f.astype(moment_dtype), nu_f.astype(nu_dtype)

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        out = [moments(g, m, n) for g, m, n in zip(flat_g, flat_mu, flat_nu)]
        updates = treedef.unflatten([o[0] for o in out])
        mu = treedef.unflatten([o[1] for o in out])
        nu = treedef.unflatten([o[2] for o in out])
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


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
        if opt_cfg.moment_dtype is not None:
            parts.append(
                scale_by_adam_lowp(
                    eps=opt_cfg.eps,
                    moment_dtype=jnp.dtype(opt_cfg.moment_dtype),
                    nu_dtype=jnp.dtype(opt_cfg.nu_moment_dtype),
                )
            )
        else:
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
