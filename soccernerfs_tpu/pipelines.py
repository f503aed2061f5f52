"""Pipeline API adapter (ref: pipelines/base_pipeline.py:61-396).

The reference's VanillaPipeline composes DataManager + Model and exposes
loss/metric getters the trainer and eval scripts consume.  In the TPU
build those responsibilities live inside the jitted train step
(engine/trainer.py) — this module provides the same *surface* on top of
a Trainer for code written against the nerfstudio Pipeline API
(get_train_loss_dict / get_eval_loss_dict /
get_eval_image_metrics_and_images / get_average_eval_image_metrics).

DynamicBatchPipeline's target-sample behavior (ref: pipelines/
dynamic_batch.py:40-89) is the trainer's ``pipeline.dynamic_batch``
bucketed ray scaling.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import numpy as np

from soccernerfs_tpu.utils import metrics as M


class VanillaPipeline:
    """Thin adapter over a Trainer (see module docstring)."""

    def __init__(self, trainer):
        self.trainer = trainer
        self.datamanager = trainer.datamanager

    def get_train_loss_dict(self, step: int) -> Dict:
        """One training step's losses (ref: base_pipeline.py:253-270).
        Note: unlike the reference this also APPLIES the gradient step —
        the jitted step fuses forward/backward/update."""
        metrics = self.trainer.train_iteration(step)
        return {k: float(jax.device_get(v)) for k, v in metrics.items()}

    def get_eval_loss_dict(self, step: int) -> Dict:
        """(ref: base_pipeline.py:272-286)."""
        out = self.trainer.eval_iteration(step)
        return {k: float(jax.device_get(v)) for k, v in out.items()}

    def get_eval_image_metrics_and_images(self, step: int) -> Tuple[Dict, Dict]:
        """(ref: base_pipeline.py:288-321)."""
        idx, _, batch = self.datamanager.next_eval_image(step)
        outputs = self.trainer.render_camera(self.trainer.eval_cameras, idx)
        gt = np.asarray(batch["image"], np.float32)
        metrics = M.all_image_metrics(outputs["rgb"], gt)
        metrics["image_idx"] = idx
        images = {"img": np.concatenate([gt, outputs["rgb"]], axis=1), **outputs}
        return metrics, images

    def get_average_eval_image_metrics(self, step: int = 0) -> Dict:
        """(ref: base_pipeline.py:323-362)."""
        from soccernerfs_tpu.scripts.eval import average_eval_image_metrics

        return average_eval_image_metrics(self.trainer, use_dynmetric=True)

    def get_param_groups(self):
        params = jax.device_get(self.trainer.state.params)
        return {k: v for k, v in params.items()}
