"""Shared eval setup (ref: utils/eval_utils.py:36-108).

Rebuilds a trainer from a run's config.yml, loads the latest (or given)
checkpoint, and returns it ready for rendering/metrics.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import yaml

from soccernerfs_tpu.configs.base import TrainerConfig
from soccernerfs_tpu.engine.trainer import Trainer


def eval_setup(
    config_path: Path,
    test_mode: str = "test",
    load_step: Optional[int] = None,
) -> Tuple[TrainerConfig, Trainer, int]:
    """Load config.yml -> rebuild pipeline -> restore checkpoint
    (ref: eval_utils.py:67-108)."""
    config: TrainerConfig = yaml.load(Path(config_path).read_text(), Loader=yaml.Loader)
    base_dir = config_path.parent
    config.load_dir = base_dir
    config.load_step = load_step
    # eval runs should not talk to wandb
    config.vis = "none"
    trainer = Trainer(config, test_mode=test_mode)
    trainer.base_dir = base_dir
    trainer.setup()
    step = int(__import__("jax").device_get(trainer.state.step))
    return config, trainer, step
