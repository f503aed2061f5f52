"""Config tree (ref: configs/base_config.py, configs/experiment_config.py).

Typed dataclasses compose method configs; ``TrainerConfig`` is the root
the CLI materializes.  The reference's ``InstantiateConfig._target`` +
``.setup()`` pattern is kept where useful (dataparser/datamanager
configs); models are referenced by registry name since they are function
modules, not classes.
"""
from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import datetime
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

from soccernerfs_tpu.data.datamanager import VanillaDataManagerConfig


@dataclass
class MachineConfig:
    """(ref: configs/base_config.py:62-75).  num_devices=-1 uses all local
    devices; multi-host rendezvous via ``coordinator`` replaces dist_url."""

    seed: int = 42
    num_devices: int = -1
    num_machines: int = 1
    machine_rank: int = 0
    coordinator: Optional[str] = None
    # Take the shard_map SPMD branch even on a single-device mesh.  This
    # compiles the exact program a pod run executes (Mosaic custom calls
    # inside shard_map with explicit pmean) so the multi-chip path can be
    # validated on one real chip (the analog of always wrapping in DDP,
    # ref: pipelines/base_pipeline.py:244-246).
    force_shard_map: bool = False


@dataclass
class LoggingConfig:
    """(ref: configs/base_config.py:107-124)."""

    steps_per_log: int = 10
    max_buffer_size: int = 20
    enable_profiler: bool = True


@dataclass
class ViewerConfig:
    """(ref: configs/base_config.py:126-160)."""

    relative_log_filename: str = "viewer_log_filename.txt"
    websocket_port: int = 7007
    num_rays_per_chunk: int = 32768
    max_num_display_images: int = 512
    quit_on_train_completion: bool = False


@dataclass
class PipelineConfig:
    """(ref: pipelines/base_pipeline.py VanillaPipelineConfig):
    datamanager + model.  ``model_name`` picks the model module from
    soccernerfs_tpu.models registry; ``model`` is that module's Config."""

    datamanager: VanillaDataManagerConfig = field(default_factory=VanillaDataManagerConfig)
    model_name: str = "kplanes"
    model: Any = None
    dynamic_batch: bool = False
    target_num_samples: int = 1 << 18
    max_num_samples_per_ray: int = 1024


@dataclass
class TrainerConfig:
    """(ref: engine/trainer.py:59-88 + configs/experiment_config.py:42-130)."""

    method_name: str = "base"
    experiment_name: Optional[str] = None
    timestamp: str = "{timestamp}"
    output_dir: Path = Path("outputs")
    vis: str = "wandb"
    data: Optional[Path] = None  # --data alias for the dataparser's data

    steps_per_save: int = 1000
    steps_per_eval_batch: int = 500
    steps_per_eval_image: int = 500
    steps_per_eval_all_images: int = 25000
    max_num_iterations: int = 1000000
    mixed_precision: bool = False  # kept for CLI parity; bf16 policy is static
    save_only_latest_checkpoint: bool = True

    load_dir: Optional[Path] = None
    load_step: Optional[int] = None
    load_config: Optional[Path] = None

    machine: MachineConfig = field(default_factory=MachineConfig)
    logging: LoggingConfig = field(default_factory=LoggingConfig)
    viewer: ViewerConfig = field(default_factory=ViewerConfig)
    pipeline: PipelineConfig = field(default_factory=PipelineConfig)
    optimizers: Dict[str, Any] = field(default_factory=dict)

    def set_timestamp(self) -> None:
        """(ref: experiment_config.py:91-95)."""
        if self.timestamp == "{timestamp}":
            self.timestamp = datetime.now().strftime("%Y-%m-%d_%H%M%S")

    def set_experiment_name(self) -> None:
        """(ref: experiment_config.py:97-104)."""
        if self.experiment_name is None:
            dp = getattr(self.pipeline.datamanager, "dataparser", None)
            data = self.data or (dp.data if dp is not None else None)
            self.experiment_name = str(Path(data).stem) if data else "unnamed"

    def get_base_dir(self) -> Path:
        """(ref: experiment_config.py:106-110)."""
        self.set_experiment_name()
        return Path(
            f"{self.output_dir}/{self.experiment_name}/{self.method_name}/{self.timestamp}"
        )

    def get_checkpoint_dir(self) -> Path:
        return self.get_base_dir() / "snt_models"

    def save_config(self) -> None:
        """Serialize the full config to config.yml
        (ref: experiment_config.py:123-130)."""
        import yaml

        base_dir = self.get_base_dir()
        base_dir.mkdir(parents=True, exist_ok=True)
        (base_dir / "config.yml").write_text(yaml.dump(self), "utf8")

    def seed_everything(self, rank_offset: int = 0) -> None:
        """(ref: scripts/train.py:69-84)."""
        seed = self.machine.seed + rank_offset
        random.seed(seed)
        np.random.seed(seed)
