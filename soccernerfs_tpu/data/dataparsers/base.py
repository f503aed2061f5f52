"""Dataparser base types (ref: data/dataparsers/base_dataparser.py)."""
from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

from soccernerfs_tpu.core.cameras import Cameras
from soccernerfs_tpu.core.scene_box import SceneBox


def load_from_json(filename: Path) -> dict:
    """(ref: utils/io.py:24-35)."""
    assert str(filename).endswith(".json")
    with open(filename, encoding="UTF-8") as f:
        return json.load(f)


def write_to_json(filename: Path, content: dict) -> None:
    """(ref: utils/io.py:38-48)."""
    assert str(filename).endswith(".json")
    with open(filename, "w", encoding="UTF-8") as f:
        json.dump(content, f)


@dataclass
class DataparserOutputs:
    """Parsed dataset description (ref: base_dataparser.py:36-88).

    ``cameras`` is the device-side Cameras pytree; filenames stay host-side.
    """

    image_filenames: List[Path]
    cameras: Cameras
    scene_box: SceneBox
    alpha_color: Optional[np.ndarray] = None
    mask_filenames: Optional[List[Path]] = None
    dataparser_scale: float = 1.0
    dataparser_transform: np.ndarray = field(
        default_factory=lambda: np.eye(4, dtype=np.float32)[:3]
    )
    metadata: Dict[str, Any] = field(default_factory=dict)

    def as_dict(self) -> dict:
        return vars(self)

    def save_dataparser_transform(self, path: Path) -> None:
        """Persist the transform applied by the dataparser so other software
        can map back to original coordinates
        (ref: base_dataparser.py:90-106; written by trainer.py:199-201)."""
        data = {
            "transform": np.asarray(self.dataparser_transform).tolist(),
            "scale": float(self.dataparser_scale),
        }
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w", encoding="UTF-8") as f:
            json.dump(data, f, indent=4)


@dataclass
class DataParserConfig:
    """Base config (ref: base_dataparser.py:110-119)."""

    data: Path = Path()

    def setup(self) -> "DataParser":
        raise NotImplementedError


class DataParser:
    """Base dataparser; subclasses implement _generate_dataparser_outputs
    (ref: base_dataparser.py:122-152)."""

    def __init__(self, config: DataParserConfig):
        self.config = config

    def _generate_dataparser_outputs(self, split: str = "train") -> DataparserOutputs:
        raise NotImplementedError

    def get_dataparser_outputs(self, split: str = "train") -> DataparserOutputs:
        return self._generate_dataparser_outputs(split)
