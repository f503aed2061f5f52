"""Minimal npz/pt dataparser (ref: data/dataparsers/minimal_dataparser.py).

Loads a pre-baked ``{split}.npz`` with image_filenames, cameras arrays,
and scene-box bounds — used for quick IO tests and custom pipelines.
"""
from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np

from soccernerfs_tpu.core.cameras import Cameras, CameraType
from soccernerfs_tpu.core.scene_box import SceneBox
from soccernerfs_tpu.data.dataparsers.base import (
    DataParser,
    DataParserConfig,
    DataparserOutputs,
)


@dataclass
class MinimalDataParserConfig(DataParserConfig):
    """(ref: minimal_dataparser.py:33-40)."""

    data: Path = Path("data/minimal")

    def setup(self):
        return Minimal(self)


class Minimal(DataParser):
    """(ref: minimal_dataparser.py:43-91)."""

    def _generate_dataparser_outputs(self, split="train") -> DataparserOutputs:
        path = Path(self.config.data) / f"{split}.npz"
        data = np.load(path, allow_pickle=True)

        image_filenames = [Path(f) for f in data["image_filenames"].tolist()]
        aabb = np.asarray(data["scene_box"], np.float32)
        scene_box = SceneBox(aabb=aabb)

        cam = data["cameras"].item() if data["cameras"].dtype == object else None
        if cam is not None:
            cameras = Cameras.create(**cam)
        else:
            c2w = np.asarray(data["camera_to_worlds"], np.float32)
            cameras = Cameras.create(
                camera_to_worlds=c2w,
                fx=np.asarray(data["fx"], np.float32),
                fy=np.asarray(data["fy"], np.float32),
                cx=np.asarray(data["cx"], np.float32),
                cy=np.asarray(data["cy"], np.float32),
                width=np.asarray(data["width"], np.int32),
                height=np.asarray(data["height"], np.int32),
                camera_type=CameraType.PERSPECTIVE,
                times=np.asarray(data["times"], np.float32) if "times" in data else None,
            )
        return DataparserOutputs(
            image_filenames=image_filenames,
            cameras=cameras,
            scene_box=scene_box,
        )
