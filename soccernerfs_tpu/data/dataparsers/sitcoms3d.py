"""Sitcoms3D dataparser (ref: data/dataparsers/sitcoms3d_dataparser.py).

``cameras.json`` with per-frame intrinsics + camtoworld and a scene bbox;
optional panoptic "thing" segmentations for semantic-nerfw.
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
    load_from_json,
)


@dataclass
class Sitcoms3DDataParserConfig(DataParserConfig):
    """(ref: sitcoms3d_dataparser.py:44-59)."""

    data: Path = Path("data/sitcoms3d/TBBT-big_living_room")
    include_semantics: bool = True
    downscale_factor: int = 4
    scene_scale: float = 2.0

    def setup(self):
        return Sitcoms3D(self)


class Sitcoms3D(DataParser):
    """(ref: sitcoms3d_dataparser.py:61-160)."""

    def _generate_dataparser_outputs(self, split="train") -> DataparserOutputs:
        config = self.config
        data = Path(config.data)
        cameras_json = load_from_json(data / "cameras.json")
        frames = cameras_json["frames"]
        bbox = np.asarray(cameras_json["bbox"], np.float64)

        suffix = f"_{config.downscale_factor}" if config.downscale_factor != 1 else ""
        images_folder = f"images{suffix}"
        seg_folder = f"segmentations{suffix}"

        image_filenames, fx, fy, cx, cy, c2ws = [], [], [], [], [], []
        for frame in frames:
            image_filenames.append(data / images_folder / frame["image_name"])
            K = np.asarray(frame["intrinsics"])
            fx.append(K[0, 0])
            fy.append(K[1, 1])
            cx.append(K[0, 2])
            cy.append(K[1, 2])
            c2ws.append(np.asarray(frame["camtoworld"])[:3])
        c2w = np.stack(c2ws).astype(np.float64)

        # rotate 90deg about x so z is up (ref: :101-105)
        rotation = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float64)
        c2w[:, :3] = rotation @ c2w[:, :3]
        bbox = (rotation @ bbox.T).T

        aabb = np.sort(bbox, axis=0)
        center = aabb.mean(axis=0)
        aabb -= center
        c2w[..., 3] -= center
        lengths = aabb[1] - aabb[0]
        scale = config.scene_scale / lengths.max()
        aabb *= scale
        c2w[..., 3] *= scale

        metadata = {}
        if config.include_semantics:
            seg_filenames = [
                data / seg_folder / "thing" / f.name.replace(".jpg", ".png")
                for f in image_filenames
            ]
            panoptic = load_from_json(data / "panoptic_classes.json")
            metadata["semantics"] = {
                "filenames": seg_filenames,
                "classes": panoptic["thing"],
                "colors": np.asarray(panoptic["thing_colors"], np.float32) / 255.0,
            }

        ds = 1.0 / config.downscale_factor
        cameras = Cameras.create(
            camera_to_worlds=c2w.astype(np.float32),
            fx=np.asarray(fx, np.float32) * ds,
            fy=np.asarray(fy, np.float32) * ds,
            cx=np.asarray(cx, np.float32) * ds,
            cy=np.asarray(cy, np.float32) * ds,
            width=np.asarray([int(2 * x * ds) for x in cx], np.int32),
            height=np.asarray([int(2 * y * ds) for y in cy], np.int32),
            camera_type=CameraType.PERSPECTIVE,
        )
        return DataparserOutputs(
            image_filenames=image_filenames,
            cameras=cameras,
            scene_box=SceneBox(aabb=np.asarray(aabb, np.float32)),
            metadata=metadata,
        )
