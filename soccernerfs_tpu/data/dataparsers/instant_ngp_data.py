"""instant-ngp-format dataparser
(ref: data/dataparsers/instant_ngp_dataparser.py).

``transforms.json`` with global intrinsics, ``aabb_scale``, and per-frame
transform matrices; poses recentered and the scene box scaled by
``aabb_scale``.
"""
from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path, PurePath

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
class InstantNGPDataParserConfig(DataParserConfig):
    """(ref: instant_ngp_dataparser.py:36-46)."""

    data: Path = Path("data/ours/posterv2")
    scene_scale: float = 0.33

    def setup(self):
        return InstantNGP(self)


class InstantNGP(DataParser):
    """(ref: instant_ngp_dataparser.py:49-135)."""

    def _generate_dataparser_outputs(self, split="train") -> DataparserOutputs:
        data = Path(self.config.data)
        if data.suffix == ".json":
            meta = load_from_json(data)
            data_dir = data.parent
        else:
            meta = load_from_json(data / "transforms.json")
            data_dir = data

        image_filenames = []
        poses = []
        for frame in meta["frames"]:
            fname = data_dir / Path(str(PurePath(frame["file_path"])))
            if not fname.exists():
                continue
            image_filenames.append(fname)
            poses.append(np.array(frame["transform_matrix"], dtype=np.float32))
        assert image_filenames, f"no images under {data_dir}"
        poses = np.stack(poses)

        camera_to_world = poses[:, :3, :4]
        # centering per instant-ngp convention
        camera_to_world[..., 3] -= np.mean(camera_to_world[..., 3], axis=0)
        camera_to_world[..., 3] *= self.config.scene_scale

        distortion_params = np.broadcast_to(
            np.array(
                [float(meta.get(k, 0.0)) for k in ("k1", "k2", "k3", "k4", "p1", "p2")],
                np.float32,
            ),
            (len(image_filenames), 6),
        ).copy()

        aabb_scale = float(meta.get("aabb_scale", 1))
        scene_box = SceneBox(
            aabb=np.array(
                [[-aabb_scale, -aabb_scale, -aabb_scale], [aabb_scale, aabb_scale, aabb_scale]],
                dtype=np.float32,
            )
        )
        cameras = Cameras.create(
            camera_to_worlds=camera_to_world,
            fx=float(meta["fl_x"]),
            fy=float(meta["fl_y"]),
            cx=float(meta["cx"]),
            cy=float(meta["cy"]),
            width=int(meta["w"]),
            height=int(meta["h"]),
            distortion_params=distortion_params,
            camera_type=CameraType.PERSPECTIVE,
        )
        return DataparserOutputs(
            image_filenames=image_filenames,
            cameras=cameras,
            scene_box=scene_box,
            dataparser_scale=self.config.scene_scale,
        )
