"""HyperNeRF dataparser (ref: data/dataparsers/hypernerf_dataparser.py).

Nerfies/HyperNeRF capture layout: ``scene.json`` (center/scale/near/far),
``camera/*.json`` per-frame cameras (orientation = world-to-camera R,
position, focal_length, principal_point, distortions), images under
``rgb/{k}x/``.  Filenames are ``{left|right}_{step}``; the paper's
interleaved split trains left/even + right/odd and evaluates the
complement (ref: hypernerf_dataparser.py:232-247).
"""
from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import numpy as np

from soccernerfs_tpu.core.cameras import Cameras, CameraType
from soccernerfs_tpu.core.scene_box import SceneBox
from soccernerfs_tpu.data.dataparsers.base import (
    DataParser,
    DataParserConfig,
    DataparserOutputs,
    load_from_json,
)

_SIDES = {"left": 0, "right": 1}


@dataclass
class HyperNeRFDataParserConfig(DataParserConfig):
    """(ref: hypernerf_dataparser.py:59-86)."""

    data: Path = Path("data/hypernerf/")
    scale_factor: float = 1.0
    downscale_factor: Optional[int] = 2
    scene_scale: float = 1.5
    auto_scale_poses: bool = True

    def setup(self):
        return HyperNeRF(self)


class HyperNeRF(DataParser):
    def _generate_dataparser_outputs(self, split="train") -> DataparserOutputs:
        config = self.config
        data_dir = Path(config.data)
        scene = load_from_json(data_dir / "scene.json")
        center = np.array(scene["center"], dtype=np.float64)
        scale = float(scene["scale"])

        image_filenames, poses = [], []
        fx, fy, cx, cy, width, height, distort = [], [], [], [], [], [], []
        times, cam_uids = [], []

        for cam_json in sorted((data_dir / "camera").glob("*.json")):
            frame = load_from_json(cam_json)
            stem = cam_json.name.split(".")[0]
            fname = data_dir / "rgb" / f"{config.downscale_factor}x" / (stem + ".png")

            side = stem.split("_")[0]
            cam_id = _SIDES.get(side, 0)
            time_step = int(stem.split("_")[-1])
            cam_uids.append(cam_id)
            times.append(time_step)

            fx.append(float(frame["focal_length"]))
            fy.append(float(frame["focal_length"]))
            cx.append(float(frame["principal_point"][0]))
            cy.append(float(frame["principal_point"][1]))
            width.append(int(frame["image_size"][0]))
            height.append(int(frame["image_size"][1]))
            rd = frame.get("radial_distortion", [0.0, 0.0, 0.0])
            td = frame.get("tangential_distortion", [0.0, 0.0])
            distort.append([rd[0], rd[1], rd[2], 0.0, td[0], td[1]])

            image_filenames.append(fname)
            # world-to-cam orientation + position -> nerfstudio-convention c2w
            # (axis flips per ref: hypernerf_dataparser.py:199-230)
            Rt = np.array(frame["orientation"], dtype=np.float64).T
            p = (np.array(frame["position"], dtype=np.float64) - center) * (
                scale * config.scale_factor
            )
            pose = np.zeros((3, 4))
            pose[:, :3] = Rt * np.array([[1, -1, -1], [-1, 1, 1], [-1, 1, 1]])
            pose[:, 3] = p * np.array([1, -1, -1])
            pose = pose[[1, 0, 2], :]
            pose[2, :] *= -1
            pose = pose[[1, 2, 0], :]
            poses.append(pose)

        assert image_filenames, f"no hypernerf cameras under {data_dir}/camera"

        # interleaved left/right odd/even split
        indices = []
        for i, (cid, t) in enumerate(zip(cam_uids, times)):
            train_side = (cid == 0 and t % 2 == 0) or (cid == 1 and t % 2 == 1)
            if (split == "train") == train_side:
                indices.append(i)

        poses = np.stack(poses).astype(np.float32)
        scale_factor = 1.0
        if config.auto_scale_poses:
            scale_factor /= float(np.max(np.abs(poses[:, :3, 3])))
        scale_factor *= config.scale_factor

        image_filenames = [image_filenames[i] for i in indices]
        poses = poses[indices]

        s = config.scene_scale
        scene_box = SceneBox(aabb=np.array([[-s, -s, -s], [s, s, s]], dtype=np.float32))

        idx = np.asarray(indices)
        max_t = max(times) if max(times) else 1
        ds = 1.0 / (config.downscale_factor or 1)
        cameras = Cameras.create(
            camera_to_worlds=poses[:, :3, :4],
            fx=np.asarray(fx, np.float32)[idx] * ds,
            fy=np.asarray(fy, np.float32)[idx] * ds,
            cx=np.asarray(cx, np.float32)[idx] * ds,
            cy=np.asarray(cy, np.float32)[idx] * ds,
            width=(np.asarray(width)[idx] * ds).astype(np.int32),
            height=(np.asarray(height)[idx] * ds).astype(np.int32),
            distortion_params=np.asarray(distort, np.float32)[idx],
            camera_type=CameraType.PERSPECTIVE,
            times=np.asarray(times, np.float32)[idx] / max_t,
            ids=np.asarray(cam_uids, np.int32)[idx],
        )
        return DataparserOutputs(
            image_filenames=image_filenames,
            cameras=cameras,
            scene_box=scene_box,
            dataparser_scale=scale_factor,
        )
