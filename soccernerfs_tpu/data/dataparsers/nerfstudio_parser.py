"""Generic nerfstudio-format dataparser
(ref: data/dataparsers/nerfstudio_dataparser.py).

``transforms.json`` with optional global or per-frame intrinsics, optional
masks/depths, fraction-based train/eval split, orientation/centering and
auto-scaling, and ``images_{k}/`` downscale directories (note: the generic
format uses ``images_2/`` style dirs where the soccer scenes use ``2x/``).
"""
from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path, PurePath
from typing import Optional

import numpy as np

from soccernerfs_tpu.core.cameras import CAMERA_MODEL_TO_TYPE, Cameras, CameraType
from soccernerfs_tpu.core.pose_utils import auto_orient_and_center_poses
from soccernerfs_tpu.core.scene_box import SceneBox
from soccernerfs_tpu.data.dataparsers.base import (
    DataParser,
    DataParserConfig,
    DataparserOutputs,
    load_from_json,
)


@dataclass
class NerfstudioDataParserConfig(DataParserConfig):
    """(ref: nerfstudio_dataparser.py:39-68)."""

    data: Path = Path("data/nerfstudio/poster")
    scale_factor: float = 1.0
    downscale_factor: Optional[int] = None
    scene_scale: float = 1.0
    orientation_method: str = "up"
    center_method: str = "poses"
    auto_scale_poses: bool = True
    train_split_fraction: float = 0.9
    depth_unit_scale_factor: float = 1e-3

    def setup(self):
        return Nerfstudio(self)


class Nerfstudio(DataParser):
    """(ref: nerfstudio_dataparser.py:71-302)."""

    def __init__(self, config: NerfstudioDataParserConfig):
        super().__init__(config)

    def _get_fname(self, filepath: PurePath, data_dir: Path, prefix="images_") -> Path:
        ds = self.config.downscale_factor
        if ds is None or ds <= 1:
            return data_dir / filepath
        return data_dir / f"{prefix}{ds}" / Path(filepath).name

    def _generate_dataparser_outputs(self, split="train") -> DataparserOutputs:
        config = self.config
        data = Path(config.data)
        if data.suffix == ".json":
            meta = load_from_json(data)
            data_dir = data.parent
        else:
            meta = load_from_json(data / "transforms.json")
            data_dir = data

        fixed = {k: k in meta for k in ("fl_x", "fl_y", "cx", "cy", "h", "w")}
        distort_fixed = any(k in meta for k in ("k1", "k2", "k3", "p1", "p2"))

        image_filenames, mask_filenames, depth_filenames = [], [], []
        poses = []
        fx, fy, cx, cy, height, width, distort = [], [], [], [], [], [], []

        for frame in meta["frames"]:
            fname = self._get_fname(PurePath(frame["file_path"]), data_dir)
            if not fname.exists():
                continue

            def per_frame(key, out, cast):
                if not fixed[key]:
                    out.append(cast(frame[key]))

            per_frame("fl_x", fx, float)
            per_frame("fl_y", fy, float)
            per_frame("cx", cx, float)
            per_frame("cy", cy, float)
            per_frame("h", height, int)
            per_frame("w", width, int)
            if not distort_fixed:
                distort.append(
                    [float(frame.get(k, 0.0)) for k in ("k1", "k2", "k3", "k4", "p1", "p2")]
                )
            image_filenames.append(fname)
            poses.append(np.array(frame["transform_matrix"], dtype=np.float64))
            if "mask_path" in frame:
                mask_filenames.append(
                    self._get_fname(PurePath(frame["mask_path"]), data_dir, prefix="masks_")
                )
            if "depth_file_path" in frame:
                depth_filenames.append(
                    self._get_fname(PurePath(frame["depth_file_path"]), data_dir, prefix="depths_")
                )

        assert image_filenames, f"no images found under {data_dir}"

        # fraction split with equally-spaced train cameras
        # (ref: nerfstudio_dataparser.py:128-148)
        num_images = len(image_filenames)
        num_train = int(np.ceil(num_images * config.train_split_fraction))
        i_all = np.arange(num_images)
        i_train = np.linspace(0, num_images - 1, num_train, dtype=int)
        i_eval = np.setdiff1d(i_all, i_train)
        indices = i_train if split == "train" else i_eval

        orientation_method = meta.get("orientation_override", config.orientation_method)
        poses = np.stack(poses).astype(np.float32)
        poses, transform_matrix = auto_orient_and_center_poses(
            poses, method=orientation_method, center_method=config.center_method
        )
        scale_factor = 1.0
        if config.auto_scale_poses:
            scale_factor /= float(np.max(np.abs(poses[:, :3, 3])))
        scale_factor *= config.scale_factor
        poses[:, :3, 3] *= scale_factor

        image_filenames = [image_filenames[i] for i in indices]
        mask_filenames = [mask_filenames[i] for i in indices] if mask_filenames else []
        depth_filenames = [depth_filenames[i] for i in indices] if depth_filenames else []
        poses = poses[indices]

        s = config.scene_scale
        scene_box = SceneBox(aabb=np.array([[-s, -s, -s], [s, s, s]], dtype=np.float32))

        camera_type = (
            CAMERA_MODEL_TO_TYPE[meta["camera_model"]]
            if "camera_model" in meta
            else CameraType.PERSPECTIVE
        )

        def gather(key, values, cast):
            if fixed[key]:
                return cast(meta[key])
            return np.asarray(values)[indices]

        if distort_fixed:
            dp = np.array(
                [float(meta.get(k, 0.0)) for k in ("k1", "k2", "k3", "k4", "p1", "p2")],
                np.float32,
            )
            distortion_params = np.broadcast_to(dp, (len(indices), 6)).copy()
        else:
            distortion_params = np.asarray(distort, np.float32)[indices]

        ds = 1.0 / (config.downscale_factor or 1)
        cameras = Cameras.create(
            camera_to_worlds=poses[:, :3, :4],
            fx=np.asarray(gather("fl_x", fx, float), np.float32) * ds,
            fy=np.asarray(gather("fl_y", fy, float), np.float32) * ds,
            cx=np.asarray(gather("cx", cx, float), np.float32) * ds,
            cy=np.asarray(gather("cy", cy, float), np.float32) * ds,
            width=(np.asarray(gather("w", width, int)) * ds).astype(np.int32),
            height=(np.asarray(gather("h", height, int)) * ds).astype(np.int32),
            distortion_params=distortion_params,
            camera_type=int(camera_type),
        )

        return DataparserOutputs(
            image_filenames=image_filenames,
            cameras=cameras,
            scene_box=scene_box,
            mask_filenames=mask_filenames or None,
            dataparser_scale=scale_factor,
            dataparser_transform=transform_matrix,
            metadata={
                "depth_filenames": depth_filenames or None,
                "depth_unit_scale_factor": config.depth_unit_scale_factor,
            },
        )
