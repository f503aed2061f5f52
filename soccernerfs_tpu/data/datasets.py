"""Datasets: host-side image access (ref: data/datasets/base_dataset.py,
data/datasets/dynamic_dataset.py, data/utils/data_utils.py).

Images load to float32 numpy [H, W, 3] in [0, 1]; RGBA composites over the
dataparser's alpha color.  The dynamic dataset adds depth images and
IST/ISG/ISS importance weights (vectorized on device in
soccernerfs_tpu.data.importance, replacing the reference's per-image
Python loops, dynamic_dataset.py:98-470).
"""
from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from soccernerfs_tpu.data.dataparsers.base import DataparserOutputs


def get_image(filename: Path, scale_factor: float = 1.0, alpha_color=None) -> np.ndarray:
    """Load an image as float32 [H, W, 3] in [0, 1]
    (ref: base_dataset.py:57-89)."""
    pil_image = Image.open(filename)
    if scale_factor != 1.0:
        w, h = pil_image.size
        pil_image = pil_image.resize(
            (int(w * scale_factor), int(h * scale_factor)), resample=Image.BILINEAR
        )
    image = np.asarray(pil_image, dtype=np.uint8).astype(np.float32) / 255.0
    if image.ndim == 2:
        image = np.repeat(image[..., None], 3, axis=-1)
    if image.shape[-1] == 4:
        alpha = image[..., -1:]
        rgb = image[..., :3]
        if alpha_color is not None:
            image = rgb * alpha + np.asarray(alpha_color, np.float32) * (1.0 - alpha)
        else:
            image = rgb * alpha + (1.0 - alpha)
    return image[..., :3]


def get_mask(filename: Path, scale_factor: float = 1.0) -> np.ndarray:
    """Boolean [H, W] mask (ref: data_utils.py:25-40)."""
    pil_mask = Image.open(filename)
    if scale_factor != 1.0:
        w, h = pil_mask.size
        pil_mask = pil_mask.resize(
            (int(w * scale_factor), int(h * scale_factor)), resample=Image.NEAREST
        )
    mask = np.asarray(pil_mask)
    if mask.ndim == 3:
        mask = mask[..., 0]
    return mask > 0


def get_depth_image_from_path(
    filepath: Path, height: int, width: int, scale_factor: float
) -> np.ndarray:
    """[H, W] depth map in meters (ref: data_utils.py:43-77): npy or 16-bit
    png / image depth, resized to the camera resolution."""
    if filepath.suffix == ".npy":
        depth = np.load(filepath).astype(np.float64) * scale_factor
        image = Image.fromarray(depth)
    else:
        image = Image.open(filepath)
        depth = np.asarray(image).astype(np.float64) * scale_factor
        image = Image.fromarray(depth)
    image = image.resize((width, height), resample=Image.NEAREST)
    out = np.asarray(image, dtype=np.float32)
    if out.ndim == 3:
        out = out[..., 0]
    return out


class InputDataset:
    """Index-addressable image dataset (ref: base_dataset.py:35-116)."""

    def __init__(self, dataparser_outputs: DataparserOutputs, scale_factor: float = 1.0):
        self._dataparser_outputs = dataparser_outputs
        self.scale_factor = scale_factor
        self.cameras = dataparser_outputs.cameras
        self.scene_box = dataparser_outputs.scene_box
        self.metadata = dataparser_outputs.metadata
        self.alpha_color = dataparser_outputs.alpha_color

    def __len__(self) -> int:
        return len(self._dataparser_outputs.image_filenames)

    @property
    def image_filenames(self) -> List[Path]:
        return self._dataparser_outputs.image_filenames

    def get_image(self, image_idx: int) -> np.ndarray:
        return get_image(
            self._dataparser_outputs.image_filenames[image_idx],
            self.scale_factor,
            self.alpha_color,
        )

    def get_metadata(self, data: Dict) -> Dict:
        return {}

    def __getitem__(self, image_idx: int) -> Dict:
        data = {"image_idx": image_idx, "image": self.get_image(image_idx)}
        if self._dataparser_outputs.mask_filenames is not None:
            data["mask"] = get_mask(
                self._dataparser_outputs.mask_filenames[image_idx], self.scale_factor
            )
        data.update(self.get_metadata(data))
        return data


@dataclass
class ImportanceSamplingConfig:
    """Fork IS options (ref: dynamic_dataset.py:49-71 constructor args)."""

    use_importance_sampling: bool = True
    is_pixel_ratio: float = 0.03
    ist_range: float = 0.25
    iters_to_start_is: int = 2000
    isg: bool = False
    isg_gamma: float = 5e-2
    pick_mode: str = "randsteps"  # normal | randsteps | lowfps


class DynamicDataset(InputDataset):
    """InputDataset + depth images + importance-sampling weights
    (ref: dynamic_dataset.py:42-110)."""

    def __init__(
        self,
        dataparser_outputs: DataparserOutputs,
        scale_factor: float = 1.0,
        is_config: Optional[ImportanceSamplingConfig] = None,
        eval_dataset: bool = False,
    ):
        super().__init__(dataparser_outputs, scale_factor)
        self.is_config = is_config or ImportanceSamplingConfig()
        self.eval_dataset = eval_dataset

        self.depth_enabled = bool(dataparser_outputs.metadata.get("depth_filenames"))
        if self.depth_enabled:
            self.depth_filenames = self.metadata["depth_filenames"]
            self.depth_unit_scale_factor = self.metadata["depth_unit_scale_factor"]

    @property
    def static(self) -> bool:
        return bool(self._dataparser_outputs.metadata.get("static", False))

    def get_metadata(self, data: Dict) -> Dict:
        if not self.depth_enabled:
            return {}
        idx = data["image_idx"]
        height = int(np.asarray(self.cameras.height)[idx])
        width = int(np.asarray(self.cameras.width)[idx])
        scale = self.depth_unit_scale_factor * self._dataparser_outputs.dataparser_scale
        depth = get_depth_image_from_path(
            self.depth_filenames[idx], height, width, scale
        )
        return {"depth_image": depth}

    def compute_is(self, batch: Dict, offline: bool = False) -> Optional[np.ndarray]:
        """Dispatch static-ISS / ISG / IST (ref: dynamic_dataset.py:98-110).
        Returns [B, H, W] float16 weights (the reference's dtype) or None."""
        from soccernerfs_tpu.data import importance

        split = "eval" if self.eval_dataset else "train"
        if self.static:
            # NOTE: reference's compute_static_is forgets to return weights
            # in the online path (dynamic_dataset.py:169-213); fixed here.
            return importance.compute_iss(self, batch, split=split, offline=offline)
        if self.is_config.isg:
            return importance.compute_isg(
                self, batch, gamma=self.is_config.isg_gamma, split=split, offline=offline
            )
        return importance.compute_ist(
            self, batch, ist_range=self.is_config.ist_range, split=split, offline=offline
        )


class SemanticDataset(InputDataset):
    """Adds per-pixel semantic labels from the dataparser's ``semantics``
    metadata (ref: data/datasets/semantic_dataset.py)."""

    def __init__(self, dataparser_outputs, scale_factor: float = 1.0, **kwargs):
        super().__init__(dataparser_outputs, scale_factor)
        sem = dataparser_outputs.metadata.get("semantics")
        assert sem is not None, "SemanticDataset needs semantics metadata"
        self.semantic_filenames = sem["filenames"]
        self.semantic_classes = sem["classes"]
        self.semantic_colors = sem["colors"]

    def get_metadata(self, data: Dict) -> Dict:
        idx = data["image_idx"]
        sem = Image.open(self.semantic_filenames[idx])
        if self.scale_factor != 1.0:
            w, h = sem.size
            sem = sem.resize(
                (int(w * self.scale_factor), int(h * self.scale_factor)),
                resample=Image.NEAREST,
            )
        labels = np.asarray(sem)
        if labels.ndim == 3:
            labels = labels[..., 0]
        return {"semantics": labels.astype(np.int32)}
