"""DataManagers (ref: data/datamanagers/base_datamanager.py,
data/datamanagers/dynamic_datamanager.py).

TPU-first split of responsibilities: the datamanager runs entirely on the
host — image cache, pixel sampling, batch assembly — and yields
fixed-shape numpy arrays (camera index, pixel coords, supervision).  Ray
generation moved *inside* the jitted train step (see engine/trainer.py),
so next_train returns raw pixels; ``rays_for`` reproduces the reference's
(RayBundle, batch) surface for host-side consumers (eval, render, viewer).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from soccernerfs_tpu.core.camera_optimizer import CameraOptimizerConfig
from soccernerfs_tpu.core.cameras import generate_image_rays, generate_rays
from soccernerfs_tpu.core.rays import RayBundle
from soccernerfs_tpu.data.dataparsers.base import DataParserConfig
from soccernerfs_tpu.data.datasets import (
    DynamicDataset,
    ImportanceSamplingConfig,
    InputDataset,
)
from soccernerfs_tpu.data.image_cache import ImageBatchCache
from soccernerfs_tpu.data.pixel_samplers import (
    DynamicBasedPixelSampler,
    EquirectangularPixelSampler,
    PixelSampler,
)


@dataclass
class VanillaDataManagerConfig:
    """(ref: base_datamanager.py:281-334)."""

    dataparser: Optional[DataParserConfig] = None
    train_num_rays_per_batch: int = 1024
    train_num_images_to_sample_from: int = -1
    train_num_times_to_repeat_images: int = -1
    eval_num_rays_per_batch: int = 1024
    eval_num_images_to_sample_from: int = -1
    eval_num_times_to_repeat_images: int = -1
    eval_image_indices: Tuple[int, ...] = (0,)
    camera_optimizer: CameraOptimizerConfig = field(default_factory=CameraOptimizerConfig)
    camera_res_scale_factor: float = 1.0

    def setup(self, **kwargs) -> "VanillaDataManager":
        return VanillaDataManager(self, **kwargs)


@dataclass
class DynamicDataManagerConfig(VanillaDataManagerConfig):
    """Fork datamanager exposing the IS options
    (ref: dynamic_datamanager.py:40-59)."""

    use_importance_sampling: bool = True
    is_pixel_ratio: float = 0.03
    ist_range: float = 0.25
    iters_to_start_is: int = 2000
    isg: bool = False
    isg_gamma: float = 5e-2
    pick_mode: str = "randsteps"

    def setup(self, **kwargs) -> "DynamicDataManager":
        return DynamicDataManager(self, **kwargs)


class VanillaDataManager:
    """(ref: base_datamanager.py:350-536)."""

    dataset_cls = InputDataset

    def __init__(self, config: VanillaDataManagerConfig, test_mode: str = "val", seed=None):
        self.config = config
        self.test_mode = test_mode
        self.eval_split = "test" if test_mode in ("test", "inference") else "val"
        assert config.dataparser is not None
        self.dataparser = config.dataparser.setup()

        self.train_dataparser_outputs = self.dataparser.get_dataparser_outputs("train")
        self.train_dataset = self._make_dataset(self.train_dataparser_outputs, eval=False)
        self.eval_dataparser_outputs = self.dataparser.get_dataparser_outputs(self.eval_split)
        self.eval_dataset = self._make_dataset(self.eval_dataparser_outputs, eval=True)

        self.train_cache = ImageBatchCache(
            self.train_dataset,
            config.train_num_images_to_sample_from,
            config.train_num_times_to_repeat_images,
        )
        self.eval_cache = ImageBatchCache(
            self.eval_dataset,
            config.eval_num_images_to_sample_from,
            config.eval_num_times_to_repeat_images,
        )
        self.train_pixel_sampler = self._make_pixel_sampler(
            self.train_dataset, config.train_num_rays_per_batch, seed
        )
        self.eval_pixel_sampler = self._make_pixel_sampler(
            self.eval_dataset, config.eval_num_rays_per_batch, seed
        )

    # -- construction hooks -------------------------------------------------
    def _make_dataset(self, outputs, eval: bool) -> InputDataset:
        return self.dataset_cls(outputs, self.config.camera_res_scale_factor)

    def _make_pixel_sampler(self, dataset, num_rays, seed) -> PixelSampler:
        cam_types = np.asarray(dataset.cameras.camera_type)
        if np.all(cam_types == 3):  # all equirectangular
            return EquirectangularPixelSampler(num_rays, seed=seed)
        return PixelSampler(num_rays, seed=seed)

    # -- train/eval iteration ----------------------------------------------
    @property
    def train_cameras(self):
        return self.train_dataparser_outputs.cameras

    @property
    def eval_cameras(self):
        return self.eval_dataparser_outputs.cameras

    def next_train_raw(self, step: int) -> Dict:
        """Host-side pixel batch: fixed-shape numpy arrays for the jitted
        step.  Keys: indices [N,3] (camera,row,col), image [N,3],
        optionally depth_image [N]."""
        image_batch = self.train_cache.next_batch()
        return self.train_pixel_sampler.sample(image_batch)

    def next_eval_raw(self, step: int) -> Dict:
        image_batch = self.eval_cache.next_batch()
        return self.eval_pixel_sampler.sample(image_batch)

    def rays_for(self, batch: Dict, cameras, camera_opt_to_camera=None) -> RayBundle:
        """Pixel batch -> RayBundle (the reference's RayGenerator,
        ref: model_components/ray_generators.py:26-56)."""
        indices = batch["indices"]
        coords = jnp.asarray(indices[:, 1:].astype(np.float32)) + 0.5
        cam_idx = jnp.asarray(indices[:, 0].astype(np.int32))
        return generate_rays(cameras, cam_idx, coords, camera_opt_to_camera)

    def next_train(self, step: int) -> Tuple[RayBundle, Dict]:
        """(ref: base_datamanager.py:486-495)."""
        batch = self.next_train_raw(step)
        return self.rays_for(batch, self.train_cameras), batch

    def next_eval(self, step: int) -> Tuple[RayBundle, Dict]:
        batch = self.next_eval_raw(step)
        return self.rays_for(batch, self.eval_cameras), batch

    def next_eval_image(self, idx: int) -> Tuple[int, RayBundle, Dict]:
        """Full-image eval bundle (ref: base_datamanager.py:505-511 +
        dataloaders.py:284-347 FixedIndicesEvalDataloader)."""
        idx = int(idx % len(self.eval_dataset))
        ray_bundle = generate_image_rays(self.eval_cameras, idx)
        data = self.eval_dataset[idx]
        batch = {"image": data["image"], "image_idx": idx}
        if "depth_image" in data:
            batch["depth_image"] = data["depth_image"]
        return idx, ray_bundle, batch

    def get_train_rays_per_batch(self) -> int:
        return self.config.train_num_rays_per_batch

    def get_eval_rays_per_batch(self) -> int:
        return self.config.eval_num_rays_per_batch


class DynamicDataManager(VanillaDataManager):
    """Swaps in DynamicDataset + DynamicBasedPixelSampler
    (ref: dynamic_datamanager.py:62-114)."""

    dataset_cls = DynamicDataset

    def _is_config(self) -> ImportanceSamplingConfig:
        c = self.config
        return ImportanceSamplingConfig(
            use_importance_sampling=c.use_importance_sampling,
            is_pixel_ratio=c.is_pixel_ratio,
            ist_range=c.ist_range,
            iters_to_start_is=c.iters_to_start_is,
            isg=c.isg,
            isg_gamma=c.isg_gamma,
            pick_mode=c.pick_mode,
        )

    def _make_dataset(self, outputs, eval: bool) -> DynamicDataset:
        return DynamicDataset(
            outputs,
            self.config.camera_res_scale_factor,
            is_config=self._is_config(),
            eval_dataset=eval,
        )

    def _make_pixel_sampler(self, dataset, num_rays, seed) -> PixelSampler:
        if self.config.use_importance_sampling:
            return DynamicBasedPixelSampler(
                num_rays,
                is_pixel_ratio=self.config.is_pixel_ratio,
                iters_to_start_is=self.config.iters_to_start_is,
                seed=seed,
            )
        return super()._make_pixel_sampler(dataset, num_rays, seed)


@dataclass
class SemanticDataManagerConfig(VanillaDataManagerConfig):
    """(ref: data/datamanagers/semantic_datamanager.py)."""

    def setup(self, **kwargs) -> "SemanticDataManager":
        return SemanticDataManager(self, **kwargs)


class SemanticDataManager(VanillaDataManager):
    """Swaps in SemanticDataset for pixel-wise semantic labels."""

    def _make_dataset(self, outputs, eval: bool):
        from soccernerfs_tpu.data.datasets import SemanticDataset

        return SemanticDataset(outputs, self.config.camera_res_scale_factor)
