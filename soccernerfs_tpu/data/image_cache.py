"""In-RAM image batch cache with resampling (ref: data/utils/dataloaders.py).

The reference's CacheDataloader holds N decoded images, re-samples the set
every ``num_times_to_repeat_images`` iterations with a pick mode
(normal / randsteps / lowfps), thread-pools the image decode, and attaches
IST weights + the running iteration count (dataloaders.py:43-240).  Same
behavior here, host-side numpy, feeding the fixed-shape pixel samplers.
"""
from __future__ import annotations

import concurrent.futures
import multiprocessing
import random
from math import ceil
from typing import Dict, List, Optional

import numpy as np

from soccernerfs_tpu.data.datasets import DynamicDataset, InputDataset


class ImageBatchCache:
    """(ref: dataloaders.py:43-240)."""

    def __init__(
        self,
        dataset: InputDataset,
        num_images_to_sample_from: int = -1,
        num_times_to_repeat_images: int = -1,
        num_workers: int = 4,
    ):
        self.dataset = dataset
        self.cache_all = (
            num_images_to_sample_from == -1
            or num_images_to_sample_from >= len(dataset)
        )
        self.num_images_to_sample_from = (
            len(dataset) if self.cache_all else num_images_to_sample_from
        )
        self.num_times_to_repeat_images = num_times_to_repeat_images
        self.num_workers = num_workers

        self.num_repeated = num_times_to_repeat_images
        self.first_time = True
        self.iter_step = 0
        self.cached_batch: Optional[Dict] = None

        if self.cache_all:
            self.cached_batch = self._collate()
            if self._is_dynamic_with_is():
                self.cached_batch["ist_weights"] = self.dataset.compute_is(
                    self.cached_batch, offline=True
                )

    def _is_dynamic_with_is(self) -> bool:
        return (
            isinstance(self.dataset, DynamicDataset)
            and self.dataset.is_config.use_importance_sampling
        )

    def _pick_indices(self) -> List[int]:
        """normal / randsteps / lowfps image-set selection
        (ref: dataloaders.py:105-179)."""
        total = len(self.dataset)
        to_sample = self.num_images_to_sample_from
        pick_mode = "normal"
        if isinstance(self.dataset, DynamicDataset):
            pick_mode = self.dataset.is_config.pick_mode
        if total == to_sample:
            pick_mode = "normal"

        if pick_mode == "normal":
            return random.sample(range(total), k=to_sample)

        times_arr = np.asarray(self.dataset.cameras.times)
        times = sorted(set(times_arr.tolist()))
        if pick_mode == "randsteps":
            ids = self.dataset.cameras.ids
            nb_unique_cams = (
                1 if ids is None else len(set(np.asarray(ids).tolist()))
            )
            steps_to_pick = int(to_sample / nb_unique_cams)
            picked = [times[0], times[-1]]
            if steps_to_pick > 2:
                picked += random.sample(times[1:-1], k=steps_to_pick - 2)
        elif pick_mode == "lowfps":
            k = ceil(total / to_sample)
            picked = times[::k]
            if len(times) % k != 0:
                picked = picked[:-1]
        else:
            raise ValueError(f"unknown pick_mode {pick_mode}")

        picked_set = set(picked)
        indices = [i for i in range(total) if float(times_arr[i]) in picked_set]
        left = to_sample - len(indices)
        if left > 0:
            pool = [i for i in range(total) if i not in set(indices)]
            indices += random.sample(pool, k=left)
        elif left < 0:
            indices = indices[:to_sample]
        if len(indices) != to_sample:
            raise RuntimeError("not enough images to sample from")
        return indices

    def _collate(self) -> Dict:
        """Image decode + stack.

        Fast path: the native multithreaded libpng/libjpeg decoder
        (native/snt_loader.cpp) when all selected images share one
        resolution and no rescale is requested; otherwise the Python
        thread-pooled decode mirroring the reference
        (ref: dataloaders.py:186-239).
        """
        indices = (
            list(range(len(self.dataset))) if self.cache_all else self._pick_indices()
        )
        images = self._native_decode(indices)
        if images is not None:
            batch: Dict = {
                "image_idx": np.asarray(indices, np.int64),
                "image": images,
            }
            extra = self._collate_metadata(indices)
            batch.update(extra)
            return batch

        workers = max(1, min(self.num_workers * 4, multiprocessing.cpu_count() - 1))
        with concurrent.futures.ThreadPoolExecutor(max_workers=workers) as ex:
            items = list(ex.map(self.dataset.__getitem__, indices))

        batch = {
            "image_idx": np.asarray([it["image_idx"] for it in items], np.int64),
            "image": np.stack([it["image"] for it in items]),
        }
        if "mask" in items[0]:
            batch["mask"] = np.stack([it["mask"] for it in items])
        if "depth_image" in items[0]:
            batch["depth_image"] = np.stack([it["depth_image"] for it in items])
        return batch

    def _native_decode(self, indices) -> "np.ndarray | None":
        from soccernerfs_tpu.data import native_loader

        if self.dataset.scale_factor != 1.0 or not native_loader.available():
            return None
        heights = np.asarray(self.dataset.cameras.height)[indices]
        widths = np.asarray(self.dataset.cameras.width)[indices]
        if len(set(heights.tolist())) != 1 or len(set(widths.tolist())) != 1:
            return None
        paths = [self.dataset.image_filenames[i] for i in indices]
        return native_loader.decode_batch(
            paths, int(heights[0]), int(widths[0]), self.dataset.alpha_color
        )

    def _collate_metadata(self, indices) -> Dict:
        """Masks/depths for the native-decode path (still Python IO)."""
        out: Dict = {}
        first = self.dataset[indices[0]]
        if "mask" in first or "depth_image" in first:
            items = [self.dataset[i] for i in indices]
            if "mask" in first:
                out["mask"] = np.stack([it["mask"] for it in items])
            if "depth_image" in first:
                out["depth_image"] = np.stack([it["depth_image"] for it in items])
        return out

    def next_batch(self) -> Dict:
        """(ref: dataloaders.py:208-240 __iter__)."""
        if self.cache_all:
            batch = self.cached_batch
        elif self.first_time or (
            self.num_times_to_repeat_images != -1
            and self.num_repeated >= self.num_times_to_repeat_images
        ):
            self.num_repeated = 0
            batch = self._collate()
            if self._is_dynamic_with_is():
                iters_to_start = self.dataset.is_config.iters_to_start_is
                if self.iter_step + self.num_times_to_repeat_images >= iters_to_start:
                    batch["ist_weights"] = self.dataset.compute_is(batch)
            self.cached_batch = (
                batch if self.num_times_to_repeat_images != 0 else None
            )
            self.first_time = False
        else:
            batch = self.cached_batch
            self.num_repeated += 1
        self.iter_step += 1
        assert batch is not None
        batch["iter_steps"] = self.iter_step
        return batch
