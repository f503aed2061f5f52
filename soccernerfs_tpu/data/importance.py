"""Importance-sampling weight computation (IST / ISG / static ISS).

TPU-native re-design of the fork's per-image Python loops
(ref: data/datasets/dynamic_dataset.py:112-470): the image stack is
processed per physical camera as one vectorized max-|diff| / ψ-diff pass
on the accelerator, with the same thresholds, fallbacks, caching
filenames, and float16 output dtype as the reference.

Caches are .npy sidecars next to the images, mirroring the reference's
``ist-weights-{range}-{split}-{N}-{H}p.pt`` naming
(ref: dynamic_dataset.py:358-380) with a .npy extension.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

IST_ALPHA = 0.15  # parasite-motion threshold (ref: dynamic_dataset.py:413-417)


def _cache_path(dataset, file_name: str) -> Path:
    return dataset.image_filenames[0].absolute().parent / file_name


def _try_load_cache(path: Path, expected_batch: int) -> Optional[np.ndarray]:
    if path.exists():
        weights = np.load(path)
        if weights.shape[0] == expected_batch:
            return weights
    return None


@jax.jit
def _ist_kernel(images: jnp.ndarray, close_mask: jnp.ndarray) -> jnp.ndarray:
    """Per-camera IST: for each frame, max |diff| against its close frames.

    Args:
        images: [T, H, W, 3] one camera's frames.
        close_mask: [T, T] bool — close_mask[i, j] iff frame j is within
            (0.01, ist_range] of frame i in normalized time.
    Returns:
        [T, H, W] weights: mean-over-channels of the max diff, zeroed below
        IST_ALPHA; uniform 1s when a frame has no close frames
        (ref: dynamic_dataset.py:419-448).
    """

    def per_frame(args):
        img, mask_row = args
        diffs = jnp.abs(images - img[None])  # [T, H, W, 3]
        masked = jnp.where(mask_row[:, None, None, None], diffs, 0.0)
        max_diff = jnp.max(masked, axis=0).mean(axis=-1)  # [H, W]
        max_diff = jnp.where(max_diff > IST_ALPHA, max_diff, 0.0)
        has_close = jnp.any(mask_row)
        return jnp.where(has_close, max_diff, jnp.ones_like(max_diff))

    return jax.lax.map(per_frame, (images, close_mask))


def _cam_ids(cameras, img_idx: np.ndarray) -> np.ndarray:
    """Per-frame physical-camera ids for the IS grouping; datasets
    without multi-camera metadata (e.g. d-nerf) are one camera."""
    if cameras.ids is None:
        return np.zeros(img_idx.shape, dtype=np.int32)
    return np.asarray(cameras.ids)[img_idx]


def compute_ist(
    dataset, batch: Dict, ist_range: float, split: str, offline: bool = False
) -> Optional[np.ndarray]:
    """IST weights for a cached image batch (ref: dynamic_dataset.py:328-470).

    Args:
        batch: {"image": [B, H, W, 3] float32, "image_idx": [B] int}.
    Returns:
        [B, H, W] float16 weights, or None for time-less cameras.
    """
    cameras = dataset.cameras
    if cameras.times is None:
        return None

    images = np.asarray(batch["image"])
    B, H, W = images.shape[:3]
    rng_str = str(ist_range).replace(".", "_")
    file_name = f"ist-weights-{rng_str}-{split}-{B}-{H}p.npy"
    cache = _cache_path(dataset, file_name)
    if offline:
        cached = _try_load_cache(cache, B)
        if cached is not None:
            return cached

    img_idx = np.asarray(batch["image_idx"])
    cam_times = np.asarray(cameras.times)[img_idx]  # [B]
    cam_ids = _cam_ids(cameras, img_idx)  # [B]

    out = np.zeros((B, H, W), dtype=np.float16)
    for cam in np.unique(cam_ids):
        sel = np.nonzero(cam_ids == cam)[0]
        t = cam_times[sel]
        dt = np.abs(t[:, None] - t[None, :])
        close = (dt <= ist_range) & (dt > 0.01)
        w = _ist_kernel(
            jnp.asarray(images[sel]), jnp.asarray(close)
        )
        out[sel] = np.asarray(w, dtype=np.float16)

    if offline:
        np.save(cache, out)
    return out


@jax.jit
def _isg_kernel(images: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """Per-camera ISG: ψ-squared-diff against the per-pixel temporal median
    (ref: dynamic_dataset.py:283-303)."""
    median = jnp.median(images, axis=0)  # [H, W, 3]
    sq = jnp.square(images - median[None])
    psi = sq / (sq + gamma**2)
    return jnp.sum(psi, axis=-1) / 3.0  # [T, H, W]


def compute_isg(
    dataset, batch: Dict, gamma: float, split: str, offline: bool = False
) -> Optional[np.ndarray]:
    """ISG weights (ref: dynamic_dataset.py:215-326)."""
    cameras = dataset.cameras
    if cameras.times is None:
        return None

    images = np.asarray(batch["image"])
    B, H, W = images.shape[:3]
    file_name = f"isg-weights-{gamma}-{split}-{B}-{H}p.npy"
    cache = _cache_path(dataset, file_name)
    if offline:
        cached = _try_load_cache(cache, B)
        if cached is not None:
            return cached

    img_idx = np.asarray(batch["image_idx"])
    cam_ids = _cam_ids(cameras, img_idx)

    out = np.zeros((B, H, W), dtype=np.float16)
    for cam in np.unique(cam_ids):
        sel = np.nonzero(cam_ids == cam)[0]
        w = _isg_kernel(jnp.asarray(images[sel]), gamma)
        out[sel] = np.asarray(w, dtype=np.float16)

    if offline:
        np.save(cache, out)
    return out


def compute_iss(
    dataset, batch: Dict, split: str, offline: bool = False
) -> Optional[np.ndarray]:
    """Static-scene ISS: object-detection boxes -> binary weight maps
    (ref: dynamic_dataset.py:112-213).

    Uses torchvision RetinaNet (CPU) when available; person (label 1) and
    sports-ball (label 37) detections with score > 0.6 fill their boxes
    with 1.  Falls back to uniform weights when torchvision is missing.
    The reference forgets to return the computed weights online
    (dynamic_dataset.py:169-213 returns None); fixed here.
    """
    images = np.asarray(batch["image"])
    B, H, W = images.shape[:3]
    file_name = f"iss-weights-{split}-{B}-{H}p.npy"
    cache = _cache_path(dataset, file_name)
    if offline:
        cached = _try_load_cache(cache, B)
        if cached is not None:
            return cached

    boxes_per_image = detect_players_and_ball(images)
    out = np.zeros((B, H, W), dtype=np.float16)
    for i, boxes in enumerate(boxes_per_image):
        if boxes is None:
            out[i] = 1.0
            continue
        for (x1, y1, x2, y2) in boxes:
            out[i, int(y1) : int(y2), int(x1) : int(x2)] = 1.0

    if offline:
        np.save(cache, out)
    return out


def detect_players_and_ball(images: np.ndarray):
    """RetinaNet person/ball detection (ref: dynamic_dataset.py:155-197 and
    utils/dynmetric.py:29-90).  Returns a list of [K, 4] box arrays
    (x1, y1, x2, y2) or None per image when detection is unavailable."""
    try:
        import torch
        import torchvision
    except Exception:
        return [None] * images.shape[0]
    try:
        model = torchvision.models.detection.retinanet_resnet50_fpn_v2(
            weights=torchvision.models.detection.RetinaNet_ResNet50_FPN_V2_Weights.DEFAULT
        ).eval()
    except Exception:
        return [None] * images.shape[0]

    results = []
    with torch.no_grad():
        for img in images:
            t = torch.from_numpy(np.ascontiguousarray(img)).permute(2, 0, 1)[None]
            res = model(t)[0]
            keep = ((res["labels"] == 1) | (res["labels"] == 37)) & (res["scores"] > 0.6)
            results.append(res["boxes"][keep].numpy())
    return results
