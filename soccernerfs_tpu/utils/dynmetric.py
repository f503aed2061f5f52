"""DynMetric — detection-gated PSNR/SSIM/LPIPS around players and the ball
(ref: utils/dynmetric.py:29-187).

The reference hard-depends on torchvision RetinaNet.  Here the detector is
a pluggable backend:
  1. torchvision RetinaNet (person=1, ball=37, score>0.6) when installed;
  2. a sidecar boxes file (``SNT_DYNMETRIC_BOXES`` env var, JSON mapping
     image names to [x1, y1, x2, y2] lists) for offline-detected scenes;
  3. otherwise NaN metrics — exactly the reference's no-detection path
     (ref: dynmetric.py:79-80).

Box handling mirrors the reference: keep the person box closest to the
image center, rescale boxes by (w_factor=7, h_factor=2.5), compute
per-box metrics, box-size-weighted average, LPIPS only for boxes >= 32px,
sub-1e-4 values mapped to NaN.
"""
from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple

import numpy as np

from soccernerfs_tpu.utils import metrics as M


def rescale_bbox(bbox, w_factor, h_factor, img_width, img_height):
    """Grow a box around its center, clamped to the image
    (ref: dynmetric.py:160-187)."""
    x1, y1, x2, y2 = bbox
    width, height = x2 - x1, y2 - y1
    new_width = int(width * w_factor)
    new_height = int(height * h_factor)
    x1 = max(0, x1 - (new_width - width) / 2)
    x2 = x1 + new_width
    y1 = max(0, y1 - (new_height - height) / 2)
    y2 = y1 + new_height
    if x2 > img_width:
        x1 -= x2 - img_width
        x2 = img_width
    if y2 > img_height:
        y1 -= y2 - img_height
        y2 = img_height
    return x1, y1, x2, y2


def _detect_torchvision(image: np.ndarray):
    try:
        import torch
        import torchvision
    except Exception:
        return None
    try:
        model = torchvision.models.detection.retinanet_resnet50_fpn_v2(
            weights=torchvision.models.detection.RetinaNet_ResNet50_FPN_V2_Weights.DEFAULT
        ).eval()
    except Exception:
        return None
    with torch.no_grad():
        t = torch.from_numpy(np.ascontiguousarray(image)).permute(2, 0, 1)[None]
        res = model(t)[0]
    keep = ((res["labels"] == 1) | (res["labels"] == 37)) & (res["scores"] > 0.6)
    return (
        res["boxes"][keep].numpy().tolist(),
        res["labels"][keep].numpy().tolist(),
    )


def _detect_sidecar(image_name: Optional[str]):
    path = os.environ.get("SNT_DYNMETRIC_BOXES", "")
    if not path or not os.path.exists(path) or image_name is None:
        return None
    table = json.loads(open(path).read())
    entry = table.get(image_name)
    if entry is None:
        return None
    boxes = [e["box"] for e in entry]
    labels = [e.get("label", 1) for e in entry]
    return boxes, labels


class DynMetric:
    """(ref: dynmetric.py:29-157)."""

    def __init__(self, w_factor: float = 7, h_factor: float = 2.5):
        self.w_factor = w_factor
        self.h_factor = h_factor

    def __call__(
        self,
        true_image: np.ndarray,
        pred_image: np.ndarray,
        image_name: Optional[str] = None,
    ) -> Tuple[np.ndarray, float, float, float]:
        """Args: [H, W, 3] images in [0, 1].
        Returns (annotated image, dpsnr, dssim, dlpips)."""
        H, W = true_image.shape[:2]
        det = _detect_sidecar(image_name) or _detect_torchvision(true_image)
        if det is None or len(det[0]) == 0:
            return true_image, float("nan"), float("nan"), float("nan")
        raw_boxes, labels = det

        person_boxes = [b for b, l in zip(raw_boxes, labels) if l == 1]
        ball_boxes = [b for b, l in zip(raw_boxes, labels) if l != 1]
        if len(person_boxes) > 1:
            person_boxes = [
                min(
                    person_boxes,
                    key=lambda b: ((b[0] + b[2]) / 2 - W / 2) ** 2
                    + ((b[1] + b[3]) / 2 - H / 2) ** 2,
                )
            ]
        boxes = [
            rescale_bbox(b, self.w_factor, self.h_factor, W, H)
            for b in person_boxes + ball_boxes
        ]

        box_sizes, lpips_sizes = [], []
        psnrs, ssims, lpipss = [], [], []
        for x1, y1, x2, y2 in boxes:
            x1, y1, x2, y2 = int(x1), int(y1), int(x2), int(y2)
            size = (x2 - x1) * (y2 - y1)
            if size <= 0:
                continue
            t = true_image[y1:y2, x1:x2]
            p = pred_image[y1:y2, x1:x2]
            psnrs.append(float(M.psnr(t, p)))
            ssims.append(float(M.ssim(t, p)))
            box_sizes.append(size)
            if min(x2 - x1, y2 - y1) >= 32:
                lp = M.lpips(t, p)
                if not np.isnan(lp):
                    lpipss.append(lp)
                    lpips_sizes.append(size)

        annotated = _draw_boxes(true_image, boxes)
        if not box_sizes:
            return annotated, float("nan"), float("nan"), float("nan")
        dpsnr = float(np.average(psnrs, weights=box_sizes))
        dssim = float(np.average(ssims, weights=box_sizes))
        dlpips = float(np.average(lpipss, weights=lpips_sizes)) if lpipss else 0.0
        if dpsnr < 1e-4:
            dpsnr = float("nan")
        if dssim < 1e-4:
            dssim = float("nan")
        if dlpips < 1e-4:
            dlpips = float("nan")
        return annotated, dpsnr, dssim, dlpips


def _draw_boxes(image: np.ndarray, boxes: List, width: int = 2) -> np.ndarray:
    out = np.array(image, copy=True)
    H, W = out.shape[:2]
    for x1, y1, x2, y2 in boxes:
        x1, y1 = max(0, int(x1)), max(0, int(y1))
        x2, y2 = min(W - 1, int(x2)), min(H - 1, int(y2))
        out[y1 : y1 + width, x1:x2] = 0.0
        out[max(0, y2 - width) : y2, x1:x2] = 0.0
        out[y1:y2, x1 : x1 + width] = 0.0
        out[y1:y2, max(0, x2 - width) : x2] = 0.0
    return out
