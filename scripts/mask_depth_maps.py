"""Mask depth maps around detected players/ball
(ref: scripts/mask_depth_maps.py, SAM + RetinaNet there).

Produces the ``depth-maps-{od,od_below,mask,...}`` variants the soccer
dataparsers select via --depth-mask.  Detection uses the same pluggable
backend as DynMetric (torchvision RetinaNet or a sidecar boxes JSON via
SNT_DYNMETRIC_BOXES); without either, it degrades to pass-through copies.

    python scripts/mask_depth_maps.py --images data/scene/images/2x \
        --depths data/scene/depth-maps/2x --out data/scene/depth-maps-od/2x \
        [--mode od|od_below]
"""
import argparse
from pathlib import Path

import numpy as np
from PIL import Image


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=Path, required=True)
    p.add_argument("--depths", type=Path, required=True)
    p.add_argument("--out", type=Path, required=True)
    p.add_argument("--mode", default="od", choices=["od", "od_below"])
    args = p.parse_args()

    from soccernerfs_tpu.utils.dynmetric import _detect_sidecar, _detect_torchvision

    args.out.mkdir(parents=True, exist_ok=True)
    for img_path in sorted(args.images.iterdir()):
        depth_path = args.depths / img_path.name
        if not depth_path.exists():
            continue
        depth = np.asarray(Image.open(depth_path)).astype(np.int32)
        image = np.asarray(Image.open(img_path)).astype(np.float32) / 255.0
        det = _detect_sidecar(img_path.name) or _detect_torchvision(image[..., :3])
        if det is not None:
            boxes, _ = det
            mask = np.zeros(depth.shape[:2], bool)
            for x1, y1, x2, y2 in boxes:
                y2b = depth.shape[0] if args.mode == "od_below" else int(y2)
                mask[int(y1):y2b, int(x1):int(x2)] = True
            depth = np.where(mask, 0, depth)  # zero = unsupervised
        Image.fromarray(depth, mode="I").save(args.out / img_path.name)
    print(f"wrote masked depth maps to {args.out}")


if __name__ == "__main__":
    main()
