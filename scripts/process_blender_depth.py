"""Convert Blender EXR/16-bit depth renders to the dataparser's depth-map
format (ref: scripts/process_blender_depth.py): scales raw depth values,
masks infinity, writes 32-bit integer PNGs matching
depth_unit_scale_factor conventions.

    python scripts/process_blender_depth.py --dir data/scene/depth-raw \
        --out data/scene/depth-maps --scale 100 --max-depth 1000
"""
import argparse
from pathlib import Path

import numpy as np
from PIL import Image


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", type=Path, required=True)
    p.add_argument("--out", type=Path, required=True)
    p.add_argument("--scale", type=float, default=100.0, help="meters -> stored units")
    p.add_argument("--max-depth", type=float, default=1000.0, help="clip; beyond = 0 (invalid)")
    args = p.parse_args()

    args.out.mkdir(parents=True, exist_ok=True)
    n = 0
    for f in sorted(args.dir.iterdir()):
        if f.suffix.lower() not in (".png", ".tif", ".tiff", ".npy"):
            continue
        if f.suffix == ".npy":
            depth = np.load(f).astype(np.float64)
        else:
            depth = np.asarray(Image.open(f)).astype(np.float64)
        depth = np.where(depth >= args.max_depth, 0.0, depth)
        out = (depth * args.scale).astype(np.int32)
        Image.fromarray(out, mode="I").save(args.out / (f.stem + ".png"))
        n += 1
    print(f"processed {n} depth maps -> {args.out}")


if __name__ == "__main__":
    main()
