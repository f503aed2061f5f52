"""Visualize trained K-Planes feature planes (ref: scripts/plot_kplane.py).

Loads a checkpoint, projects each plane's features to 1D (L2 norm over
the feature axis) and writes turbo-colormapped PNGs per scale/plane.

    python scripts/plot_kplane.py --load-config <run>/config.yml --out planes/
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from soccernerfs_tpu.utils.colormaps import apply_colormap

PLANE_NAMES_4D = ["XY", "XZ", "XT", "YZ", "YT", "ZT"]
PLANE_NAMES_3D = ["XY", "XZ", "YZ"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--load-config", type=Path, required=True)
    p.add_argument("--out", type=Path, default=Path("planes"))
    args = p.parse_args()

    from PIL import Image

    from soccernerfs_tpu.utils.eval_utils import eval_setup

    _, trainer, step = eval_setup(args.load_config, "inference")
    import jax

    params = jax.device_get(trainer.state.params)
    grids = params["fields"]["grids"]
    args.out.mkdir(parents=True, exist_ok=True)
    for scale_idx, planes in enumerate(grids):
        names = PLANE_NAMES_4D if len(planes) == 6 else PLANE_NAMES_3D
        for plane, name in zip(planes, names):
            mag = np.linalg.norm(np.asarray(plane), axis=-1)
            mag = (mag - mag.min()) / max(mag.max() - mag.min(), 1e-9)
            img = apply_colormap(mag)
            Image.fromarray((img * 255).astype(np.uint8)).save(
                args.out / f"scale{scale_idx}_{name}.png"
            )
    print(f"wrote plane visualizations to {args.out} (checkpoint step {step})")


if __name__ == "__main__":
    main()
