"""Offline IST/ISG map precomputation + visualization
(ref: scripts/compute_ist.py, de-hardcoded into a CLI).

    python scripts/compute_ist.py --data <scene-root> --dataparser \
        broadcaststyle-data [--isg] [--ist-range 1.0] [--save-maps]

Computes the importance weights for the train split with the library's
vectorized on-device pass and writes the reference-compatible cache file
next to the images; --save-maps additionally dumps turbo-colormapped
side-by-side previews.
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from soccernerfs_tpu.data import importance
from soccernerfs_tpu.data.dataparsers import DATAPARSERS
from soccernerfs_tpu.data.datasets import DynamicDataset, ImportanceSamplingConfig
from soccernerfs_tpu.utils.colormaps import apply_colormap


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=Path, required=True)
    p.add_argument("--dataparser", default="broadcaststyle-data", choices=sorted(DATAPARSERS))
    p.add_argument("--split", default="train")
    p.add_argument("--isg", action="store_true")
    p.add_argument("--ist-range", type=float, default=1.0)
    p.add_argument("--isg-gamma", type=float, default=5e-2)
    p.add_argument("--save-maps", action="store_true")
    args = p.parse_args()

    cfg = DATAPARSERS[args.dataparser](data=args.data)
    outputs = cfg.setup().get_dataparser_outputs(args.split)
    ds = DynamicDataset(
        outputs,
        is_config=ImportanceSamplingConfig(
            isg=args.isg, ist_range=args.ist_range, isg_gamma=args.isg_gamma
        ),
    )
    print(f"loading {len(ds)} images...")
    batch = {
        "image_idx": np.arange(len(ds)),
        "image": np.stack([ds.get_image(i) for i in range(len(ds))]),
    }
    if args.isg:
        w = importance.compute_isg(ds, batch, args.isg_gamma, args.split, offline=True)
    else:
        w = importance.compute_ist(ds, batch, args.ist_range, args.split, offline=True)
    print(f"weights: {w.shape} {w.dtype}, nonzero frac {float((w > 0).mean()):.3f}")

    if args.save_maps:
        from PIL import Image

        kind = "isg" if args.isg else "ist"
        folder = ds.image_filenames[0].absolute().parent.parent / f"{kind}_maps_offline"
        folder.mkdir(exist_ok=True, parents=True)
        for i in range(len(ds)):
            colored = apply_colormap(np.asarray(w[i], np.float32))
            side = np.concatenate([batch["image"][i], colored], axis=1)
            Image.fromarray((side * 255).astype(np.uint8)).save(
                folder / ds.image_filenames[i].name
            )
        print(f"maps written to {folder}")


if __name__ == "__main__":
    main()
