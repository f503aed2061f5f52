"""Duplicate single static images across all time steps
(ref: scripts/dupe_static_images.py) — used to build *_empty static
datasets that still expose a full time axis.

    python scripts/dupe_static_images.py --dir data/scene_empty/images/2x --steps 100
"""
import argparse
import shutil
from pathlib import Path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", type=Path, required=True)
    p.add_argument("--steps", type=int, default=100)
    args = p.parse_args()

    sources = sorted(
        x for x in args.dir.iterdir() if x.suffix == ".png" and x.stem.endswith("_000")
    )
    for src in sources:
        base = src.stem.rsplit("_", 1)[0]
        for t in range(1, args.steps):
            shutil.copy(src, args.dir / f"{base}_{t:03d}.png")
    print(f"duplicated {len(sources)} cameras x {args.steps} steps")


if __name__ == "__main__":
    main()
