"""Zero-pad the time-step suffix of frame filenames
(ref: scripts/apply_zfill_indices.py): Camera_1_3.png -> Camera_1_003.png.

    python scripts/apply_zfill_indices.py --dir data/scene/images/2x --width 3
"""
import argparse
from pathlib import Path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", type=Path, required=True)
    p.add_argument("--width", type=int, default=3)
    args = p.parse_args()

    n = 0
    for f in sorted(args.dir.iterdir()):
        if not f.suffix or "_" not in f.stem:
            continue
        base, step = f.stem.rsplit("_", 1)
        if not step.isdigit() or len(step) >= args.width:
            continue
        f.rename(f.with_name(f"{base}_{step.zfill(args.width)}{f.suffix}"))
        n += 1
    print(f"renamed {n} files")


if __name__ == "__main__":
    main()
