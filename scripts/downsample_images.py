"""Create {k}x/ downscaled image directories
(ref: scripts/downsample_images.py, PIL instead of ffmpeg shell-outs).

    python scripts/downsample_images.py --dir data/scene/images --factors 2 4
"""
import argparse
from pathlib import Path

from PIL import Image


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", type=Path, required=True, help="directory of full-res images")
    p.add_argument("--factors", type=int, nargs="+", default=[2, 4])
    p.add_argument("--ext", default=".png")
    args = p.parse_args()

    images = sorted(x for x in args.dir.iterdir() if x.suffix.lower() == args.ext)
    for factor in args.factors:
        out_dir = args.dir / f"{factor}x"
        out_dir.mkdir(exist_ok=True)
        for img_path in images:
            with Image.open(img_path) as im:
                im.resize((im.width // factor, im.height // factor), Image.LANCZOS).save(
                    out_dir / img_path.name
                )
        print(f"{factor}x: {len(images)} images -> {out_dir}")


if __name__ == "__main__":
    main()
