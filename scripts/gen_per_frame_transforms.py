"""Per-camera transforms -> per-frame transforms.json
(ref: scripts/gen_per_frame_transforms.py).

The Blender exporter writes one entry per camera; the dataparsers need
one per frame file.  Matches frames to cameras by the ``Name_step.ext``
filename convention.

    python scripts/gen_per_frame_transforms.py --data data/scene \
        [--images-subdir images/2x] [--include-depth]
"""
import argparse
import json
from pathlib import Path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=Path, required=True)
    p.add_argument("--images-subdir", default="images/2x")
    p.add_argument("--include-depth", action="store_true")
    args = p.parse_args()

    with open(args.data / "per_cam_transforms.json", encoding="utf-8") as f:
        per_cam = json.load(f)
    cam_transforms = {
        d["file_path"].split(".")[0]: d for d in per_cam["frames"]
    }

    frames = []
    img_dir = args.data / args.images_subdir
    for fname in sorted(x.name for x in img_dir.iterdir() if x.suffix == ".png"):
        cam_name = fname.rsplit("_", 1)[0]
        frame = dict(cam_transforms[cam_name])
        frame["file_path"] = "images/" + fname
        if args.include_depth:
            frame["depth_file_path"] = "depth-maps/" + fname.replace(".png", "-depth.png")
        frames.append(frame)

    meta = {k: v for k, v in per_cam.items() if k != "frames"}
    meta["frames"] = frames
    with open(args.data / "transforms.json", "w", encoding="utf-8") as f:
        json.dump(meta, f, indent=4)
    print(f"wrote {len(frames)} frames to {args.data / 'transforms.json'}")


if __name__ == "__main__":
    main()
