"""Blender-side exporter: renders all cameras and writes transforms.json
(ref: data/blender-export.py).  Run INSIDE Blender:

    blender scene.blend --background --python data/blender-export.py -- \
        --out /path/to/dataset --frames 100 --downscale 2

Writes images/{k}x/<Camera>_{step:03d}.png and a per-camera
transforms.json consumable by gen_per_frame_transforms.py.
"""
import json
import math
import sys
from pathlib import Path

try:
    import bpy  # type: ignore
except ImportError:  # pragma: no cover - only runs inside Blender
    sys.exit("this script must be run inside Blender (bpy not found)")


def parse_args():
    argv = sys.argv[sys.argv.index("--") + 1 :] if "--" in sys.argv else []
    out = Path("./export")
    frames = 100
    downscale = 2
    it = iter(argv)
    for a in it:
        if a == "--out":
            out = Path(next(it))
        elif a == "--frames":
            frames = int(next(it))
        elif a == "--downscale":
            downscale = int(next(it))
    return out, frames, downscale


def main():
    out, num_frames, downscale = parse_args()
    scene = bpy.context.scene
    cameras = [o for o in scene.objects if o.type == "CAMERA"]
    img_dir = out / "images" / f"{downscale}x"
    img_dir.mkdir(parents=True, exist_ok=True)

    scene.render.resolution_percentage = 100 // downscale
    frames_meta = []
    for cam in cameras:
        scene.camera = cam
        focal_px = (
            cam.data.lens / cam.data.sensor_width * scene.render.resolution_x
        )
        frames_meta.append(
            {
                "file_path": f"{cam.name}.png",
                "fl_x": focal_px,
                "fl_y": focal_px,
                "cx": scene.render.resolution_x / 2,
                "cy": scene.render.resolution_y / 2,
                "w": scene.render.resolution_x,
                "h": scene.render.resolution_y,
                "transform_matrix": [list(r) for r in cam.matrix_world],
            }
        )
        for t in range(num_frames):
            scene.frame_set(scene.frame_start + t)
            scene.render.filepath = str(img_dir / f"{cam.name}_{t:03d}.png")
            bpy.ops.render.render(write_still=True)

    with open(out / "per_cam_transforms.json", "w") as f:
        json.dump({"camera_model": "OPENCV", "frames": frames_meta}, f, indent=4)
    print(f"exported {len(cameras)} cameras x {num_frames} frames to {out}")


if __name__ == "__main__":
    main()
