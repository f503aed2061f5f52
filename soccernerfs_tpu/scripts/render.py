"""snt-render — render camera-path videos/images (ref: scripts/render.py).

    python -m soccernerfs_tpu.scripts.render \
        --load-config <run>/config.yml \
        --traj spiral|interpolate|filename \
        [--camera-path-filename camera_path.json] \
        --output-path renders/output.mp4 \
        [--rendered-output-names rgb depth accumulation] \
        [--output-format video|images]

Video writing uses imageio (ffmpeg) with a PNG-frames fallback.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from soccernerfs_tpu.core.camera_paths import (
    get_interpolated_camera_path,
    get_path_from_json,
    get_spiral_path,
)
from soccernerfs_tpu.utils.colormaps import apply_colormap, apply_depth_colormap
from soccernerfs_tpu.utils.eval_utils import eval_setup


def render_trajectory(
    trainer,
    cameras,
    output_names,
    output_path: Path,
    output_format: str = "video",
    fps: int = 24,
):
    """(ref: render.py:47-163 _render_trajectory_video)."""
    frames = []
    for i in range(cameras.num_cameras):
        outputs = trainer.render_camera(cameras, i)
        parts = []
        for name in output_names:
            img = outputs[name]
            if name == "depth":
                img = apply_depth_colormap(img, outputs.get("accumulation"))
            elif img.ndim == 2:
                img = apply_colormap(img)
            parts.append(np.asarray(img))
        frame = np.concatenate(parts, axis=1)
        frames.append((np.clip(frame, 0, 1) * 255).astype(np.uint8))
        print(f"rendered frame {i + 1}/{cameras.num_cameras}", flush=True)

    output_path.parent.mkdir(parents=True, exist_ok=True)
    if output_format == "video":
        try:
            import imageio

            imageio.mimwrite(str(output_path), frames, fps=fps)
            print(f"wrote video {output_path}")
            return
        except Exception as e:
            print(f"video writing failed ({e}); falling back to images")
    stem = output_path.with_suffix("")
    stem.mkdir(parents=True, exist_ok=True)
    from PIL import Image

    for i, f in enumerate(frames):
        Image.fromarray(f).save(stem / f"{i:05d}.png")
    print(f"wrote {len(frames)} frames to {stem}/")


def main(argv=None):
    parser = argparse.ArgumentParser("snt-render")
    parser.add_argument("--load-config", type=Path, required=True)
    parser.add_argument(
        "--traj", choices=["spiral", "interpolate", "filename"], default="spiral"
    )
    parser.add_argument("--camera-path-filename", type=Path, default=None)
    parser.add_argument("--output-path", type=Path, default=Path("renders/output.mp4"))
    parser.add_argument(
        "--rendered-output-names", nargs="+", default=["rgb"],
    )
    parser.add_argument("--output-format", choices=["video", "images"], default="video")
    parser.add_argument("--interpolation-steps", type=int, default=30)
    parser.add_argument("--fps", type=int, default=24)
    parser.add_argument("--downscale-factor", type=int, default=1)
    args = parser.parse_args(argv)

    _, trainer, _ = eval_setup(args.load_config, test_mode="inference")

    if args.traj == "filename":
        assert args.camera_path_filename is not None
        camera_path = json.loads(Path(args.camera_path_filename).read_text())
        cameras = get_path_from_json(camera_path)
        fps = camera_path.get("fps", args.fps)
    elif args.traj == "interpolate":
        cameras = get_interpolated_camera_path(
            trainer.eval_cameras, args.interpolation_steps
        )
        fps = args.fps
    else:
        cameras = get_spiral_path(trainer.eval_cameras, steps=args.interpolation_steps)
        fps = args.fps

    render_trajectory(
        trainer,
        cameras,
        args.rendered_output_names,
        args.output_path,
        args.output_format,
        fps,
    )


if __name__ == "__main__":
    main()
