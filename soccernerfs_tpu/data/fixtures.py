"""Synthetic on-disk dataset fixtures for tests and smoke training.

Mirrors the reference test strategy of tiny generated datasets
(SURVEY §4; ref: tests/data/lego_test fixture and
tests/dataparsers/test_nerfstudio_dataparser.py's tmp-path transforms).
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np
from PIL import Image


def _look_at_pose(origin, target=(0.0, 0.0, 0.0), up=(0.0, 0.0, 1.0)) -> np.ndarray:
    """OpenGL-style c2w (camera looks down -Z)."""
    origin = np.asarray(origin, np.float64)
    forward = np.asarray(target, np.float64) - origin
    forward /= np.linalg.norm(forward)
    right = np.cross(forward, np.asarray(up, np.float64))
    right /= np.linalg.norm(right)
    true_up = np.cross(right, forward)
    pose = np.eye(4)
    pose[:3, 0] = right
    pose[:3, 1] = true_up
    pose[:3, 2] = -forward
    pose[:3, 3] = origin
    return pose


def _render_ball_scene(h, w, pose, fx, fy, cx, cy, t: float) -> np.ndarray:
    """Analytic render: red ball moving along x over a green floor."""
    ys, xs = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5, indexing="ij")
    dirs_cam = np.stack(
        [(xs - cx) / fx, -(ys - cy) / fy, -np.ones_like(xs)], axis=-1
    )
    R = pose[:3, :3]
    dirs = dirs_cam @ R.T
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origin = pose[:3, 3]

    center = np.array([0.6 * (t - 0.5), 0.0, 0.15])
    oc = origin - center
    b = np.sum(dirs * oc, axis=-1)
    c = np.sum(oc * oc) - 0.15**2
    disc = b * b - c
    hit_sphere = disc > 0
    t_sphere = np.where(hit_sphere, -b - np.sqrt(np.maximum(disc, 0)), np.inf)

    t_floor = np.where(dirs[..., 2] < -1e-6, (0.0 - origin[2]) / dirs[..., 2], np.inf)

    img = np.zeros((h, w, 3), np.float32)
    sphere_first = hit_sphere & (t_sphere < t_floor) & (t_sphere > 0)
    floor_vis = (t_floor < np.inf) & ~sphere_first & (t_floor > 0)
    img[sphere_first] = [0.9, 0.15, 0.1]
    img[floor_vis] = [0.1, 0.7, 0.2]
    return img


def make_broadcaststyle_fixture(
    root: Path,
    num_cameras: int = 4,
    num_steps: int = 4,
    h: int = 24,
    w: int = 32,
    downscale: int = 2,
    with_depth: bool = False,
) -> Path:
    """Write a tiny broadcaststyle-format dataset: ``Camera_{i}_{t:03d}.png``
    under ``images/{k}x/``, plus transforms.json with global intrinsics.

    Returns the dataset root (pass as ``--data``).
    """
    root = Path(root)
    img_dir = root / "images" / f"{downscale}x"
    img_dir.mkdir(parents=True, exist_ok=True)
    if with_depth:
        depth_dir = root / "depth-maps-mask" / f"{downscale}x"
        depth_dir.mkdir(parents=True, exist_ok=True)

    fx = fy = 0.7 * w * downscale
    cx, cy = w * downscale / 2.0, h * downscale / 2.0

    # train cameras Camera_1..{n-1} plus the "all"-setup eval camera Camera_20
    cam_names = [f"Camera_{i + 1}" for i in range(num_cameras - 1)] + ["Camera_20"]
    frames = []
    for ci, cam_name in enumerate(cam_names):
        theta = 2 * np.pi * ci / num_cameras
        origin = [2.2 * np.cos(theta), 2.2 * np.sin(theta), 1.0]
        pose = _look_at_pose(origin)
        for t in range(num_steps):
            name = f"{cam_name}_{t:03d}.png"
            tt = t / max(num_steps - 1, 1)
            img = _render_ball_scene(
                h, w, pose, fx / downscale, fy / downscale, cx / downscale, cy / downscale, tt
            )
            Image.fromarray((img * 255).astype(np.uint8)).save(img_dir / name)
            frame = {
                "file_path": f"images/{name}",
                "transform_matrix": pose.tolist(),
            }
            if with_depth:
                depth = np.full((h, w), 300, np.int32)  # 3m at 0.01 scale
                Image.fromarray(depth.astype(np.int32), mode="I").save(
                    depth_dir / name
                )
                frame["depth_file_path"] = f"depth-maps/{name}"
            frames.append(frame)

    meta = {
        "fl_x": fx,
        "fl_y": fy,
        "cx": cx,
        "cy": cy,
        "w": w * downscale,
        "h": h * downscale,
        "camera_model": "OPENCV",
        "k1": 0.0,
        "k2": 0.0,
        "p1": 0.0,
        "p2": 0.0,
        "frames": frames,
    }
    with open(root / "transforms.json", "w") as f:
        json.dump(meta, f)
    return root


def make_sitcoms3d_fixture(
    root: Path,
    num_cameras: int = 4,
    h: int = 24,
    w: int = 32,
    downscale: int = 4,
) -> Path:
    """Sitcoms3D-format fixture for semantic-nerfw: ``cameras.json`` with
    per-frame intrinsics/camtoworld + scene bbox, ``images_{d}/`` jpgs and
    ``segmentations_{d}/thing/`` label pngs + ``panoptic_classes.json``
    (ref: sitcoms3d_dataparser.py:61-160 expected layout).

    Poses/bbox are written pre-rotated by the parser's z-up rotation's
    inverse so the parsed scene matches the analytic ball scene.
    """
    root = Path(root)
    img_dir = root / f"images_{downscale}"
    seg_dir = root / f"segmentations_{downscale}" / "thing"
    img_dir.mkdir(parents=True, exist_ok=True)
    seg_dir.mkdir(parents=True, exist_ok=True)

    # the parser rotates camtoworld/bbox by R (90deg about x); invert here
    rot = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float64)
    fx = fy = 0.7 * w * downscale
    cx, cy = w * downscale / 2.0, h * downscale / 2.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)

    frames = []
    for ci in range(num_cameras):
        theta = 2 * np.pi * ci / num_cameras
        pose = _look_at_pose([2.2 * np.cos(theta), 2.2 * np.sin(theta), 1.0])
        name = f"frame_{ci:04d}.jpg"
        img = _render_ball_scene(
            h, w, pose, fx / downscale, fy / downscale,
            cx / downscale, cy / downscale, 0.0
        )
        Image.fromarray((img * 255).astype(np.uint8)).save(img_dir / name)
        # labels: 0 background, 1 ball (red-ish), 2 floor (green-ish);
        # floor first so a bright/specular ball pixel keeps its label
        labels = np.zeros((h, w), np.uint8)
        labels[img[..., 1] > 0.5] = 2
        labels[img[..., 0] > 0.5] = 1
        Image.fromarray(labels).save(seg_dir / name.replace(".jpg", ".png"))
        c2w_file = np.concatenate(
            [rot.T @ pose[:3, :4], [[0.0, 0.0, 0.0, 1.0]]], axis=0
        )
        frames.append({
            "image_name": name,
            "intrinsics": K.tolist(),
            "camtoworld": c2w_file.tolist(),
        })

    bbox = np.array([[-1.5, -1.5, -0.2], [1.5, 1.5, 1.5]], np.float64)
    with open(root / "cameras.json", "w") as f:
        json.dump({"frames": frames, "bbox": (bbox @ rot).tolist()}, f)
    classes = ["class_0", "class_1", "class_2"]
    colors = (np.eye(3) * 255).astype(int).tolist()
    with open(root / "panoptic_classes.json", "w") as f:
        json.dump({"thing": classes, "thing_colors": colors}, f)
    return root


def make_blender_fixture(
    root: Path, num_frames: int = 3, h: int = 20, w: int = 20,
    with_times: bool = False,
) -> Path:
    """Blender-synthetic fixture: transforms_{train,val,test}.json + pngs
    (mirrors the reference's tests/data/lego_test).

    ``with_times=True`` writes the D-NeRF variant: a per-frame ``time``
    field and a time-dependent ball position, so the time-conditioned
    path (dnerf) is actually exercised (ref: dnerf_dataparser.py:36-48).
    """
    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    camera_angle_x = 0.8
    for split in ("train", "val", "test"):
        split_dir = root / split
        split_dir.mkdir(exist_ok=True)
        frames = []
        for i in range(num_frames):
            theta = 2 * np.pi * i / num_frames + (0.3 if split != "train" else 0.0)
            t = i / max(num_frames - 1, 1) if with_times else 0.0
            pose = _look_at_pose([2 * np.cos(theta), 2 * np.sin(theta), 1.2])
            fx = 0.5 * w / np.tan(0.5 * camera_angle_x)
            img = _render_ball_scene(h, w, pose, fx, fx, w / 2, h / 2, t)
            rgba = np.concatenate([img, np.ones((h, w, 1), np.float32)], axis=-1)
            Image.fromarray((rgba * 255).astype(np.uint8), mode="RGBA").save(
                split_dir / f"r_{i}.png"
            )
            frame = {
                "file_path": f"./{split}/r_{i}", "transform_matrix": pose.tolist()
            }
            if with_times:
                frame["time"] = t
            frames.append(frame)
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": camera_angle_x, "frames": frames}, f)
    return root
