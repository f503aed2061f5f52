"""End-to-end train -> checkpoint -> snt-eval -> snt-render regression.

Mirrors the reference's flagship offline flow: ns-train writes config.yml
+ checkpoints, ns-eval loads the latest checkpoint and emits the metrics
JSON (ref: scripts/eval.py:19-43), ns-render consumes --traj spiral and a
viewer-exported camera_path.json (ref: scripts/render.py:47-117,
camera_paths.py:116-164).  Runs the tiny blender fixture on CPU.
"""
import json

import numpy as np
import pytest

from soccernerfs_tpu.data.fixtures import make_blender_fixture
from soccernerfs_tpu.scripts import eval as eval_script
from soccernerfs_tpu.scripts import render as render_script
from soccernerfs_tpu.scripts import train as train_script


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data = root / "data"
    data.mkdir()
    make_blender_fixture(str(data))
    out = root / "outputs"
    train_script.main([
        "k-planes-static",
        "--max-num-iterations", "2",
        "--steps-per-save", "2",
        "--output-dir", str(out),
        "--pipeline.model.spacetime-resolution", "8", "8", "8",
        "--pipeline.model.multiscale-res", "1", "2",
        "--pipeline.model.feature-dim", "4",
        "--pipeline.model.num-proposal-samples-per-ray", "8", "6",
        "--pipeline.model.num-nerf-samples-per-ray", "4",
        "--pipeline.model.sigma-net-hidden-dim", "16",
        "--pipeline.model.rgb-net-hidden-dim", "16",
        "--pipeline.datamanager.train-num-rays-per-batch", "64",
        "blender-data", "--data", str(data),
    ])
    runs = sorted(out.glob("*/k-planes-static/*/config.yml"))
    assert runs, "training produced no config.yml"
    return root, runs[-1]


def test_eval_json_matches_ns_eval_schema(trained_run):
    root, config_path = trained_run
    out_json = root / "results.json"
    eval_script.main([
        "--load-config", str(config_path),
        "--output-path", str(out_json),
    ])
    payload = json.loads(out_json.read_text())
    # top-level shape mirrors ns-eval (ref: scripts/eval.py:32-42)
    assert {"experiment_name", "method_name", "checkpoint", "results"} <= set(payload)
    results = payload["results"]
    for key in ("psnr", "ssim", "lpips", "dpsnr", "dssim", "dlpips",
                "num_rays_per_sec", "fps"):
        assert key in results, key
    assert np.isfinite(results["psnr"])
    # lpips/dyn metrics may be NaN without weights/detector — but present


def test_render_spiral_and_camera_path(trained_run, tmp_path):
    root, config_path = trained_run
    # spiral trajectory
    out_dir = tmp_path / "spiral.mp4"
    render_script.main([
        "--load-config", str(config_path),
        "--traj", "spiral",
        "--output-path", str(out_dir),
        "--output-format", "images",
        "--interpolation-steps", "2",
        "--rendered-output-names", "rgb", "depth",
    ])
    frames = list((tmp_path / "spiral").glob("*.png"))
    assert frames, "spiral render produced no frames"

    # hand-built viewer camera_path.json (the viewer->render loop)
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 2.0
    path = {
        "render_height": 24,
        "render_width": 32,
        "camera_path": [
            {"camera_to_world": c2w.reshape(-1).tolist(), "fov": 50.0},
            {"camera_to_world": c2w.reshape(-1).tolist(), "fov": 60.0},
        ],
    }
    path_file = tmp_path / "camera_path.json"
    path_file.write_text(json.dumps(path))
    out2 = tmp_path / "traj.mp4"
    render_script.main([
        "--load-config", str(config_path),
        "--traj", "filename",
        "--camera-path-filename", str(path_file),
        "--output-path", str(out2),
        "--output-format", "images",
    ])
    frames2 = list((tmp_path / "traj").glob("*.png"))
    assert len(frames2) == 2
