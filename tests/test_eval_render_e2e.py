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
    # lpips/dyn metrics degrade to an explicit null (not NaN) without
    # weights/detector — present, and valid JSON either way
    for key in ("lpips", "dlpips"):
        assert results[key] is None or np.isfinite(results[key])


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


def test_prepacked_render_path_matches_train_forward():
    """pack_grids_for_render + canonical_sorted_features(ms_packed=...)
    (the whole-image render fast path) reproduces the per-call-pack
    training forward exactly — both quantize tables to bf16 identically."""
    import jax
    import jax.numpy as jnp

    from soccernerfs_tpu.fields import kplanes as kpf

    rng = np.random.default_rng(0)
    cfg = kpf.KPlanesFieldConfig(
        spacetime_resolution=(8, 8, 8, 5), feat_dim=32, multiscale_res=(1, 2),
        concat_features_across_scales=True, sigma_net_hidden_dim=32,
        rgb_net_hidden_dim=32,
    )
    params = kpf.init_kplanes_field(jax.random.PRNGKey(1), cfg)
    pts = jnp.asarray(rng.uniform(-1, 1, (300, 4)).astype(np.float32))
    f0, p0, _ = kpf.canonical_sorted_features(pts, params["grids"], True)
    packed = kpf.pack_grids_for_render(params)["grids_packed"]
    f1, p1, _ = kpf.canonical_sorted_features(
        pts, params["grids"], True, ms_packed=packed
    )
    assert np.array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))


def test_prepare_render_params_keeps_model_outputs(trained_run):
    """models.kplanes.prepare_render_params packs field + proposal tables;
    get_outputs(train=False) with packed params matches the unpacked path
    (CPU falls back to identical XLA sampling; packed entries are inert)."""
    import jax
    import jax.numpy as jnp

    from soccernerfs_tpu.core.rays import RayBundle
    from soccernerfs_tpu.models import kplanes as kpm

    cfg = kpm.Config(
        spacetime_resolution=(8, 8, 8), multiscale_res=(1, 2), feature_dim=4,
        proposal_net_args_list=({"feature_dim": 2, "resolution": (8, 8, 8)},),
        num_proposal_iterations=1,
        num_proposal_samples_per_ray=(8,), num_nerf_samples_per_ray=4,
        sigma_net_hidden_dim=16, rgb_net_hidden_dim=16,
    )
    params = kpm.init(jax.random.PRNGKey(0), cfg, num_train_data=2)
    aabb = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    n = 32
    rng = np.random.default_rng(3)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = RayBundle(
        origins=jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)),
        directions=jnp.asarray(d),
        pixel_area=jnp.ones((n, 1)) * 1e-6,
    )
    out0 = kpm.get_outputs(cfg, params, aabb, rays, rng=None, train=False)
    packed = kpm.prepare_render_params(cfg, params)
    out1 = kpm.get_outputs(cfg, packed, aabb, rays, rng=None, train=False)
    np.testing.assert_allclose(
        np.asarray(out0["rgb"]), np.asarray(out1["rgb"]), atol=1e-6
    )
