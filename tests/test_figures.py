"""Paper-figure tooling: scene viz + headless crop/split/turbo CLI
(ref: nerfstudio/utils/plotly_utils.py, scripts/figures/*)."""
import numpy as np
import pytest
from PIL import Image

from soccernerfs_tpu.utils import figures as figs


def _cams(n=4):
    from soccernerfs_tpu.core.cameras import Cameras

    c2w = np.zeros((n, 3, 4), np.float32)
    for i in range(n):
        th = 2 * np.pi * i / n
        z = np.array([np.cos(th), np.sin(th), 0.4])
        z /= np.linalg.norm(z)
        x = np.cross([0.0, 0.0, 1.0], z)
        x /= np.linalg.norm(x)
        c2w[i, :, 0], c2w[i, :, 1], c2w[i, :, 2] = x, np.cross(z, x), z
        c2w[i, :, 3] = z * 3.0
    return Cameras.create(
        camera_to_worlds=c2w, fx=100.0, fy=100.0, cx=32.0, cy=24.0,
        width=64, height=48,
    )


def test_frustum_geometry():
    cams = _cams(1)
    corners = figs.frustum_corners(
        np.asarray(cams.camera_to_worlds)[0], 100, 100, 32, 24, 64, 48,
        depth=0.5,
    )
    assert corners.shape == (5, 3)
    apex = np.asarray(cams.camera_to_worlds)[0, :, 3]
    np.testing.assert_allclose(corners[0], apex, atol=1e-6)
    # image corners sit at the requested depth along the view axis
    view = -np.asarray(cams.camera_to_worlds)[0, :, 2]
    depths = (corners[1:] - apex) @ view
    np.testing.assert_allclose(depths, 0.5, atol=1e-5)
    segs = figs.frustum_segments(corners)
    assert segs.shape == (8, 2, 3)
    assert figs.camera_frustum_segments(_cams(4)).shape == (32, 2, 3)


def test_vis_dataset_saves(tmp_path):
    cams = _cams(4)
    o = np.zeros((10, 3), np.float32)
    d = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (10, 1))
    out = figs.vis_dataset(
        cams, o, d, save_path=str(tmp_path / "scene.png")
    )
    assert (tmp_path / "scene.png").stat().st_size > 1000
    assert out == str(tmp_path / "scene.png")


def test_turbo_and_split_and_crop():
    g = np.linspace(0, 1, 64 * 32).reshape(64, 32)
    rgb = figs.turbo_colormap(g)
    assert rgb.shape == (64, 32, 3) and rgb.dtype == np.uint8
    assert not np.array_equal(rgb[0, 0], rgb[-1, -1])

    strip = np.concatenate(
        [np.full((8, 10, 3), v, np.uint8) for v in (10, 100, 200)], axis=1
    )
    panels = figs.split_strip(strip, 3)
    assert len(panels) == 3 and panels[1][0, 0, 0] == 100
    with pytest.raises(AssertionError):
        figs.split_strip(strip, 4)

    gt = np.zeros((20, 20, 3), np.uint8)
    pred = np.full((20, 20, 3), 50, np.uint8)
    marked, crops = figs.crop_panels(gt, [pred], (5, 5, 8, 8), border=1)
    assert marked[5, 5, 0] == 255          # rectangle drawn
    assert crops[0].shape == (8, 8, 3)
    assert crops[1][0, 0, 0] == 50


def test_figures_cli(tmp_path):
    from soccernerfs_tpu.scripts import figures as cli

    gt = tmp_path / "gt.png"
    pred = tmp_path / "pred.png"
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(gt)
    Image.fromarray(np.full((16, 16, 3), 99, np.uint8)).save(pred)
    out = tmp_path / "out"
    assert cli.main([
        "crop", "--gt", str(gt), "--preds", str(pred),
        "--rect", "2", "2", "8", "8", "-o", str(out),
    ]) == 0
    assert (out / "gt_marked.png").exists()
    assert (out / "crop_pred.png").exists()

    strip = tmp_path / "strip.png"
    Image.fromarray(
        np.concatenate([np.zeros((8, 8, 3), np.uint8),
                        np.full((8, 8, 3), 200, np.uint8)], axis=1)
    ).save(strip)
    assert cli.main([
        "split", "--images", str(strip), "--panels", "2", "-o", str(out),
    ]) == 0
    assert (out / "strip_pred1.png").exists()

    assert cli.main([
        "turbo", "--images", str(gt), "-o", str(out),
    ]) == 0
    assert (out / "gt_turbo.png").exists()
