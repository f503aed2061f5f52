"""Equirect -> perspective crops + hloc gating (snt-process-data).

Covers the round-3 additions that mirror the reference's
process_data/equirect_utils.py and hloc_utils.py.
"""
from pathlib import Path

import numpy as np
import pytest

from soccernerfs_tpu.scripts import sfm_tools as st


def _longitude_banded_equirect(he=64, we=128):
    """Equirect image whose red channel encodes longitude, green latitude."""
    img = np.zeros((he, we, 3), np.uint8)
    img[..., 0] = (np.arange(we)[None, :] * 255 // we).astype(np.uint8)
    img[..., 1] = (np.arange(he)[:, None] * 255 // he).astype(np.uint8)
    return img


def test_equirect_center_pixel_tracks_yaw_and_pitch():
    img = _longitude_banded_equirect()
    he, we = img.shape[:2]
    for yaw in (-90.0, 0.0, 45.0, 135.0):
        out = st.equirect_to_perspective(img, 90.0, yaw, 0.0, (33, 33))
        center = out[16, 16].astype(np.float64)
        # forward direction at (yaw, 0) lands at longitude = yaw
        expect_u = (yaw / 360.0 + 0.5) * we
        got_u = center[0] / 255.0 * we
        assert abs(got_u - expect_u) < 2.0, (yaw, got_u, expect_u)
        # equator => mid latitude
        assert abs(center[1] / 255.0 * he - he / 2) < 2.0

    # looking up (pitch +45 in the reference's convention = -45 sampling
    # latitude): smaller green value (latitude is top-down)
    up = st.equirect_to_perspective(img, 90.0, 0.0, -45.0, (33, 33))
    down = st.equirect_to_perspective(img, 90.0, 0.0, 45.0, (33, 33))
    assert up[16, 16, 1] < down[16, 16, 1]


def test_equirect_longitude_wraps():
    img = _longitude_banded_equirect()
    out = st.equirect_to_perspective(img, 120.0, 180.0, 0.0, (17, 17))
    # looking backwards spans the +/-180 seam without index errors and
    # mixes both edge bands
    assert out.shape == (17, 17, 3)
    assert int(out[8, 0, 0]) > 128 and int(out[8, -1, 0]) < 128


@pytest.mark.parametrize("n,fov,count", [(8, 120.0, 8), (14, 110.0, 14)])
def test_view_patterns_match_reference_counts(n, fov, count):
    got_fov, pairs = st.equirect_view_directions(n)
    assert got_fov == fov
    assert len(pairs) == count
    # equator ring present, up/down rings at +/-45
    pitches = sorted({p for _, p in pairs})
    assert pitches == [-45.0, 0.0, 45.0]


def test_view_pattern_crop_drops_rings():
    # heavy bottom crop removes the top ring (reference cascade semantics)
    _, pairs = st.equirect_view_directions(8, (0.0, 0.6, 0.0, 0.0))
    pitches = {p for _, p in pairs}
    assert 45.0 not in pitches and len(pairs) < 8
    with pytest.raises(ValueError):
        st.equirect_view_directions(8, (1.5, 0, 0, 0))


def test_planar_projection_generation(tmp_path):
    from PIL import Image

    img = _longitude_banded_equirect(32, 64)
    for i in range(2):
        Image.fromarray(img).save(tmp_path / f"eq_{i}.png")
    res = st.compute_resolution_from_equirect(tmp_path, 8)
    assert res == (int(np.sqrt(32 * 64 / 8)),) * 2
    out = st.generate_planar_projections_from_equirectangular(
        tmp_path, (16, 16), 8
    )
    assert out == tmp_path / "planar_projections"
    assert len(list(out.glob("*.jpg"))) == 2 * 8


def test_hloc_gating_raises_without_toolbox():
    if st.have_hloc():  # pragma: no cover - not installed in CI image
        pytest.skip("hloc installed")
    with pytest.raises(RuntimeError, match="hloc"):
        st.run_hloc(Path("/tmp/x"), Path("/tmp/y"))


def test_process_data_cli_accepts_equirect_flags(tmp_path):
    """images --camera-type equirectangular renders crops then stops at the
    colmap gate (no colmap binary in CI)."""
    from PIL import Image

    from soccernerfs_tpu.scripts import process_data

    data = tmp_path / "raw"
    data.mkdir()
    Image.fromarray(_longitude_banded_equirect(32, 64)).save(data / "a.png")
    with pytest.raises(SystemExit, match="colmap"):
        process_data.main([
            "images", "--data", str(data),
            "--output-dir", str(tmp_path / "out"),
            "--camera-type", "equirectangular",
            "--images-per-equirect", "8",
        ])
    # crops were produced and copied before the SfM gate fired
    assert len(list((data / "planar_projections").glob("*.jpg"))) == 8
    assert len(list((tmp_path / "out" / "images").iterdir())) == 8
