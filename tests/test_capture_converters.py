"""Capture-app converters produce valid, pose-correct transforms.json.

Synthetic fixtures for each format; pose conventions pinned against the
reference's axis shuffles (ref: process_data/polycam_utils.py:75-82,
record3d_utils.py:47-60, metashape_utils.py:118-126,
realitycapture_utils.py:97-105, insta360_utils.py:99-171).
"""
import json
import xml.etree.ElementTree as ET

import numpy as np
from PIL import Image

from soccernerfs_tpu.scripts import capture_converters as cc
from soccernerfs_tpu.scripts import process_data as pd_script


def _png(path, w=8, h=6):
    Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(path)


def test_polycam(tmp_path):
    kf = tmp_path / "cap" / "keyframes"
    (kf / "images").mkdir(parents=True)
    (kf / "cameras").mkdir()
    for i, blur in enumerate([100.0, 5.0, 60.0]):
        _png(kf / "images" / f"{i}.jpg")
        (kf / "cameras" / f"{i}.json").write_text(json.dumps({
            "fx": 100.0, "fy": 101.0, "cx": 4.0, "cy": 3.0,
            "width": 8, "height": 6, "blur_score": blur,
            **{f"t_{r}{c}": float(r * 4 + c) for r in range(3) for c in range(4)},
        }))
    out = tmp_path / "out"
    summary = cc.polycam_to_json(tmp_path / "cap", out, min_blur_score=25.0,
                                 crop_border_pixels=1)
    assert any("Skipped 1" in s for s in summary)
    meta = json.loads((out / "transforms.json").read_text())
    assert len(meta["frames"]) == 2
    f0 = meta["frames"][0]
    assert f0["w"] == 6 and f0["cx"] == 3.0
    # row shuffle (2, 0, 1): first row is t_2*
    assert f0["transform_matrix"][0] == [8.0, 9.0, 10.0, 11.0]
    assert f0["transform_matrix"][1] == [0.0, 1.0, 2.0, 3.0]
    assert len(list((out / "images").glob("*.jpg"))) == 2


def test_record3d(tmp_path):
    cap = tmp_path / "cap"
    (cap / "rgb").mkdir(parents=True)
    n = 5
    for i in range(n):
        _png(cap / "rgb" / f"{i}.jpg")
    # identity quaternion (x,y,z,w) + translation i
    poses = [[0, 0, 0, 1, float(i), 0.0, 0.0] for i in range(n)]
    k = np.array([[50, 0, 0], [0, 50, 0], [4, 3, 1]], float)  # column-major
    (cap / "metadata.json").write_text(json.dumps({
        "poses": poses, "K": k.reshape(-1).tolist(), "w": 8, "h": 6,
    }))
    out = tmp_path / "out"
    count = cc.record3d_to_json(cap, out, max_dataset_size=3)
    assert count == 3
    meta = json.loads((out / "transforms.json").read_text())
    assert meta["fl_x"] == 50.0 and meta["cx"] == 4.0
    m0 = np.asarray(meta["frames"][0]["transform_matrix"])
    np.testing.assert_allclose(m0[:3, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(m0[0, 3], 0.0)


def test_metashape(tmp_path):
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    _png(imgs / "cam0.png")
    _png(imgs / "cam1.png")
    t = " ".join(str(float(v)) for v in range(16))
    xml = f"""<document><chunk>
      <sensors><sensor id="0"><resolution width="8" height="6"/>
        <calibration><f>100</f><cx>0.5</cx><cy>-0.5</cy><k1>0.01</k1></calibration>
      </sensor></sensors>
      <cameras>
        <camera label="cam0.png" sensor_id="0"><transform>{t}</transform></camera>
        <camera label="cam1.png" sensor_id="0"/>
      </cameras>
    </chunk></document>"""
    xml_path = tmp_path / "cameras.xml"
    xml_path.write_text(xml)
    out = tmp_path / "out"
    summary = cc.metashape_to_json(xml_path, imgs, out)
    meta = json.loads((out / "transforms.json").read_text())
    assert meta["cx"] == 4.5 and meta["k1"] == 0.01
    assert len(meta["frames"]) == 1
    # ref row/sign convention: row0 = [t8, -t9, -t10, t11]
    assert meta["frames"][0]["transform_matrix"][0] == [8.0, -9.0, -10.0, 11.0]
    assert any("1 images skipped" in s for s in summary)


def test_realitycapture(tmp_path):
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    _png(imgs / "shot0.png")
    csv_path = tmp_path / "poses.csv"
    csv_path.write_text(
        "#name,x,y,alt,heading,pitch,roll,f,px,py,k1,k2,k3,k4,t1,t2\n"
        "shot0.png,1.0,2.0,3.0,0,0,0,36,0,0,0,0,0,0,0,0\n"
        "missing.png,0,0,0,0,0,0,36,0,0,0,0,0,0,0,0\n"
    )
    out = tmp_path / "out"
    summary = cc.realitycapture_to_json(csv_path, imgs, out)
    meta = json.loads((out / "transforms.json").read_text())
    assert len(meta["frames"]) == 1
    f0 = meta["frames"][0]
    assert f0["fl_x"] == 8.0  # 36 * max(8,6)/36
    m = np.asarray(f0["transform_matrix"])
    np.testing.assert_allclose(m[:3, 3], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(m[:3, :3], np.eye(3), atol=1e-9)
    assert any("Missing image data for 1" in s for s in summary)


def test_insta360_commands():
    cmds = cc.insta360_ffmpeg_commands(
        video_front=__import__("pathlib").Path("a_00_x.insv"),
        video_back=__import__("pathlib").Path("a_10_x.insv"),
        image_dir="imgs", num_frames_target=10,
    )
    assert len(cmds) == 2
    assert all(c[0] == "ffmpeg" for c in cmds)
    assert "crop=iw*0.7:ih*0.7,thumbnail=10" in cmds[0][4]
    single = cc.insta360_ffmpeg_commands(
        __import__("pathlib").Path("a.insv"), None, "imgs", 10)
    assert "iw/2" in single[1][4]  # back lens offset in single-file mode


def test_cli_subcommands_registered():
    import argparse

    for cmd in ("polycam", "record3d", "metashape", "realitycapture", "insta360"):
        try:
            pd_script.main([cmd])
        except SystemExit as e:
            assert e.code == 2  # missing required args, not unknown command
