"""COLMAP parsing round-trip + mesh/PLY unit tests."""
import struct
from pathlib import Path

import numpy as np

from soccernerfs_tpu.data.colmap_utils import (
    colmap_to_transforms,
    qvec2rotmat,
    read_cameras_binary,
    read_images_binary,
)


def _write_fake_colmap_binary(sparse: Path):
    sparse.mkdir(parents=True, exist_ok=True)
    # cameras.bin: one OPENCV camera
    with open(sparse / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 4, 640, 480))  # OPENCV = model 4
        f.write(struct.pack("<8d", 500.0, 510.0, 320.0, 240.0, 0.01, -0.01, 0.0, 0.0))
    # images.bin: two images
    with open(sparse / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 2))
        for i, name in enumerate([b"a.png", b"b.png"]):
            f.write(struct.pack("<i", i + 1))
            q = np.array([1.0, 0.0, 0.0, 0.0])
            f.write(struct.pack("<4d", *q))
            f.write(struct.pack("<3d", 0.1 * i, 0.2, 0.3))
            f.write(struct.pack("<i", 1))
            f.write(name + b"\x00")
            f.write(struct.pack("<Q", 0))


def test_colmap_binary_roundtrip(tmp_path):
    _write_fake_colmap_binary(tmp_path / "sparse")
    cams = read_cameras_binary(tmp_path / "sparse" / "cameras.bin")
    assert cams[1].model == "OPENCV"
    assert cams[1].width == 640 and cams[1].params[0] == 500.0
    imgs = read_images_binary(tmp_path / "sparse" / "images.bin")
    assert len(imgs) == 2 and imgs[1].name == "a.png"

    meta = colmap_to_transforms(tmp_path / "sparse")
    assert len(meta["frames"]) == 2
    fr = meta["frames"][0]
    assert fr["fl_x"] == 500.0 and fr["k1"] == 0.01
    c2w = np.array(fr["transform_matrix"])
    assert c2w.shape == (4, 4)
    # rotation block orthonormal
    R = c2w[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)


def test_qvec_identity():
    np.testing.assert_allclose(
        qvec2rotmat(np.array([1.0, 0, 0, 0])), np.eye(3), atol=1e-12
    )


def test_poisson_reconstruct_sphere():
    """FFT screened-Poisson recovers a unit sphere from an oriented
    point cloud to sub-voxel accuracy (replaces the reference's open3d
    ExportPoissonMesh path; ref: scripts/exporter.py)."""
    from soccernerfs_tpu.ops.poisson import poisson_reconstruct

    rng = np.random.default_rng(0)
    n = rng.normal(size=(5000, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    aabb = np.array([[-1.2] * 3, [1.2] * 3])
    verts, faces = poisson_reconstruct(n, n, aabb, resolution=64)
    assert verts.shape[0] > 1000 and faces.shape[0] > 1000
    r = np.linalg.norm(verts, axis=1)
    assert abs(r.mean() - 1.0) < 0.02
    assert r.std() < 0.02
    # faces index valid vertices
    assert faces.min() >= 0 and faces.max() < verts.shape[0]


def test_depth_map_normals_plane():
    """Structured point-map normals on an axis-aligned plane point back
    toward the camera side."""
    from soccernerfs_tpu.ops.poisson import depth_map_normals

    xs, ys = np.meshgrid(np.linspace(0, 1, 8), np.linspace(0, 1, 8))
    pmap = np.stack([xs, ys, np.zeros_like(xs)], axis=-1)
    cam = np.array([0.5, 0.5, 2.0])
    nrm = depth_map_normals(pmap, cam)
    np.testing.assert_allclose(nrm[..., 2], 1.0, atol=1e-6)


def test_ply_writer(tmp_path):
    from soccernerfs_tpu.scripts.exporter import write_ply

    pts = np.random.default_rng(0).random((10, 3)).astype(np.float32)
    cols = np.random.default_rng(1).random((10, 3))
    write_ply(tmp_path / "x.ply", pts, cols)
    data = (tmp_path / "x.ply").read_bytes()
    assert data.startswith(b"ply\nformat binary_little_endian")
    header_end = data.index(b"end_header\n") + len(b"end_header\n")
    assert len(data) - header_end == 10 * (12 + 3)
