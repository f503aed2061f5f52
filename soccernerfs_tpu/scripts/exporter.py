"""snt-export — export trained models to point clouds / meshes / cameras
(ref: scripts/exporter.py:1-376 + exporter/ helpers).

Subcommands (mirroring ns-export):
  pointcloud     render eval cameras' rgb+depth, backproject to a colored
                 point cloud (PLY)
  cameras        dump train/eval camera intrinsics+extrinsics to JSON
  tsdf           depth-map TSDF fusion into a voxel grid -> mesh (PLY)
                 via marching tetrahedra
  marching-cubes density-field isosurface -> mesh (PLY)
  poisson        screened-Poisson surface reconstruction from rendered
                 depth maps -> mesh (PLY); own FFT indicator-function
                 solver (ops/poisson.py) instead of the reference's
                 open3d dependency

    python -m soccernerfs_tpu.scripts.exporter pointcloud \
        --load-config <run>/config.yml --output-dir exports/
"""
from __future__ import annotations

import argparse
import json
import struct
from pathlib import Path

import numpy as np


def write_ply(
    path: Path, points: np.ndarray, colors=None, faces=None
) -> None:
    """Binary little-endian PLY writer (points [N,3], colors [N,3] 0-1)."""
    path.parent.mkdir(parents=True, exist_ok=True)
    n = points.shape[0]
    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
    header += [f"property float {c}" for c in "xyz"]
    if colors is not None:
        header += [f"property uchar {c}" for c in ("red", "green", "blue")]
    if faces is not None:
        header += [f"element face {faces.shape[0]}",
                   "property list uchar int vertex_indices"]
    header.append("end_header")
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        if colors is not None:
            c8 = (np.clip(colors, 0, 1) * 255).astype(np.uint8)
            for p, c in zip(points.astype("<f4"), c8):
                f.write(p.tobytes() + c.tobytes())
        else:
            f.write(points.astype("<f4").tobytes())
        if faces is not None:
            for face in faces.astype("<i4"):
                f.write(struct.pack("<B", 3) + face.tobytes())
    print(f"wrote {path} ({n} vertices"
          + (f", {faces.shape[0]} faces)" if faces is not None else ")"))


def _backproject(trainer, num_cameras: int, downsample: int = 4):
    """Render cameras, backproject depth to world points with colors."""
    from soccernerfs_tpu.core.cameras import generate_image_rays

    cams = trainer.eval_cameras
    pts, cols = [], []
    for idx in range(min(num_cameras, cams.num_cameras)):
        outputs = trainer.render_camera(cams, idx)
        rays = generate_image_rays(cams, idx)
        h, w = outputs["rgb"].shape[:2]
        origins = np.asarray(rays.origins).reshape(h, w, 3)
        dirs = np.asarray(rays.directions).reshape(h, w, 3)
        depth = outputs["depth"]
        acc = outputs["accumulation"]
        keep = acc > 0.5
        keep[::1, :] &= True
        sl = (slice(None, None, downsample), slice(None, None, downsample))
        keep = keep[sl]
        p = (origins + dirs * depth[..., None])[sl][keep]
        c = outputs["rgb"][sl][keep]
        pts.append(p)
        cols.append(c)
    return np.concatenate(pts), np.concatenate(cols)


def cmd_pointcloud(args):
    from soccernerfs_tpu.utils.eval_utils import eval_setup

    _, trainer, _ = eval_setup(args.load_config, "inference")
    pts, cols = _backproject(trainer, args.num_cameras, args.downsample)
    if args.num_points and pts.shape[0] > args.num_points:
        sel = np.random.default_rng(0).choice(pts.shape[0], args.num_points, replace=False)
        pts, cols = pts[sel], cols[sel]
    write_ply(args.output_dir / "point_cloud.ply", pts, cols)


def cmd_cameras(args):
    """(ref: exporter.py ExportCameraPoses)."""
    from soccernerfs_tpu.utils.eval_utils import eval_setup

    _, trainer, _ = eval_setup(args.load_config, "inference")
    out = {}
    for split, cams in (("train", trainer.train_cameras), ("eval", trainer.eval_cameras)):
        entries = []
        for i in range(cams.num_cameras):
            entries.append(
                {
                    "camera_to_world": np.asarray(cams.camera_to_worlds[i]).tolist(),
                    "fx": float(np.asarray(cams.fx)[i]),
                    "fy": float(np.asarray(cams.fy)[i]),
                    "cx": float(np.asarray(cams.cx)[i]),
                    "cy": float(np.asarray(cams.cy)[i]),
                    "width": int(np.asarray(cams.width)[i]),
                    "height": int(np.asarray(cams.height)[i]),
                    "time": (
                        float(np.asarray(cams.times)[i]) if cams.times is not None else None
                    ),
                }
            )
        out[split] = entries
    args.output_dir.mkdir(parents=True, exist_ok=True)
    path = args.output_dir / "cameras.json"
    path.write_text(json.dumps(out, indent=2))
    print(f"wrote {path}")


def _density_volume(trainer, resolution: int, time: float | None):
    """Sample the model's density on a dense grid inside the scene box."""
    import jax.numpy as jnp

    model = trainer.model
    cfg = trainer.model_cfg
    aabb = np.asarray(trainer.aabb)
    g = [np.linspace(aabb[0][d], aabb[1][d], resolution) for d in range(3)]
    X, Y, Z = np.meshgrid(*g, indexing="ij")
    pts = np.stack([X, Y, Z], axis=-1).reshape(-1, 3)

    import jax

    params = trainer.state.params

    vol = np.zeros(pts.shape[0], np.float32)
    chunk = 1 << 16
    for i in range(0, pts.shape[0], chunk):
        block = jnp.asarray(pts[i : i + chunk])
        n = block.shape[0]
        if hasattr(model, "density_at"):
            d = model.density_at(cfg, params, trainer.aabb, block, time)
        else:
            # generic: use a kplanes-style field query if available
            from soccernerfs_tpu.fields import kplanes as fk

            if "grids" in params.get("fields", {}):
                times = None if time is None else jnp.full((n,), time)
                d, _ = fk.kplanes_density(
                    cfg.field_config(), params["fields"], trainer.aabb, block, times
                )
            else:
                raise SystemExit(
                    "density export not supported for this model; "
                    "expose density_at(cfg, params, aabb, positions, time)"
                )
        vol[i : i + chunk] = np.asarray(d)[:n]
    return vol.reshape(resolution, resolution, resolution), aabb


def cmd_marching_cubes(args):
    from soccernerfs_tpu.ops.marching import marching_tetrahedra
    from soccernerfs_tpu.utils.eval_utils import eval_setup

    _, trainer, _ = eval_setup(args.load_config, "inference")
    vol, aabb = _density_volume(trainer, args.resolution, args.time)
    spacing = (aabb[1] - aabb[0]) / (args.resolution - 1)
    verts, faces = marching_tetrahedra(vol, args.iso_level, aabb[0], spacing)
    write_ply(args.output_dir / "mesh.ply", verts, faces=faces)


def cmd_tsdf(args):
    """Depth-map TSDF fusion (ref: exporter/tsdf_utils.py, simplified)."""
    from soccernerfs_tpu.core.cameras import generate_image_rays
    from soccernerfs_tpu.ops.marching import marching_tetrahedra
    from soccernerfs_tpu.utils.eval_utils import eval_setup

    _, trainer, _ = eval_setup(args.load_config, "inference")
    aabb = np.asarray(trainer.aabb)
    res = args.resolution
    g = [np.linspace(aabb[0][d], aabb[1][d], res) for d in range(3)]
    X, Y, Z = np.meshgrid(*g, indexing="ij")
    voxels = np.stack([X, Y, Z], -1).reshape(-1, 3)
    tsdf = np.full(voxels.shape[0], 1.0, np.float32)
    weight = np.zeros(voxels.shape[0], np.float32)
    trunc = args.truncation * float((aabb[1] - aabb[0]).max())

    cams = trainer.eval_cameras
    for idx in range(min(args.num_cameras, cams.num_cameras)):
        outputs = trainer.render_camera(cams, idx)
        rays = generate_image_rays(cams, idx)
        h, w = outputs["depth"].shape[:2]
        c2w = np.asarray(cams.camera_to_worlds[idx])
        R, t = c2w[:3, :3], c2w[:3, 3]
        # project voxels into the camera
        local = (voxels - t) @ R  # world -> camera (R orthonormal)
        zs = -local[:, 2]
        valid = zs > 1e-6
        fx = float(np.asarray(cams.fx)[idx]); fy = float(np.asarray(cams.fy)[idx])
        cx = float(np.asarray(cams.cx)[idx]); cy = float(np.asarray(cams.cy)[idx])
        u = (local[:, 0] / np.where(valid, zs, 1.0)) * fx + cx
        v = (-local[:, 1] / np.where(valid, zs, 1.0)) * fy + cy
        inside = valid & (u >= 0) & (u < w) & (v >= 0) & (v < h)
        ui = np.clip(u.astype(int), 0, w - 1)
        vi = np.clip(v.astype(int), 0, h - 1)
        depth = outputs["depth"][vi, ui]
        sdf = (depth - zs) / trunc
        upd = inside & (sdf > -1.0)
        sdf = np.clip(sdf, -1.0, 1.0)
        new_w = weight + upd
        tsdf = np.where(upd, (tsdf * weight + sdf) / np.maximum(new_w, 1), tsdf)
        weight = new_w

    vol = tsdf.reshape(res, res, res)
    spacing = (aabb[1] - aabb[0]) / (res - 1)
    verts, faces = marching_tetrahedra(-vol, 0.0, aabb[0], spacing)
    write_ply(args.output_dir / "tsdf_mesh.ply", verts, faces=faces)


def cmd_poisson(args):
    """Screened-Poisson mesh from rendered depth maps (ref: exporter.py
    ExportPoissonMesh — open3d there; own FFT solver in ops/poisson.py).

    Normals come from the structured backprojected point maps (cross
    product of image-space tangents, camera-facing orientation) — the
    same role open3d's ``estimate_normals`` plays in the reference.
    """
    from soccernerfs_tpu.core.cameras import generate_image_rays
    from soccernerfs_tpu.ops.poisson import depth_map_normals, poisson_reconstruct
    from soccernerfs_tpu.utils.eval_utils import eval_setup

    _, trainer, _ = eval_setup(args.load_config, "inference")
    cams = trainer.eval_cameras
    pts, nrms = [], []
    for idx in range(min(args.num_cameras, cams.num_cameras)):
        outputs = trainer.render_camera(cams, idx)
        rays = generate_image_rays(cams, idx)
        h, w = outputs["rgb"].shape[:2]
        origins = np.asarray(rays.origins).reshape(h, w, 3)
        dirs = np.asarray(rays.directions).reshape(h, w, 3)
        pmap = origins + dirs * outputs["depth"][..., None]
        normals = depth_map_normals(pmap, origins)
        keep = outputs["accumulation"] > 0.5
        sl = (slice(None, None, args.downsample),) * 2
        keep = keep[sl]
        pts.append(pmap[sl][keep])
        nrms.append(normals[sl][keep])
    pts = np.concatenate(pts) if pts else np.zeros((0, 3), np.float32)
    if pts.shape[0] == 0:
        raise SystemExit(
            "no surface points above accumulation 0.5 — train longer or "
            "render more cameras before exporting a poisson mesh"
        )
    nrms = np.concatenate(nrms)
    if args.num_points and pts.shape[0] > args.num_points:
        sel = np.random.default_rng(0).choice(
            pts.shape[0], args.num_points, replace=False
        )
        pts, nrms = pts[sel], nrms[sel]
    aabb = np.stack([pts.min(0), pts.max(0)])
    verts, faces = poisson_reconstruct(
        pts, nrms, aabb, resolution=args.resolution
    )
    write_ply(args.output_dir / "poisson_mesh.ply", verts, faces=faces)


def main(argv=None):
    parser = argparse.ArgumentParser("snt-export")
    sub = parser.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--load-config", type=Path, required=True)
        p.add_argument("--output-dir", type=Path, default=Path("exports"))

    p = sub.add_parser("pointcloud"); common(p)
    p.add_argument("--num-points", type=int, default=1_000_000)
    p.add_argument("--num-cameras", type=int, default=10)
    p.add_argument("--downsample", type=int, default=4)
    p.set_defaults(fn=cmd_pointcloud)

    p = sub.add_parser("cameras"); common(p)
    p.set_defaults(fn=cmd_cameras)

    p = sub.add_parser("marching-cubes"); common(p)
    p.add_argument("--resolution", type=int, default=128)
    p.add_argument("--iso-level", type=float, default=5.0)
    p.add_argument("--time", type=float, default=None)
    p.set_defaults(fn=cmd_marching_cubes)

    p = sub.add_parser("tsdf"); common(p)
    p.add_argument("--resolution", type=int, default=128)
    p.add_argument("--num-cameras", type=int, default=10)
    p.add_argument("--truncation", type=float, default=0.05)
    p.set_defaults(fn=cmd_tsdf)

    p = sub.add_parser("poisson"); common(p)
    p.add_argument("--resolution", type=int, default=192)
    p.add_argument("--num-points", type=int, default=1_000_000)
    p.add_argument("--num-cameras", type=int, default=10)
    p.add_argument("--downsample", type=int, default=2)
    p.set_defaults(fn=cmd_poisson)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
