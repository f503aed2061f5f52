"""Client-side 3D scene checks for the embedded viewer page.

No JS runtime ships in this sandbox, so two layers stand in for a
browser drive:
 1. structural: the served page contains the world-space gizmo surface
    (axis arrows, rotation ring, ground grid, 3D path cache) and its
    script's brackets balance (catches an unterminated edit);
 2. behavioral: the gizmo math is mirrored in Python 1:1 from the page
    script (viewProject / axis-drag / ring-rotate) and asserted — a drag
    along a projected world-axis arrow moves the keyframe along THAT
    world axis so its re-projected handle tracks the pointer, and the
    ring applies a pure world-Z rotation.

Ref surface: viewer/app/src/modules/SidePanel/CameraPanel/CameraPanel.jsx
(Three.js TransformControls on keyframes).
"""
import math
import re

import numpy as np

from soccernerfs_tpu.viewer.server import _PAGE

W, H = 800, 600
GIZMO_LEN = 0.35


def _orbit_c2w(az=0.8, el=0.5, radius=2.5):
    # mirror of the page's c2w(): orbit eye, z-up lookat of the origin
    eye = np.array([
        math.cos(az) * math.cos(el) * radius,
        math.sin(az) * math.cos(el) * radius,
        math.sin(el) * radius,
    ])
    up = np.array([0.0, 0.0, 1.0])
    f = -eye / np.linalg.norm(eye)
    r = np.cross(f, up)
    r /= np.linalg.norm(r)
    u = np.cross(r, f)
    return np.stack([r, u, -f, eye], axis=1)  # [3, 4] columns r,u,-f,eye


def _view_project(p, m, fov=60.0):
    # mirror of the page's viewProject()
    d = np.asarray(p, float) - m[:, 3]
    x, y, z = d @ m[:, 0], d @ m[:, 1], d @ m[:, 2]
    if z >= -1e-6:
        return None
    f = (H / 2) / math.tan(fov * math.pi / 360)
    return np.array([W / 2 + f * x / (-z), H / 2 - f * y / (-z), -z])


def test_page_has_world_space_gizmo_surface():
    script = _PAGE.split("<script>")[1].split("</script>")[0]
    for needle in (
        "AXES=[[1,0,0],[0,1,0],[0,0,1]]",  # world-axis arrows
        "gizmoRing",                       # world-Z rotation ring
        "drawFrustum",                     # oriented keyframe frustums
        "pathCache",                       # 3D interpolated path curve
        "ground grid",                     # world frame in edit mode
        "drawOverlay();};  // re-project", # orbit redraw, no round-trip
    ):
        assert needle in script, f"page script lost: {needle}"
    # bracket balance over the script with strings/comments stripped by a
    # small scanner (regex stripping chokes on apostrophes in comments)
    out, i, n = [], 0, len(script)
    while i < n:
        ch = script[i]
        if ch in "'\"`":
            q, i = ch, i + 1
            while i < n and script[i] != q:
                i += 2 if script[i] == "\\" else 1
            i += 1
        elif script.startswith("//", i):
            i = script.find("\n", i)
            i = n if i < 0 else i
        else:
            out.append(ch)
            i += 1
    no_str = "".join(out)
    for o, c in ("()", "{}", "[]"):
        assert no_str.count(o) == no_str.count(c), f"unbalanced {o}{c}"


def test_axis_drag_moves_keyframe_along_world_axis():
    m = _orbit_c2w()
    o = np.array([0.3, -0.2, 0.5])
    for axis in range(3):
        ax = np.eye(3)[axis]
        p0 = _view_project(o, m)
        p1 = _view_project(o + ax * GIZMO_LEN, m)
        assert p0 is not None and p1 is not None
        dir2 = p1[:2] - p0[:2]
        len2 = float(dir2 @ dir2)
        # pointer slides 25 px along the projected arrow direction
        delta = dir2 / math.sqrt(len2) * 25.0
        tpx = float(delta @ dir2) / len2
        moved = o + ax * tpx * GIZMO_LEN  # the page's update rule
        # constrained: only the chosen world axis changed
        off = moved - o
        assert abs(np.linalg.norm(off) - abs(tpx) * GIZMO_LEN) < 1e-9
        assert np.allclose(off * (1 - ax), 0.0)
        # and the re-projected handle tracks the pointer (first order;
        # perspective curvature costs a few pixels over a 25 px drag)
        p_new = _view_project(moved, m)
        np.testing.assert_allclose(p_new[:2], p0[:2] + delta, atol=3.0)


def test_ring_drag_is_pure_world_z_rotation():
    # mirror of the page's ring update: columns of c2w rotate by Rz
    c2w = np.concatenate([np.eye(3), [[0.3], [-0.2], [0.5]]], axis=1)
    dth = 0.7
    c, s = math.cos(dth), math.sin(dth)
    out = c2w.copy()
    for col in range(3):
        x, y = c2w[0, col], c2w[1, col]
        out[0, col] = c * x - s * y
        out[1, col] = s * x + c * y
    rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(out[:, :3], rz @ c2w[:, :3], atol=1e-12)
    # origin untouched; rotation stays orthonormal
    np.testing.assert_allclose(out[:, 3], c2w[:, 3])
    np.testing.assert_allclose(out[:, :3] @ out[:, :3].T, np.eye(3),
                               atol=1e-12)
