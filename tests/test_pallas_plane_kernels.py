"""Stripe-bucketed Pallas plane kernels vs the pure-XLA reference.

Runs the kernels in interpreter mode on CPU (tests/conftest.py forces the
cpu platform); the same code compiles on TPU (exercised by bench.py and
the driver).  Validates:
  * forward exactness against take+lerp at bf16 table precision,
  * backward table gradients against XLA's scatter-add,
  * the full sorted multiscale interpolation path (3 sorts + inverse
    permutation) against the reference interpolate_kplanes output and
    gradients.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from soccernerfs_tpu.fields import kplanes as kpf
from soccernerfs_tpu.ops import grid_sample as gs
from soccernerfs_tpu.ops.pallas import plane_kernels as pk


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(gs, "PALLAS_INTERPRET", True)


def _ref_lerp(table, idx, tx, ty):
    feat = table.shape[-1] // 4
    rows = jnp.take(table.astype(jnp.bfloat16), idx, axis=0).astype(jnp.float32)
    p00, p01 = rows[:, :feat], rows[:, feat : 2 * feat]
    p10, p11 = rows[:, 2 * feat : 3 * feat], rows[:, 3 * feat :]
    top = p00 * (1 - tx[:, None]) + p01 * tx[:, None]
    bot = p10 * (1 - tx[:, None]) + p11 * tx[:, None]
    return top * (1 - ty[:, None]) + bot * ty[:, None]


def test_fwd_kernel_exact():
    rng = np.random.default_rng(0)
    r, m = 40 * 50, 777
    table = jnp.asarray(rng.standard_normal((r, 128), dtype=np.float32))
    idx = jnp.asarray(np.sort(rng.integers(0, r, m).astype(np.int32)))
    tx = jnp.asarray(rng.uniform(0, 1, m).astype(np.float32))
    ty = jnp.asarray(rng.uniform(0, 1, m).astype(np.float32))
    out = pk.packed_bilerp_fwd(table, idx, tx, ty, tr=256, group=2, interpret=True)
    ref = _ref_lerp(table, idx, tx, ty)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_bwd_kernel_matches_scatter():
    rng = np.random.default_rng(1)
    r, m = 30 * 64, 513
    idx = jnp.asarray(np.sort(rng.integers(0, r, m).astype(np.int32)))
    tx = jnp.asarray(rng.uniform(0, 1, m).astype(np.float32))
    ty = jnp.asarray(rng.uniform(0, 1, m).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((m, 32), dtype=np.float32))
    grad = pk.packed_bilerp_bwd(g, idx, tx, ty, r=r, tr=128, group=3, interpret=True)
    gw = jnp.concatenate(
        [
            g * ((1 - tx) * (1 - ty))[:, None],
            g * (tx * (1 - ty))[:, None],
            g * ((1 - tx) * ty)[:, None],
            g * (tx * ty)[:, None],
        ],
        axis=1,
    ).astype(jnp.bfloat16).astype(jnp.float32)
    ref = jnp.zeros((r, 128), jnp.float32).at[idx].add(gw)
    scale = np.abs(np.asarray(ref)).max()
    np.testing.assert_allclose(
        np.asarray(grad) / scale, np.asarray(ref) / scale, atol=1e-2
    )


@pytest.mark.parametrize(
    "h,w,m,planes,tr,group",
    [
        (12, 16, 613, 2, 32, 3),     # multi-block: spill rows cross blocks
        (7, 8, 99, 1, 8, 2),         # tiny stripes, heavy borders
        (20, 24, 900, 3, 48, 2),     # 3-plane group
        (6, 16, 333, 1, 16, 1),      # tg < w+1: spill spans TWO blocks
    ],
)
def test_bwd_fold_kernel_matches_quadpack_transpose(h, w, m, planes, tr, group):
    """bilerp_bwd_group_fold == XLA scatter-add through quad_pack's
    transpose (i.e. gradients w.r.t. the UNPACKED [H, W, F] grid)."""
    rng = np.random.default_rng(21)
    r = h * w
    grids = [jnp.asarray(rng.standard_normal((h, w, 32), dtype=np.float32))
             for _ in range(planes)]
    # corner cells included: y0 in [0, h-2] but x/y fractions up to 1
    y = np.sort(rng.uniform(0, 1, m).astype(np.float32))
    yc = np.minimum((y * (h - 1)).astype(np.int32), h - 2)
    rowids, txs, gups = [], [], []
    for _ in range(planes):
        x = rng.uniform(0, 1, m).astype(np.float32)
        xc = np.minimum((x * (w - 1)).astype(np.int32), w - 2)
        rowids.append(jnp.asarray(yc * w + xc))
        txs.append(jnp.asarray(rng.uniform(0, 1, m).astype(np.float32)))
        gups.append(jnp.asarray(rng.standard_normal((m, 32), dtype=np.float32)))
    ty = jnp.asarray(rng.uniform(0, 1, m).astype(np.float32))

    got = pk.bilerp_bwd_group_fold(
        gups, rowids, txs, ty, h=h, w=w, tr=tr, group=group, interpret=True
    )

    for p in range(planes):
        gw = jnp.concatenate(
            [
                gups[p] * ((1 - txs[p]) * (1 - ty))[:, None],
                gups[p] * (txs[p] * (1 - ty))[:, None],
                gups[p] * ((1 - txs[p]) * ty)[:, None],
                gups[p] * (txs[p] * ty)[:, None],
            ],
            axis=1,
        ).astype(jnp.bfloat16).astype(jnp.float32)
        packed_grad = jnp.zeros((r, 128), jnp.float32).at[rowids[p]].add(gw)
        _, vjp = jax.vjp(gs.quad_pack, grids[p])
        (ref,) = vjp(packed_grad)
        s = np.abs(np.asarray(ref)).max() + 1e-6
        np.testing.assert_allclose(
            np.asarray(got[p]).reshape(h, w, 32) / s, np.asarray(ref) / s,
            atol=1e-2,
        )


@pytest.mark.parametrize("dim", [3, 4])
def test_sorted_interpolation_matches_reference(dim):
    """interpolate_kplanes_sorted == reference path (values AND grads)."""
    rng = np.random.default_rng(2)
    f, m = 32, 300
    resolutions = [(8, 8, 8, 5)[:dim], (16, 16, 16, 5)[:dim]]
    key = jax.random.PRNGKey(0)
    ms_grids = []
    for reso in resolutions:
        key, k = jax.random.split(key)
        ms_grids.append(kpf.init_plane_grids(k, f, reso))
    pts = jnp.asarray(rng.uniform(-1, 1, (m, dim)).astype(np.float32))

    def run_sorted(grids):
        return kpf.interpolate_kplanes_sorted(pts, grids, concat_features=True)

    def run_ref(grids):
        # the packed XLA path (never routed to pallas on cpu)
        combs = kpf.plane_combinations(dim)
        per_scale = []
        for grids_s in grids:
            acc = 1.0
            for ci, (c1, c2) in enumerate(combs):
                acc = acc * gs.sample_plane_bilinear_packed(
                    grids_s[ci], pts[:, (c1, c2)]
                )
            per_scale.append(acc)
        return jnp.concatenate(per_scale, axis=-1)

    out_s = run_sorted(ms_grids)
    out_r = run_ref(ms_grids)
    # the sorted path rounds features to bf16 for the permute (the MLPs
    # consume bf16 anyway): compare at bf16 resolution
    scale = np.abs(np.asarray(out_r)).max()
    np.testing.assert_allclose(
        np.asarray(out_s) / scale, np.asarray(out_r) / scale, atol=1.5e-2
    )

    cot = jnp.asarray(rng.standard_normal(out_r.shape, dtype=np.float32))
    g_s = jax.grad(lambda g: jnp.vdot(run_sorted(g), cot))(ms_grids)
    g_r = jax.grad(lambda g: jnp.vdot(run_ref(g), cot))(ms_grids)
    for a, b in zip(jax.tree_util.tree_leaves(g_s), jax.tree_util.tree_leaves(g_r)):
        scale = np.abs(np.asarray(b)).max() + 1e-6
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=2e-2
        )


def test_static_query_of_time_model_samples_spatial_planes():
    """A 4D (time) model queried WITHOUT times must sample XY/XZ/YZ — the
    4D plane order is XY,XZ,XT,YZ,YT,ZT, so naive indexing would silently
    sample XT in place of YZ (round-1 latent bug, crashed the sorted
    path's shape-grouped kernels)."""
    rng = np.random.default_rng(5)
    f, m = 32, 200
    ms_grids = [kpf.init_plane_grids(jax.random.PRNGKey(0), f, (8, 10, 12, 5))]
    pts3 = jnp.asarray(rng.uniform(-1, 1, (m, 3)).astype(np.float32))

    out_sorted = kpf.interpolate_kplanes_sorted(pts3, ms_grids, concat_features=True)
    out_ref = kpf.interpolate_kplanes(pts3, ms_grids, concat_features=True)

    # explicit spatial-plane product: XY=grids[0], XZ=grids[1], YZ=grids[3]
    expect = (
        gs.sample_plane_bilinear_packed(ms_grids[0][0], pts3[:, (0, 1)])
        * gs.sample_plane_bilinear_packed(ms_grids[0][1], pts3[:, (0, 2)])
        * gs.sample_plane_bilinear_packed(ms_grids[0][3], pts3[:, (1, 2)])
    )
    scale = np.abs(np.asarray(expect)).max()
    np.testing.assert_allclose(
        np.asarray(out_sorted) / scale, np.asarray(expect) / scale, atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(out_ref) / scale, np.asarray(expect) / scale, atol=2e-2
    )

    # gradients land only on the three spatial planes
    g = jax.grad(lambda grids: jnp.sum(
        kpf.interpolate_kplanes_sorted(pts3, grids, concat_features=True) ** 2
    ))(ms_grids)
    for ci, nonzero in enumerate([True, True, False, True, False, False]):
        got = bool(np.abs(np.asarray(g[0][ci])).max() > 0)
        assert got == nonzero, f"plane {ci}: grad nonzero={got}, want {nonzero}"


def test_bwdsorted_narrow_features_matches_reference():
    """The proposal-field path (F=8, row-packed tables, sort-in-backward)
    matches the XLA reference for values AND gradients."""
    rng = np.random.default_rng(7)
    f, m = 8, 700
    ms_grids = [kpf.init_plane_grids(jax.random.PRNGKey(3), f, (16, 16, 16, 4))]
    pts = jnp.asarray(rng.uniform(-1, 1, (m, 4)).astype(np.float32))

    def run_new(grids):
        return kpf.interpolate_kplanes_bwdsorted(pts, grids, concat_features=False)

    def run_ref(grids):
        per = 1.0
        for ci, (c1, c2) in kpf._sampled_planes(4, 6):
            per = per * gs.sample_plane_bilinear_packed(grids[0][ci], pts[:, (c1, c2)])
        return per

    out_n = run_new(ms_grids)
    out_r = run_ref(ms_grids)
    scale = np.abs(np.asarray(out_r)).max()
    np.testing.assert_allclose(
        np.asarray(out_n) / scale, np.asarray(out_r) / scale, atol=1e-2
    )

    cot = jnp.asarray(rng.standard_normal(out_r.shape, dtype=np.float32))
    g_n = jax.grad(lambda g: jnp.vdot(run_new(g), cot))(ms_grids)
    g_r = jax.grad(lambda g: jnp.vdot(run_ref(g), cot))(ms_grids)
    for a, b in zip(jax.tree_util.tree_leaves(g_n), jax.tree_util.tree_leaves(g_r)):
        s = np.abs(np.asarray(b)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(a) / s, np.asarray(b) / s, atol=3e-2)


@pytest.mark.parametrize(
    "h,w,m,planes,tr,group",
    [
        (25, 16, 700, 2, 32, 3),     # non-pow2 h, multi-block, boundary merges
        (9, 8, 99, 1, 8, 2),         # tiny stripes, heavy borders
        (20, 12, 900, 3, 24, 2),     # non-pow2 w (rem path), 3-plane group
        (100, 16, 555, 1, 64, 1),    # time-plane aspect (h >> stripes rows)
    ],
)
def test_fwd_unpacked_kernel_matches_packed_reference(h, w, m, planes, tr,
                                                      group):
    """unpacked_bilerp_fwd_group (no quad-pack, border folded into the
    lerp weights) == take+lerp through the quad-packed bf16 table."""
    rng = np.random.default_rng(31)
    r = h * w
    grids = [jnp.asarray(rng.standard_normal((h, w, 32), dtype=np.float32))
             for _ in range(planes)]
    # include exact border cells: y0 up to h-1 (ty=0 there), x0 up to w-1
    y = np.sort(rng.uniform(0, h - 1, m).astype(np.float32))
    y[:3] = h - 1                                 # bottom-row replicate
    y.sort()
    yc = y.astype(np.int32)
    ty = jnp.asarray(y - yc)
    rowids, txs = [], []
    for _ in range(planes):
        x = rng.uniform(0, w - 1, m).astype(np.float32)
        x[:5] = w - 1                             # right-column replicate
        xc = x.astype(np.int32)
        rowids.append(jnp.asarray(yc * w + xc))
        txs.append(jnp.asarray(x - xc))
    outs = pk.unpacked_bilerp_fwd_group(
        [g.reshape(r, 32) for g in grids], rowids, txs, ty,
        h=h, w=w, tr=tr, group=group, interpret=True,
    )
    for g, idx, tx, out in zip(grids, rowids, txs, outs):
        ref = _ref_lerp(gs.quad_pack(g), idx, tx, ty)
        scale = np.abs(np.asarray(ref)).max()
        np.testing.assert_allclose(
            np.asarray(out) / scale, np.asarray(ref) / scale, atol=1e-2
        )


def test_render_staging_dispatch():
    """pack_grids_for_render stores UNPACKED bf16 copies for
    kernel-eligible tables and the sorted sampler consumes them (values
    match the quad-packed render path)."""
    rng = np.random.default_rng(33)
    f, m = 32, 400
    ms_grids = [kpf.init_plane_grids(jax.random.PRNGKey(8), f, (8, 12, 16, 5))]
    pts = jnp.asarray(rng.uniform(-1, 1, (m, 4)).astype(np.float32))
    params = {"grids": ms_grids}
    staged = kpf.pack_grids_for_render(params)
    # tiny fixture tables fall below the 65536-row bar: staging must be
    # quad-packed there and values must match the non-staged path
    for tbl, grid in zip(staged["grids_packed"][0], ms_grids[0]):
        assert tbl.shape[-1] == 4 * grid.shape[-1]
    out_staged, _, _ = kpf.canonical_sorted_features(
        pts, ms_grids, concat_features=True,
        ms_packed=staged["grids_packed"],
    )
    out_ref, _, _ = kpf.canonical_sorted_features(
        pts, ms_grids, concat_features=True,
    )
    scale = np.abs(np.asarray(out_ref)).max()
    np.testing.assert_allclose(
        np.asarray(out_staged) / scale, np.asarray(out_ref) / scale,
        atol=2e-2,
    )


def test_render_staging_unpacked_branch():
    """canonical_sorted_features dispatches [R, F] staged tables to the
    unpacked forward kernel and [R, 4F] ones to the packed XLA gather —
    mixed within one call — with values matching the non-staged path.

    Stages by w % 4 alone (the production size bar is a perf policy;
    correctness of the dispatch is what's under test).  Resolution
    (9, 12, 16, 5) puts the c1=0 planes (w=9) on the packed branch and
    the rest (w=12/16) on the unpacked kernel.
    """
    rng = np.random.default_rng(34)
    f, m = 32, 500
    ms_grids = [kpf.init_plane_grids(jax.random.PRNGKey(9), f, (9, 12, 16, 5))]
    pts = jnp.asarray(rng.uniform(-1, 1, (m, 4)).astype(np.float32))
    staged = [
        [
            g.reshape(-1, g.shape[-1]).astype(jnp.bfloat16)
            if g.shape[1] % 4 == 0
            else gs.quad_pack(g).astype(jnp.bfloat16)
            for g in grids
        ]
        for grids in ms_grids
    ]
    widths = {g.shape[1] % 4 == 0 for g in ms_grids[0]}
    assert widths == {True, False}          # both branches exercised
    out_staged, _, _ = kpf.canonical_sorted_features(
        pts, ms_grids, concat_features=True, ms_packed=staged
    )
    out_ref, _, _ = kpf.canonical_sorted_features(
        pts, ms_grids, concat_features=True
    )
    scale = np.abs(np.asarray(out_ref)).max()
    np.testing.assert_allclose(
        np.asarray(out_staged) / scale, np.asarray(out_ref) / scale,
        atol=2e-2,
    )


def test_fwd_group_kernel_exact():
    """Multi-plane forward kernel (fused lerp) matches take+lerp."""
    rng = np.random.default_rng(9)
    r, m = 24 * 32, 600
    tables = [jnp.asarray(rng.standard_normal((r, 128), dtype=np.float32))
              for _ in range(2)]
    order = np.sort(rng.integers(0, r, m).astype(np.int32))
    rowids = [jnp.asarray(order), jnp.asarray(np.clip(order + 1, 0, r - 1))]
    txs = [jnp.asarray(rng.uniform(0, 1, m).astype(np.float32)) for _ in range(2)]
    ty = jnp.asarray(rng.uniform(0, 1, m).astype(np.float32))
    outs = pk.packed_bilerp_fwd_group(tables, rowids, txs, ty, tr=96, group=2,
                                      interpret=True)
    for t, idx, tx, out in zip(tables, rowids, txs, outs):
        ref = _ref_lerp(t, idx, tx, ty)
        scale = np.abs(np.asarray(ref)).max()
        np.testing.assert_allclose(
            np.asarray(out) / scale, np.asarray(ref) / scale, atol=1e-2
        )


@pytest.mark.parametrize("linear_decoder", [False, True])
def test_field_forward_fused_matches_separate(monkeypatch, linear_decoder):
    """kplanes_field_forward's canonical-order pipeline (MLPs in sorted
    order, one [M, 4] permute back) == kplanes_density + kplanes_rgb."""
    monkeypatch.setattr(kpf, "_use_sorted_sampler", lambda grids, allowed=True: True)
    rng = np.random.default_rng(11)
    m = 257
    cfg = kpf.KPlanesFieldConfig(
        spacetime_resolution=(8, 8, 8, 5),
        feat_dim=32,
        multiscale_res=(1, 2),
        concat_features_across_scales=True,
        linear_decoder=linear_decoder,
        disable_viewing_dependent=False,
        sigma_net_hidden_dim=32,
        rgb_net_hidden_dim=32,
    )
    params = kpf.init_kplanes_field(jax.random.PRNGKey(4), cfg)
    aabb = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    positions = jnp.asarray(rng.uniform(-1, 1, (m, 3)).astype(np.float32))
    dirs = rng.standard_normal((m, 3)).astype(np.float32)
    dirs = jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1, keepdims=True))
    times = jnp.asarray(rng.uniform(0, 1, (m,)).astype(np.float32))

    density_f, rgb_f = kpf.kplanes_field_forward(
        cfg, params, aabb, positions, dirs, times, None, train=True
    )

    monkeypatch.setattr(kpf, "_use_sorted_sampler", lambda grids, allowed=True: False)
    density_r, features_r = kpf.kplanes_density(cfg, params, aabb, positions, times)
    rgb_r = kpf.kplanes_rgb(cfg, params, features_r, dirs, None, train=True)

    # both paths round features to bf16 somewhere (packed gather vs sorted
    # permute): compare at bf16 resolution
    sd = np.abs(np.asarray(density_r)).max()
    np.testing.assert_allclose(
        np.asarray(density_f) / sd, np.asarray(density_r) / sd, atol=2e-2
    )
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_r), atol=2e-2)
