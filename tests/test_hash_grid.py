"""Temporal/static hash-grid encoder tests.

Mirrors the reference's CUDA-gated test (ref: tests/field_components/
test_temporal_grid.py) but runs on CPU — the JAX version needs no GPU.
"""
import jax
import jax.numpy as jnp
import numpy as np

from soccernerfs_tpu.ops.hash_grid import (
    HashGridConfig,
    hash_grid_encode,
    init_hash_grid,
    level_layout,
    temporal_tv_loss,
)


def test_temporal_window_forward_and_grad():
    """The reference's golden case: 1D grid, t=0 -> output 0.5, gradients
    confined to the active rows/channels (ref: test_temporal_grid.py:15-40)."""
    cfg = HashGridConfig(
        temporal_dim=2,
        input_dim=1,
        num_levels=1,
        level_dim=1,
        per_level_scale=1,
        base_resolution=1,
        log2_hashmap_size=2,
        gridtype="tiled",
        align_corners=False,
    )
    params = init_hash_grid(jax.random.PRNGKey(0), cfg)
    emb = np.array(jax.random.uniform(jax.random.PRNGKey(1), params["embeddings"].shape))
    emb[:, 0] = np.arange(emb.shape[0])
    params = {"embeddings": jnp.asarray(emb)}

    x = jnp.zeros((1024, 1))
    t = jnp.zeros((1024,))
    out = hash_grid_encode(cfg, params, x, t)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)

    weight = jax.random.normal(jax.random.PRNGKey(2), out.shape)

    def loss(p):
        return jnp.sum(hash_grid_encode(cfg, p, x, t) * weight)

    g = jax.grad(loss)(params)["embeddings"]
    assert abs(float(jnp.sum(g)) - float(jnp.sum(weight))) < 0.01
    # only the first two rows (corners of the 1-cell grid) and channel 0
    # (the t=0 window) receive gradient
    assert np.all(np.asarray(g[2:, :]) == 0)
    assert np.all(np.asarray(g[:, 1:]) == 0)

    tv = temporal_tv_loss(cfg, params, jax.random.PRNGKey(3))
    assert jnp.isfinite(tv)


def test_static_hash_grid_shapes_and_interp():
    cfg = HashGridConfig(
        temporal_dim=0,
        num_levels=4,
        level_dim=2,
        base_resolution=4,
        desired_resolution=32,
        log2_hashmap_size=10,
    )
    params = init_hash_grid(jax.random.PRNGKey(0), cfg, std=0.1)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    out = hash_grid_encode(cfg, params, x)
    assert out.shape == (64, 8)
    assert bool(jnp.all(jnp.isfinite(out)))

    # continuity: nearby points give nearby encodings
    eps = 1e-4
    out2 = hash_grid_encode(cfg, params, x + eps)
    assert float(jnp.max(jnp.abs(out - out2))) < 0.05


def test_temporal_continuity_in_time():
    """Sliding-window interpolation is continuous in t."""
    cfg = HashGridConfig(
        temporal_dim=8, num_levels=2, level_dim=2, base_resolution=4,
        log2_hashmap_size=8,
    )
    params = init_hash_grid(jax.random.PRNGKey(0), cfg, std=0.5)
    x = jnp.broadcast_to(jnp.asarray([0.3, 0.6, 0.4]), (32, 3))
    ts = jnp.linspace(0, 1, 32)
    out = hash_grid_encode(cfg, params, x, ts)
    deltas = jnp.abs(out[1:] - out[:-1])
    assert float(jnp.max(deltas)) < 0.3  # no channel-switch jumps


def test_level_layout_row_cap():
    cfg = HashGridConfig(num_levels=8, base_resolution=16, per_level_scale=2.0,
                         log2_hashmap_size=12)
    offsets, scales, resolutions = level_layout(cfg)
    rows = np.diff(offsets)
    assert np.all(rows <= 2**12)
    assert np.all(rows % 8 == 0)
    assert resolutions[0] == 16


def test_octpack_matches_per_corner_gathers():
    """The oct-packed dense/tiled fast path == naive per-corner gathers,
    for values AND table gradients (the pack is 8 rolls whose transpose
    must fold corner gradients back exactly)."""
    import soccernerfs_tpu.ops.hash_grid as hg

    cfg = HashGridConfig(
        num_levels=6, level_dim=2, base_resolution=4, per_level_scale=1.7,
        log2_hashmap_size=9,  # mix of dense and hash levels
    )
    params = init_hash_grid(jax.random.PRNGKey(2), cfg, std=0.5)
    rng = np.random.default_rng(3)
    # include out-of-grid corners (coords slightly past 1) to exercise the
    # CUDA wrap-through-modulo semantics
    x = jnp.asarray(rng.uniform(-0.05, 1.05, (200, 3)).astype(np.float32))

    def naive(cfg, params, xyz):
        """Reference: force the per-corner gather path for every level."""
        offsets, scales, resolutions = hg.level_layout(cfg)
        table = params["embeddings"]
        D = cfg.input_dim
        corner_offsets = np.stack(
            np.meshgrid(*([np.arange(2)] * D), indexing="ij"), axis=-1
        ).reshape(-1, D)
        outputs = []
        for lvl in range(cfg.num_levels):
            res = resolutions[lvl]
            rows = offsets[lvl + 1] - offsets[lvl]
            dense = res ** D <= rows
            pos = xyz * scales[lvl] + (0.0 if cfg.align_corners else 0.5)
            pos0 = jnp.floor(pos)
            frac = pos - pos0
            pos0 = pos0.astype(jnp.int32)
            level_out = 0.0
            for c in range(2 ** D):
                off = corner_offsets[c]
                idx = hg._hash_index(pos0 + off, res, rows, cfg, dense)
                feats = jnp.take(table, idx + offsets[lvl], axis=0)
                w = jnp.prod(
                    jnp.where(off[None] == 1, frac, 1.0 - frac),
                    axis=-1, keepdims=True,
                )
                level_out = level_out + w * feats
            outputs.append(level_out)
        return jnp.concatenate(outputs, axis=-1)

    out_fast = hash_grid_encode(cfg, params, x)
    out_ref = naive(cfg, params, x)
    np.testing.assert_allclose(
        np.asarray(out_fast), np.asarray(out_ref), atol=1e-6
    )

    cot = jnp.asarray(rng.standard_normal(out_ref.shape, dtype=np.float32))
    g_fast = jax.grad(lambda p: jnp.vdot(hash_grid_encode(cfg, p, x), cot))(params)
    g_ref = jax.grad(lambda p: jnp.vdot(naive(cfg, p, x), cot))(params)
    np.testing.assert_allclose(
        np.asarray(g_fast["embeddings"]), np.asarray(g_ref["embeddings"]),
        atol=1e-5,
    )


def test_sorted_scatter_add_matches_oracle():
    """The Pallas sorted scatter-add == jnp .at[].add (colliding and
    out-of-range-free indices, narrow c=2 rows, row-packed lines)."""
    from soccernerfs_tpu.ops.pallas import plane_kernels as pk

    rng = np.random.default_rng(11)
    r, m, c = 5000, 4321, 2
    idx = np.sort(rng.integers(0, r, m).astype(np.int32))
    g = rng.standard_normal((m, c)).astype(np.float32)
    got = pk.sorted_scatter_add(
        jnp.asarray(g), jnp.asarray(idx), r=r, c=c, tr=16, group=3,
        interpret=True,
    )
    ref = jnp.zeros((r, c), jnp.float32).at[jnp.asarray(idx)].add(
        jnp.asarray(g).astype(jnp.bfloat16).astype(jnp.float32)
    )
    s = np.abs(np.asarray(ref)).max() + 1e-6
    np.testing.assert_allclose(
        np.asarray(got) / s, np.asarray(ref) / s, atol=2e-2
    )


def test_hash_level_scatter_vjp_matches_xla(monkeypatch):
    """hash_grid_encode with the Pallas scatter backward (interpret mode)
    == the pure-XLA path for values, table grads, AND position grads."""
    import soccernerfs_tpu.ops.hash_grid as hg

    cfg = HashGridConfig(
        num_levels=4, level_dim=2, base_resolution=8, per_level_scale=2.0,
        log2_hashmap_size=8,  # forces XOR-hash levels
    )
    params = init_hash_grid(jax.random.PRNGKey(5), cfg, std=0.5)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(0, 1, (150, 3)).astype(np.float32))
    cot_shape = (150, cfg.num_levels * cfg.level_dim)
    cot = jnp.asarray(rng.standard_normal(cot_shape, dtype=np.float32))

    def loss(p, x):
        return jnp.vdot(hash_grid_encode(cfg, p, x), cot)

    out_ref = hash_grid_encode(cfg, params, x)
    g_ref, gx_ref = jax.grad(loss, argnums=(0, 1))(params, x)

    monkeypatch.setattr(hg, "SCATTER_INTERPRET", True)
    out_new = hash_grid_encode(cfg, params, x)
    g_new, gx_new = jax.grad(loss, argnums=(0, 1))(params, x)

    np.testing.assert_allclose(
        np.asarray(out_new), np.asarray(out_ref), atol=1e-6
    )
    s = np.abs(np.asarray(g_ref["embeddings"])).max() + 1e-6
    np.testing.assert_allclose(
        np.asarray(g_new["embeddings"]) / s,
        np.asarray(g_ref["embeddings"]) / s, atol=2e-2,
    )
    sx = np.abs(np.asarray(gx_ref)).max() + 1e-6
    np.testing.assert_allclose(
        np.asarray(gx_new) / sx, np.asarray(gx_ref) / sx, atol=2e-2
    )


def test_zline_paired_vjp_matches_xla(monkeypatch):
    """The zline paired path (one gather per z-corner PAIR from the
    roll-packed bf16 table, sorted pair-scatter backward) == the generic
    per-corner XLA path with the same zline hash: values, table grads,
    and position grads (wxy/fz chain)."""
    import soccernerfs_tpu.ops.hash_grid as hg

    cfg = HashGridConfig(
        num_levels=4, level_dim=2, base_resolution=8, per_level_scale=2.0,
        log2_hashmap_size=8,  # forces oversubscribed (hashed) levels
        hash_scheme="zline",
    )
    params = init_hash_grid(jax.random.PRNGKey(5), cfg, std=0.5)
    rng = np.random.default_rng(21)
    # past-the-grid coords exercise the wrap; fz near 0/1 the pair edges
    x = jnp.asarray(rng.uniform(-0.05, 1.05, (150, 3)).astype(np.float32))
    cot_shape = (150, cfg.num_levels * cfg.level_dim)
    cot = jnp.asarray(rng.standard_normal(cot_shape, dtype=np.float32))

    def loss(p, x):
        return jnp.vdot(hash_grid_encode(cfg, p, x), cot)

    out_ref = hash_grid_encode(cfg, params, x)
    g_ref, gx_ref = jax.grad(loss, argnums=(0, 1))(params, x)

    monkeypatch.setattr(hg, "SCATTER_INTERPRET", True)
    out_new = hash_grid_encode(cfg, params, x)
    g_new, gx_new = jax.grad(loss, argnums=(0, 1))(params, x)

    so = np.abs(np.asarray(out_ref)).max() + 1e-6
    np.testing.assert_allclose(          # bf16 gathered features
        np.asarray(out_new) / so, np.asarray(out_ref) / so, atol=1e-2
    )
    s = np.abs(np.asarray(g_ref["embeddings"])).max() + 1e-6
    np.testing.assert_allclose(
        np.asarray(g_new["embeddings"]) / s,
        np.asarray(g_ref["embeddings"]) / s, atol=2e-2,
    )
    sx = np.abs(np.asarray(gx_ref)).max() + 1e-6
    np.testing.assert_allclose(
        np.asarray(gx_new) / sx, np.asarray(gx_ref) / sx, atol=2e-2
    )


def test_zline_adjacency_and_wrap():
    """zline: idx(z+1) == (idx(z) + 1) % rows for hashed levels — the
    invariant the roll-packed pair gather relies on."""
    import soccernerfs_tpu.ops.hash_grid as hg

    cfg = HashGridConfig(log2_hashmap_size=8, hash_scheme="zline")
    rows, res = 256, 33
    rng = np.random.default_rng(3)
    c = jnp.asarray(rng.integers(0, res, (500, 3), dtype=np.int32))
    i0 = hg._hash_index(c, res, rows, cfg, dense=False)
    i1 = hg._hash_index(c + np.array([0, 0, 1]), res, rows, cfg,
                        dense=False)
    np.testing.assert_array_equal(np.asarray((i0 + 1) % rows),
                                  np.asarray(i1))


def test_temporal_hash_scatter_vjp_matches_xla(monkeypatch):
    """Temporal (sliding-window) hash levels through the Pallas scatter
    backward == pure-XLA: values, table grads, position grads, and TIME
    grads (via the temporal channel weights)."""
    import soccernerfs_tpu.ops.hash_grid as hg

    cfg = HashGridConfig(
        temporal_dim=8, num_levels=3, level_dim=2, base_resolution=8,
        per_level_scale=2.0, log2_hashmap_size=8,
    )
    params = init_hash_grid(jax.random.PRNGKey(9), cfg, std=0.5)
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.uniform(0, 1, (120, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0.1, 0.9, (120,)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal(
        (120, cfg.num_levels * cfg.level_dim), dtype=np.float32))

    def loss(p, x, t):
        return jnp.vdot(hash_grid_encode(cfg, p, x, t), cot)

    out_ref = hash_grid_encode(cfg, params, x, t)
    g_ref, gx_ref, gt_ref = jax.grad(loss, argnums=(0, 1, 2))(params, x, t)

    monkeypatch.setattr(hg, "SCATTER_INTERPRET", True)
    out_new = hash_grid_encode(cfg, params, x, t)
    g_new, gx_new, gt_new = jax.grad(loss, argnums=(0, 1, 2))(params, x, t)

    # the kernel path gathers rows in bf16 (f32 lerp): compare at bf16
    # resolution
    so = np.abs(np.asarray(out_ref)).max() + 1e-6
    np.testing.assert_allclose(np.asarray(out_new) / so,
                               np.asarray(out_ref) / so, atol=1e-2)
    for a, b in [(g_new["embeddings"], g_ref["embeddings"]),
                 (gx_new, gx_ref), (gt_new, gt_ref)]:
        s = np.abs(np.asarray(b)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(a) / s, np.asarray(b) / s,
                                   atol=2e-2)


def test_temporal_wide_rows_full_line_scatter(monkeypatch):
    """Wide temporal rows (row_channels in (32, 128]) pad to full
    128-lane lines (g_pack == 1 kernel path)."""
    import soccernerfs_tpu.ops.hash_grid as hg

    cfg = HashGridConfig(
        temporal_dim=40, num_levels=2, level_dim=2, base_resolution=8,
        per_level_scale=2.0, log2_hashmap_size=7,
    )
    params = init_hash_grid(jax.random.PRNGKey(15), cfg, std=0.5)
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.uniform(0, 1, (90, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0.1, 0.9, (90,)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((90, 4), dtype=np.float32))

    def loss(p):
        return jnp.vdot(hash_grid_encode(cfg, p, x, t), cot)

    g_ref = jax.grad(loss)(params)
    monkeypatch.setattr(hg, "SCATTER_INTERPRET", True)
    # pin the branch this test targets (trowkey would otherwise take it)
    monkeypatch.setattr(hg, "_TROWKEY_ENABLE", False)
    g_new = jax.grad(loss)(params)
    s = np.abs(np.asarray(g_ref["embeddings"])).max() + 1e-6
    np.testing.assert_allclose(
        np.asarray(g_new["embeddings"]) / s,
        np.asarray(g_ref["embeddings"]) / s, atol=2e-2,
    )


def test_input_grads_false_table_grad_parity(monkeypatch):
    """input_grads=False must leave the TABLE gradient bit-identical on
    every level path (static xor, zline paired, temporal window) while
    skipping the position/time cotangent work (those grads become
    zero/absent by stop_gradient semantics)."""
    import soccernerfs_tpu.ops.hash_grid as hg

    monkeypatch.setattr(hg, "SCATTER_INTERPRET", True)
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.uniform(0, 1, (96, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0.1, 0.9, (96,)).astype(np.float32))

    cases = [
        (HashGridConfig(temporal_dim=0, num_levels=3, level_dim=2,
                        base_resolution=8, per_level_scale=2.0,
                        log2_hashmap_size=8), False),
        (HashGridConfig(temporal_dim=0, num_levels=3, level_dim=2,
                        base_resolution=8, per_level_scale=2.0,
                        log2_hashmap_size=8, hash_scheme="zline"), False),
        (HashGridConfig(temporal_dim=8, num_levels=3, level_dim=2,
                        base_resolution=8, per_level_scale=2.0,
                        log2_hashmap_size=8), True),
    ]
    for cfg, with_time in cases:
        params = init_hash_grid(jax.random.PRNGKey(3), cfg, std=0.5)
        tt = t if with_time else None
        cot = jnp.asarray(rng.standard_normal(
            (96, cfg.num_levels * cfg.level_dim), dtype=np.float32))

        def loss(p, ig):
            return jnp.vdot(
                hash_grid_encode(cfg, p, x, tt, input_grads=ig), cot)

        out_a = hash_grid_encode(cfg, params, x, tt, input_grads=True)
        out_b = hash_grid_encode(cfg, params, x, tt, input_grads=False)
        np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))

        g_a = jax.grad(lambda p: loss(p, True))(params)
        g_b = jax.grad(lambda p: loss(p, False))(params)
        np.testing.assert_allclose(
            np.asarray(g_a["embeddings"]), np.asarray(g_b["embeddings"]),
            rtol=0, atol=0)


def test_temporal_compact_stream_backward_parity(monkeypatch):
    """The large-B compact sort-operand gw stream (channel picks expand
    AFTER the permute) must produce the same table/position/time grads
    as the dense per-corner stream (forced via _COMPACT_STREAM_BYTES)."""
    import soccernerfs_tpu.ops.hash_grid as hg

    monkeypatch.setattr(hg, "SCATTER_INTERPRET", True)
    # pin the branch this test targets (trowkey would otherwise take it)
    monkeypatch.setattr(hg, "_TROWKEY_ENABLE", False)
    cfg = HashGridConfig(
        temporal_dim=8, num_levels=3, level_dim=2, base_resolution=8,
        per_level_scale=2.0, log2_hashmap_size=8,
    )
    params = init_hash_grid(jax.random.PRNGKey(23), cfg, std=0.5)
    rng = np.random.default_rng(29)
    x = jnp.asarray(rng.uniform(0, 1, (140, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0.1, 0.9, (140,)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal(
        (140, cfg.num_levels * cfg.level_dim), dtype=np.float32))

    def loss(p, x, t, ig):
        return jnp.vdot(hash_grid_encode(cfg, p, x, t, input_grads=ig), cot)

    grads_dense = {}
    for ig in (True, False):
        grads_dense[ig] = jax.grad(loss, argnums=(0, 1, 2))(
            params, x, t, ig)

    # force the compact branch: the merged gate must ALSO go off (at
    # test scale K*B*lanes*2 is far below both caps, so without these
    # the "compact" run would silently retake the merged path)
    monkeypatch.setattr(hg, "_RESIDUAL_BYTES_CAP", 1)
    monkeypatch.setattr(hg, "_MERGED_GW_BYTES_CAP", 1)
    monkeypatch.setattr(hg, "_COMPACT_STREAM_BYTES", 1)
    for ig in (True, False):
        g_c, gx_c, gt_c = jax.grad(loss, argnums=(0, 1, 2))(params, x, t, ig)
        g_d, gx_d, gt_d = grads_dense[ig]
        for a, b in [(g_c["embeddings"], g_d["embeddings"]),
                     (gx_c, gx_d), (gt_c, gt_d)]:
            s = np.abs(np.asarray(b)).max() + 1e-6
            np.testing.assert_allclose(
                np.asarray(a) / s, np.asarray(b) / s, atol=2e-2)


def test_temporal_paired_parity(monkeypatch):
    """The paired temporal path (roll-packed [rows, 2c] forward gathers
    with even-corner indices; backward pair updates riding one sort key
    into a roll-folded virtual scatter) must match the 8-corner path
    exactly — for zline-hashed AND dense-strided levels, output and all
    grads, with and without input grads."""
    import soccernerfs_tpu.ops.hash_grid as hg

    monkeypatch.setattr(hg, "SCATTER_INTERPRET", True)
    # pin the branch this test targets (trowkey would otherwise take it)
    monkeypatch.setattr(hg, "_TROWKEY_ENABLE", False)
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.uniform(0, 1, (160, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0.05, 0.95, (160,)).astype(np.float32))

    # temporal_dim 62 -> c_row 64: 2*c_row = 128 = one lane-tile pair
    # payload; temporal_dim 64 -> c_row 66: 2*c_row = 132 exercises the
    # SPLIT scatter segments (128 + 4) of the backward-only pairing
    for scheme, tdim in (("zline", 6), ("xor", 6), ("zline", 64)):
        # base_resolution 4 makes level 0 dense (strided pairing) while
        # per_level_scale pushes later levels into hashed territory
        cfg = HashGridConfig(
            temporal_dim=tdim, num_levels=3, level_dim=2,
            base_resolution=4, per_level_scale=3.0, log2_hashmap_size=7,
            hash_scheme=scheme,
        )
        params = init_hash_grid(jax.random.PRNGKey(5), cfg, std=0.4)
        cot = jnp.asarray(rng.standard_normal(
            (160, cfg.num_levels * cfg.level_dim), dtype=np.float32))

        def loss(p, x, t, ig):
            return jnp.vdot(
                hash_grid_encode(cfg, p, x, t, input_grads=ig), cot)

        orig = hg._hash_level_apply_temporal

        def unpaired(*a, **k):
            k["paired"] = False
            return orig(*a, **k)

        # force each backward path: merged (default caps), per-corner
        # (caps off, compact threshold unreachable), compact sort-
        # operand stream (everything off -> large-B branch)
        paths = [
            ("merged", 64 * 2**20, 128 * 2**20, 128 * 2**20),
            ("per-corner", 1, 1, 1 << 60),
            ("compact", 1, 1, 1),
        ]
        for name, res_cap, gw_cap, compact_at in paths:
            monkeypatch.setattr(hg, "_RESIDUAL_BYTES_CAP", res_cap)
            monkeypatch.setattr(hg, "_MERGED_GW_BYTES_CAP", gw_cap)
            monkeypatch.setattr(hg, "_COMPACT_STREAM_BYTES", compact_at)

            monkeypatch.setattr(hg, "_hash_level_apply_temporal", orig)
            out_paired = hash_grid_encode(cfg, params, x, t)
            grads_paired = {
                ig: jax.grad(loss, argnums=(0, 1, 2))(params, x, t, ig)
                for ig in (True, False)
            }

            monkeypatch.setattr(
                hg, "_hash_level_apply_temporal", unpaired)
            out_ref = hash_grid_encode(cfg, params, x, t)
            np.testing.assert_allclose(
                np.asarray(out_paired), np.asarray(out_ref), atol=1e-5,
                err_msg=f"{scheme}/{name}")
            for ig in (True, False):
                g_ref = jax.grad(loss, argnums=(0, 1, 2))(
                    params, x, t, ig)
                for a, b in zip(grads_paired[ig], g_ref):
                    fa = jax.tree_util.tree_leaves(a)
                    fb = jax.tree_util.tree_leaves(b)
                    for la, lb in zip(fa, fb):
                        np.testing.assert_allclose(
                            np.asarray(la), np.asarray(lb), atol=1e-5,
                            err_msg=f"{scheme}/{name}/ig={ig}")
            monkeypatch.setattr(hg, "_hash_level_apply_temporal", orig)


def test_zline_vs_xor_fit_quality():
    """Collision-quality regression A/B for hash_scheme="zline" (ADVICE r4).

    zline replaces the reference's prime-XOR fast_hash
    (ref: temporal_gridencoder.cu:47-58) on the z axis with an additive
    linear term; gradient parity alone does not guard RECONSTRUCTION
    quality, because the two schemes have different collision structure.
    Fit a smooth analytic 3D field with both schemes (same seeds, same
    optimizer) and assert the zline final loss stays within 25% of xor's
    — the measured gap is <1% (PERF.md r3: 0.00594 xor vs 0.00597 zline
    over 3 seeds; this test uses a smaller single-seed fit for speed)."""
    import optax

    losses = {}
    for scheme in ("xor", "zline"):
        cfg = HashGridConfig(
            num_levels=4, level_dim=2, base_resolution=8,
            per_level_scale=1.6, log2_hashmap_size=9,
            hash_scheme=scheme,
        )
        key = jax.random.PRNGKey(0)
        params = init_hash_grid(key, cfg)
        head = jax.random.normal(
            jax.random.PRNGKey(1), (cfg.output_dim, 1)) * 0.3
        state = {"emb": params["embeddings"], "head": head}
        x = jax.random.uniform(jax.random.PRNGKey(2), (2048, 3))
        target = (
            jnp.sin(7.0 * x[:, 0]) * jnp.cos(5.0 * x[:, 1])
            + jnp.sin(9.0 * x[:, 2] * x[:, 0])
        )[:, None]
        opt = optax.adam(5e-3)
        opt_state = opt.init(state)

        @jax.jit
        def step(state, opt_state):
            def loss_fn(s):
                feat = hash_grid_encode(
                    cfg, {"embeddings": s["emb"]}, x, input_grads=False)
                return jnp.mean((feat.astype(jnp.float32) @ s["head"]
                                 - target) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(state)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(state, updates), opt_state, loss

        for _ in range(200):
            state, opt_state, loss = step(state, opt_state)
        losses[scheme] = float(loss)

    assert losses["zline"] < 1.25 * losses["xor"], losses
    # and both actually fit (initial loss is ~0.5)
    assert losses["zline"] < 0.1, losses


def test_temporal_trowkey_backward_parity(monkeypatch):
    """The temporal-row-keyed table gradient (key = idx*(T-1) + t_row,
    compact 2L-value payload, static one-hot MXU fold) must match the
    dense-stream gradient on the xor, zline-paired and dense-level
    paths, in BOTH the merged-sort and per-corner regimes, with and
    without input grads."""
    import soccernerfs_tpu.ops.hash_grid as hg

    monkeypatch.setattr(hg, "SCATTER_INTERPRET", True)
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.uniform(0, 1, (160, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0.05, 0.95, (160,)).astype(np.float32))

    for scheme in ("xor", "zline"):
        cfg = HashGridConfig(
            temporal_dim=8, num_levels=3, level_dim=2, base_resolution=4,
            per_level_scale=2.5, log2_hashmap_size=7, hash_scheme=scheme,
        )
        params = init_hash_grid(jax.random.PRNGKey(5), cfg, std=0.5)
        cot = jnp.asarray(rng.standard_normal(
            (160, cfg.num_levels * cfg.level_dim), dtype=np.float32))

        def loss(p, x, t, ig):
            return jnp.vdot(
                hash_grid_encode(cfg, p, x, t, input_grads=ig), cot)

        monkeypatch.setattr(hg, "_TROWKEY_ENABLE", False)
        ref = {ig: jax.grad(loss, argnums=(0, 1, 2))(params, x, t, ig)
               for ig in (True, False)}
        monkeypatch.setattr(hg, "_TROWKEY_ENABLE", True)
        for merge_keys in (10**9, 1):  # merged-sort and per-corner
            monkeypatch.setattr(hg, "_TROWKEY_MERGE_KEYS", merge_keys)
            for ig in (True, False):
                g_n, gx_n, gt_n = jax.grad(loss, argnums=(0, 1, 2))(
                    params, x, t, ig)
                g_r, gx_r, gt_r = ref[ig]
                for a, b in [(g_n["embeddings"], g_r["embeddings"]),
                             (gx_n, gx_r), (gt_n, gt_r)]:
                    s = np.abs(np.asarray(b)).max() + 1e-6
                    np.testing.assert_allclose(
                        np.asarray(a) / s, np.asarray(b) / s, atol=2e-2,
                        err_msg=f"{scheme} merge_keys={merge_keys} ig={ig}")
