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
