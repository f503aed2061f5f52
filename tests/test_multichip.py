"""Explicit data-parallel sharding checks on the 8-device virtual mesh.

Every Trainer test in this suite already runs over all 8 virtual CPU
devices (Trainer builds its mesh from jax.devices()); this test asserts
the placement contract explicitly: batch sharded over ``data``, state
replicated — something the reference could never test without GPUs
(SURVEY §4.6).
"""
import jax
import numpy as np

from soccernerfs_tpu.parallel import mesh as meshlib


def test_mesh_has_8_devices():
    mesh = meshlib.make_data_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == (meshlib.DATA_AXIS,)


def test_batch_sharded_state_replicated():
    mesh = meshlib.make_data_mesh()
    batch = {"x": np.arange(64, dtype=np.float32).reshape(64, 1)}
    sharded = meshlib.shard_batch(batch, mesh)
    # each device holds 64/8 rows
    shard_shapes = {s.data.shape for s in sharded["x"].addressable_shards}
    assert shard_shapes == {(8, 1)}

    tree = {"w": np.ones((4, 4), np.float32)}
    replicated = meshlib.replicate_tree(tree, mesh)
    shard_shapes = {s.data.shape for s in replicated["w"].addressable_shards}
    assert shard_shapes == {(4, 4)}  # full copy everywhere
    assert len(replicated["w"].addressable_shards) == 8


def test_sharded_grad_reduction():
    """Gradient of a replicated param w.r.t. a sharded batch sums across
    devices (the DDP all-reduce equivalent, inserted by XLA)."""
    import jax.numpy as jnp

    mesh = meshlib.make_data_mesh()
    w = meshlib.replicate_tree(jnp.ones((1,)), mesh)
    x = meshlib.shard_batch({"x": np.ones((64, 1), np.float32)}, mesh)["x"]

    def loss(w, x):
        return jnp.sum(w * x)

    g = jax.jit(jax.grad(loss))(w, x)
    assert float(g[0]) == 64.0  # contributions from all shards reduced
