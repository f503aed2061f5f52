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


def test_force_shard_map_single_device(tmp_path):
    """machine.force_shard_map takes the SPMD branch on a 1-device mesh:
    the same program a pod run compiles (shard_map + axis_index + pmean)
    runs at world size 1 and still trains (scripts/validate_spmd_tpu.py
    runs this on the real chip where the Pallas kernels are live)."""
    import copy
    import dataclasses

    from soccernerfs_tpu.configs.method_configs import method_configs
    from soccernerfs_tpu.data.dataparsers.blender import BlenderDataParserConfig
    from soccernerfs_tpu.data.fixtures import make_blender_fixture
    from soccernerfs_tpu.engine.trainer import Trainer

    data = tmp_path / "data"
    make_blender_fixture(str(data), num_frames=2, h=24, w=24)
    cfg = copy.deepcopy(method_configs["k-planes-static"])
    cfg.vis = "terminal"
    cfg.output_dir = tmp_path / "out"
    cfg.max_num_iterations = 2
    cfg.steps_per_save = 10**9
    cfg.steps_per_eval_batch = 0
    cfg.steps_per_eval_image = 0
    cfg.steps_per_eval_all_images = 0
    cfg.machine.num_devices = 1
    cfg.machine.force_shard_map = True
    cfg.pipeline.model = dataclasses.replace(
        cfg.pipeline.model,
        spacetime_resolution=(8, 8, 8),
        multiscale_res=(1,),
        feature_dim=4,
        num_proposal_samples_per_ray=(8, 6),
        proposal_net_args_list=(
            {"feature_dim": 2, "resolution": (8, 8, 8)},
            {"feature_dim": 2, "resolution": (16, 16, 16)},
        ),
        num_nerf_samples_per_ray=8,
        sigma_net_hidden_dim=16,
        rgb_net_hidden_dim=16,
    )
    dm = cfg.pipeline.datamanager
    dm.dataparser = BlenderDataParserConfig(data=data)
    dm.train_num_rays_per_batch = 64
    cfg.set_timestamp()
    trainer = Trainer(cfg).setup()
    assert int(np.prod(trainer.mesh.devices.shape)) == 1
    metrics = trainer.train_iteration(0)
    loss = float(jax.device_get(metrics["Train Loss"]))
    assert loss == loss  # finite
    trainer.train_iteration(1)
