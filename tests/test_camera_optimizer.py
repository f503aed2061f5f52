"""Camera pose optimization actually receives gradients when enabled.

Every registered method ships with mode="off" (matching the reference
defaults, ref: cameras/camera_optimizers.py:41-67), so this exercises the
SO3xR3 path explicitly: two train steps must move the pose adjustments
off zero — which also guards the sorted-sampler gate (the Pallas path
detaches positions and MUST stand down when poses are trainable).
"""
import dataclasses

import numpy as np

from soccernerfs_tpu.configs.method_configs import method_configs
from soccernerfs_tpu.data.fixtures import make_blender_fixture
from soccernerfs_tpu.engine.trainer import Trainer

SMALL = dict(
    spacetime_resolution=(8, 8, 8),
    multiscale_res=(1, 2),
    feature_dim=4,
    proposal_net_args_list=(
        {"feature_dim": 2, "resolution": (8, 8, 8)},
        {"feature_dim": 2, "resolution": (16, 16, 16)},
    ),
    num_proposal_samples_per_ray=(8, 6),
    num_nerf_samples_per_ray=4,
    sigma_net_hidden_dim=16,
    rgb_net_hidden_dim=16,
)


def test_so3xr3_pose_params_receive_gradients(tmp_path):
    data = tmp_path / "data"
    data.mkdir()
    make_blender_fixture(str(data))

    import copy

    cfg = copy.deepcopy(method_configs["k-planes-static"])
    cfg.max_num_iterations = 2
    cfg.steps_per_save = 100
    cfg.output_dir = tmp_path / "out"
    cfg.pipeline.model = dataclasses.replace(cfg.pipeline.model, **SMALL)
    cfg.pipeline.datamanager.train_num_rays_per_batch = 64
    from soccernerfs_tpu.data.dataparsers.blender import BlenderDataParserConfig

    cfg.pipeline.datamanager.dataparser = BlenderDataParserConfig(data=data)
    cfg.pipeline.datamanager.camera_optimizer = dataclasses.replace(
        cfg.pipeline.datamanager.camera_optimizer, mode="SO3xR3"
    )
    cfg.set_timestamp()

    trainer = Trainer(cfg).setup()
    # the gate is per-instance config now (no module global): this trainer
    # must have stood the sorted sampler down ...
    assert trainer.model_cfg.sorted_sampler is False
    pose0 = np.asarray(trainer.state.params["camera_opt"]["pose_adjustment"])
    assert np.all(pose0 == 0)
    trainer.train()
    pose1 = np.asarray(trainer.state.params["camera_opt"]["pose_adjustment"])
    assert np.any(pose1 != 0), "pose adjustments never received gradients"
    assert np.isfinite(pose1).all()

    # ... while a PLAIN trainer created afterwards in the same process
    # keeps the fast path (the old module-global leaked False forever)
    cfg2 = copy.deepcopy(method_configs["k-planes-static"])
    cfg2.max_num_iterations = 1
    cfg2.output_dir = tmp_path / "out2"
    cfg2.pipeline.model = dataclasses.replace(cfg2.pipeline.model, **SMALL)
    cfg2.pipeline.datamanager.train_num_rays_per_batch = 64
    cfg2.pipeline.datamanager.dataparser = BlenderDataParserConfig(data=data)
    cfg2.set_timestamp()
    plain = Trainer(cfg2).setup()
    assert plain.model_cfg.sorted_sampler is True


def test_pose_grads_flow_through_hash_encode_when_enabled(tmp_path):
    """The nerfplayer family's detached-input encode fast path MUST stand
    down when a camera optimizer is enabled — pose gradients flow through
    sample positions into the temporal hash encode."""
    import copy

    from soccernerfs_tpu.data.dataparsers.soccer import (
        BroadcaststyleDataParserConfig,
    )
    from soccernerfs_tpu.data.fixtures import make_broadcaststyle_fixture

    data = make_broadcaststyle_fixture(tmp_path / "data", h=12, w=16)

    cfg = copy.deepcopy(method_configs["nerfplayer-nerfacto"])
    cfg.max_num_iterations = 2
    cfg.steps_per_save = 0
    cfg.steps_per_eval_batch = 0
    cfg.steps_per_eval_image = 0
    cfg.steps_per_eval_all_images = 0
    cfg.vis = "none"
    cfg.output_dir = tmp_path / "out"
    cfg.pipeline.model = dataclasses.replace(
        cfg.pipeline.model,
        num_levels=3, log2_hashmap_size=9, temporal_dim=4,
        num_proposal_samples_per_ray=(8, 6), num_nerf_samples_per_ray=4,
        hidden_dim=16, hidden_dim_color=16,
        proposal_net_args_list=(
            {"hidden_dim": 8, "temporal_dim": 4, "log2_hashmap_size": 9,
             "num_levels": 3, "max_res": 16},
            {"hidden_dim": 8, "temporal_dim": 4, "log2_hashmap_size": 9,
             "num_levels": 3, "max_res": 32},
        ),
    )
    dm = cfg.pipeline.datamanager
    dm.train_num_rays_per_batch = 32
    dm.eval_num_rays_per_batch = 16
    dm.train_num_images_to_sample_from = -1
    dm.eval_num_images_to_sample_from = -1
    if hasattr(dm, "pick_mode"):
        dm.pick_mode = "normal"
        dm.iters_to_start_is = 1
    dm.dataparser = BroadcaststyleDataParserConfig(data=data, fps_downsample=1.0)
    dm.camera_optimizer = dataclasses.replace(dm.camera_optimizer, mode="SO3xR3")
    cfg.set_timestamp()

    trainer = Trainer(cfg).setup()
    assert trainer.model_cfg.detached_inputs is False
    pose0 = np.asarray(trainer.state.params["camera_opt"]["pose_adjustment"])
    assert np.all(pose0 == 0)
    trainer.train()
    pose1 = np.asarray(trainer.state.params["camera_opt"]["pose_adjustment"])
    assert np.any(pose1 != 0), "pose adjustments never received gradients"
    assert np.isfinite(pose1).all()
