"""Every registered method trains 2 steps on a tiny fixture on CPU.

The reference's flagship smoke test iterates all registry methods on a
1-image Blender fixture with most CUDA methods blacklisted
(ref: tests/test_train.py:18-74).  The TPU build has no CUDA-gated
methods, so every method runs — dynamic methods on the broadcaststyle
fixture (times needed), static ones on the blender fixture.
"""
import dataclasses

import pytest

from soccernerfs_tpu.configs.method_configs import method_configs
from soccernerfs_tpu.data.dataparsers.blender import BlenderDataParserConfig
from soccernerfs_tpu.data.dataparsers.soccer import BroadcaststyleDataParserConfig
from soccernerfs_tpu.data.dataparsers.sitcoms3d import Sitcoms3DDataParserConfig
from soccernerfs_tpu.data.fixtures import (
    make_blender_fixture,
    make_broadcaststyle_fixture,
    make_sitcoms3d_fixture,
)
from soccernerfs_tpu.engine.trainer import Trainer

# per-model-config shrink overrides keyed by model_name
SMALL_MODEL = {
    "kplanes": dict(
        spacetime_resolution=(8, 8, 8, 4),
        multiscale_res=(1, 2),
        feature_dim=4,
        proposal_net_args_list=(
            {"feature_dim": 2, "resolution": (8, 8, 8, 4)},
            {"feature_dim": 2, "resolution": (16, 16, 16, 4)},
        ),
        num_proposal_samples_per_ray=(8, 6),
        num_nerf_samples_per_ray=4,
        sigma_net_hidden_dim=16,
        rgb_net_hidden_dim=16,
    ),
    "nerfacto": dict(
        num_levels=3, max_res=32, log2_hashmap_size=9,
        num_proposal_samples_per_ray=(8, 6), num_nerf_samples_per_ray=4,
        hidden_dim=16, hidden_dim_color=16,
        proposal_net_args_list=(
            {"hidden_dim": 8, "log2_hashmap_size": 9, "num_levels": 3, "max_res": 16},
            {"hidden_dim": 8, "log2_hashmap_size": 9, "num_levels": 3, "max_res": 32},
        ),
    ),
    "nerfplayer_nerfacto": dict(
        num_levels=3, log2_hashmap_size=9, temporal_dim=4,
        num_proposal_samples_per_ray=(8, 6), num_nerf_samples_per_ray=4,
        hidden_dim=16, hidden_dim_color=16,
        proposal_net_args_list=(
            {"hidden_dim": 8, "temporal_dim": 4, "log2_hashmap_size": 9, "num_levels": 3, "max_res": 16},
            {"hidden_dim": 8, "temporal_dim": 4, "log2_hashmap_size": 9, "num_levels": 3, "max_res": 32},
        ),
    ),
    "nerfplayer": dict(
        num_levels=3, log2_hashmap_size=9, temporal_dim=4,
        num_proposal_samples_per_ray=(8, 6), num_nerf_samples_per_ray=4,
        proposal_net_args_list=(
            {"hidden_dim": 8, "temporal_dim": 4, "log2_hashmap_size": 9, "num_levels": 3, "max_res": 16},
            {"hidden_dim": 8, "temporal_dim": 4, "log2_hashmap_size": 9, "num_levels": 3, "max_res": 32},
        ),
    ),
    "nerfplayer_ngp": dict(
        num_levels=3, log2_hashmap_size=9, temporal_dim=4, max_res=32,
        grid_resolution=8, max_num_samples_per_ray=6, num_probes_per_ray=16,
    ),
    "instant_ngp": dict(
        max_res=32, log2_hashmap_size=9, grid_resolution=8,
        max_num_samples_per_ray=6, num_probes_per_ray=16,
    ),
    "vanilla_nerf": dict(num_coarse_samples=6, num_importance_samples=6),
    "mipnerf": dict(num_coarse_samples=6, num_importance_samples=6),
    "tensorf": dict(
        init_resolution=8, final_resolution=16, upsampling_iters=(1,),
        num_samples=6, num_uniform_samples=12,
        num_den_components=2, num_color_components=3, appearance_dim=3,
    ),
}

SMALL_MODEL["depth_nerfacto"] = SMALL_MODEL["nerfacto"]
from soccernerfs_tpu.fields.sdf import SDFFieldConfig  # noqa: E402

SMALL_MODEL["neus"] = dict(
    num_samples=6, num_samples_importance=4, num_upsample_steps=2,
    sdf_field=SDFFieldConfig(num_layers=3, hidden_dim=16, geo_feat_dim=8,
                             num_layers_color=2, hidden_dim_color=16),
)
SMALL_MODEL["nerfplayer_ngp_complete"] = dict(
    num_levels=3, log2_hashmap_size=9, temporal_dim=4,
    grid_resolution=8, max_num_samples_per_ray=6, num_probes_per_ray=16,
)
SMALL_MODEL["semantic_nerfw"] = dict(
    num_semantic_classes=3, **SMALL_MODEL["nerfacto"]
)

DYNAMIC_MODELS = {"kplanes", "nerfplayer", "nerfplayer_nerfacto", "nerfplayer_ngp", "nerfplayer_ngp_complete"}


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    return {
        "broadcast": make_broadcaststyle_fixture(
            tmp_path_factory.mktemp("bstyle"), num_cameras=3, num_steps=3, h=12, w=16
        ),
        "blender": make_blender_fixture(tmp_path_factory.mktemp("blender"), h=12, w=16),
        "sitcoms3d": make_sitcoms3d_fixture(
            tmp_path_factory.mktemp("sitcoms3d"), num_cameras=3, h=12, w=16
        ),
    }


@pytest.mark.parametrize("method", sorted(method_configs))
def test_method_trains_two_steps(method, fixtures, tmp_path):
    import copy

    config = copy.deepcopy(method_configs[method])
    model_name = config.pipeline.model_name
    config.pipeline.model = dataclasses.replace(
        config.pipeline.model, **SMALL_MODEL[model_name]
    )
    dm = config.pipeline.datamanager
    dm.train_num_rays_per_batch = 32
    dm.eval_num_rays_per_batch = 16
    dm.train_num_images_to_sample_from = -1
    dm.eval_num_images_to_sample_from = -1
    if hasattr(dm, "pick_mode"):
        dm.pick_mode = "normal"
        dm.iters_to_start_is = 1
    if model_name in DYNAMIC_MODELS:
        dm.dataparser = BroadcaststyleDataParserConfig(
            data=fixtures["broadcast"], fps_downsample=1.0
        )
    elif method == "semantic-nerfw":
        dm.dataparser = Sitcoms3DDataParserConfig(data=fixtures["sitcoms3d"])
    else:
        dm.dataparser = BlenderDataParserConfig(data=fixtures["blender"])

    config.max_num_iterations = 2
    config.steps_per_save = 0
    config.steps_per_eval_batch = 0
    config.steps_per_eval_image = 0
    config.steps_per_eval_all_images = 0
    config.vis = "none"
    config.output_dir = tmp_path
    config.set_timestamp()

    trainer = Trainer(config).setup()
    trainer.train()
