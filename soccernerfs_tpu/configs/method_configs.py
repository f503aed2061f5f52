"""Method registry (ref: configs/method_configs.py).

Maps method names to fully-specified TrainerConfigs.  Hyperparameters
mirror the reference registry exactly (citations per method); the
``k-planes`` family is the fork's core contribution.
"""
from __future__ import annotations

from typing import Dict

from soccernerfs_tpu.configs.base import PipelineConfig, TrainerConfig, ViewerConfig
from soccernerfs_tpu.core.camera_optimizer import CameraOptimizerConfig
from soccernerfs_tpu.data.datamanager import (
    DynamicDataManagerConfig,
    VanillaDataManagerConfig,
)
from soccernerfs_tpu.data.dataparsers.blender import BlenderDataParserConfig
from soccernerfs_tpu.data.dataparsers.soccer import StadiumDataParserConfig
from soccernerfs_tpu.engine.optimizers import AdamOptimizerConfig, RAdamOptimizerConfig
from soccernerfs_tpu.engine.schedulers import (
    CosineDecaySchedulerConfig,
    ExponentialDecaySchedulerConfig,
)
from soccernerfs_tpu.data.dataparsers.nerfstudio_parser import NerfstudioDataParserConfig
from soccernerfs_tpu.models import kplanes as kplanes_model
from soccernerfs_tpu.models import nerfacto as nerfacto_model
from soccernerfs_tpu.models import nerfplayer_nerfacto as npn_model

method_configs: Dict[str, TrainerConfig] = {}
descriptions = {
    "k-planes": "Dynamic NeRF on multiscale feature planes (fork default).",
    "k-planes-static": "Static 3-plane K-Planes with ISG sampling.",
    "nerfacto": "Hash-grid NeRF with proposal sampling (upstream default).",
    "nerfplayer-nerfacto": "Temporal hash field on the nerfacto backbone.",
}

# K-Planes loss coefficients shared by both fork methods
# (ref: method_configs.py:452-470 & 535-553)
_KPLANES_LOSS_COEF = (
    ("rgb_loss", 1.0),
    ("interlevel_loss", 1.0),
    ("distortion_loss", 0.001),
    ("space_tv_loss", 0.02),
    ("time_smoothness_loss", 1.0),
    ("sparse_transients_loss", 0.001),
    ("space_tv_proposal_loss", 0.02),
    ("time_smoothness_proposal_loss", 1.0),
    ("sparse_transients_proposal_loss", 0.001),
    ("depth_loss", 0.05),
)

# --- k-planes (dynamic; ref: method_configs.py:481-560) --------------------
method_configs["k-planes"] = TrainerConfig(
    method_name="k-planes",
    steps_per_eval_batch=1000,
    steps_per_save=10000,
    save_only_latest_checkpoint=False,
    steps_per_eval_all_images=100000,
    steps_per_eval_image=500,
    max_num_iterations=30000,
    mixed_precision=True,
    pipeline=PipelineConfig(
        datamanager=DynamicDataManagerConfig(
            dataparser=StadiumDataParserConfig(),
            train_num_rays_per_batch=4096,
            eval_num_rays_per_batch=512,
            train_num_images_to_sample_from=2500,
            train_num_times_to_repeat_images=1000,
            eval_num_images_to_sample_from=100,
            eval_num_times_to_repeat_images=5000,
            use_importance_sampling=True,
            is_pixel_ratio=0.15,
            isg=False,
            ist_range=1.0,
            isg_gamma=5e-2,
            iters_to_start_is=2000,
            camera_optimizer=CameraOptimizerConfig(mode="off"),
        ),
        model_name="kplanes",
        model=kplanes_model.Config(
            eval_num_rays_per_chunk=1 << 15,
            multiscale_res=(1, 2, 4, 8, 16),
            spacetime_resolution=(64, 64, 64, 100),
            feature_dim=32,
            concat_features_across_scales=True,
            disable_viewing_dependent=True,
            proposal_net_args_list=(
                {"feature_dim": 8, "resolution": (128, 128, 128, 100)},
                {"feature_dim": 8, "resolution": (256, 256, 256, 100)},
            ),
            sigma_net_layers=1,
            sigma_net_hidden_dim=128,
            rgb_net_layers=2,
            rgb_net_hidden_dim=64,
            num_proposal_samples_per_ray=(256, 128),
            num_nerf_samples_per_ray=64,
            bounded=True,
            loss_coefficients=_KPLANES_LOSS_COEF,
            depth_sigma=0.01,
            is_euclidean_depth=False,
        ),
    ),
    # moment_dtype only changes Adam-moment STORAGE (compute stays f32);
    # convergence-checked vs f32 moments: 22.06 vs 22.05 dB (PERF.md)
    optimizers={
        "proposal_networks": {
            "optimizer": AdamOptimizerConfig(lr=1e-2, eps=1e-12, moment_dtype="bfloat16"),
            "scheduler": CosineDecaySchedulerConfig(
                warm_up_end=512, max_steps=30000, learning_rate_alpha=0
            ),
        },
        "fields": {
            "optimizer": AdamOptimizerConfig(lr=1e-2, eps=1e-12, moment_dtype="bfloat16"),
            "scheduler": CosineDecaySchedulerConfig(
                warm_up_end=512, max_steps=30000, learning_rate_alpha=0
            ),
        },
    },
    viewer=ViewerConfig(num_rays_per_chunk=1 << 16),
    vis="wandb",
)

# --- k-planes-static (ref: method_configs.py:398-479) ----------------------
method_configs["k-planes-static"] = TrainerConfig(
    method_name="k-planes-static",
    steps_per_eval_batch=1000,
    steps_per_save=5000,
    save_only_latest_checkpoint=False,
    steps_per_eval_all_images=100000,
    steps_per_eval_image=500,
    max_num_iterations=20000,
    mixed_precision=True,
    pipeline=PipelineConfig(
        datamanager=DynamicDataManagerConfig(
            dataparser=StadiumDataParserConfig(),
            train_num_rays_per_batch=8192,
            eval_num_rays_per_batch=1024,
            train_num_images_to_sample_from=1000,
            train_num_times_to_repeat_images=2000,
            eval_num_images_to_sample_from=50,
            eval_num_times_to_repeat_images=5000,
            use_importance_sampling=True,
            is_pixel_ratio=0.15,
            isg=True,
            ist_range=0.25,
            iters_to_start_is=2000,
            camera_optimizer=CameraOptimizerConfig(mode="off"),
        ),
        model_name="kplanes",
        model=kplanes_model.Config(
            eval_num_rays_per_chunk=1 << 16,
            multiscale_res=(1, 2, 4, 8, 16),
            spacetime_resolution=(64, 64, 64),
            feature_dim=32,
            concat_features_across_scales=True,
            disable_viewing_dependent=True,
            proposal_net_args_list=(
                {"feature_dim": 8, "resolution": (128, 128, 128)},
                {"feature_dim": 8, "resolution": (256, 256, 256)},
            ),
            sigma_net_layers=1,
            sigma_net_hidden_dim=64,
            rgb_net_layers=2,
            rgb_net_hidden_dim=64,
            num_proposal_samples_per_ray=(256, 128),
            num_nerf_samples_per_ray=64,
            bounded=True,
            loss_coefficients=_KPLANES_LOSS_COEF,
            depth_sigma=0.01,
            is_euclidean_depth=False,
        ),
    ),
    optimizers={
        "proposal_networks": {
            "optimizer": AdamOptimizerConfig(lr=0.01, eps=1e-8, moment_dtype="bfloat16"),
            "scheduler": CosineDecaySchedulerConfig(
                warm_up_end=512, max_steps=20000, learning_rate_alpha=0
            ),
        },
        "fields": {
            "optimizer": AdamOptimizerConfig(lr=0.01, eps=1e-8, moment_dtype="bfloat16"),
            "scheduler": CosineDecaySchedulerConfig(
                warm_up_end=512, max_steps=20000, learning_rate_alpha=0
            ),
        },
    },
    viewer=ViewerConfig(num_rays_per_chunk=1 << 16),
    vis="wandb",
)

# --- nerfacto (upstream default; ref: method_configs.py:93-122) -------------
method_configs["nerfacto"] = TrainerConfig(
    method_name="nerfacto",
    steps_per_eval_batch=500,
    steps_per_save=2000,
    max_num_iterations=30000,
    mixed_precision=True,
    pipeline=PipelineConfig(
        datamanager=VanillaDataManagerConfig(
            dataparser=NerfstudioDataParserConfig(),
            train_num_rays_per_batch=4096,
            eval_num_rays_per_batch=4096,
            camera_optimizer=CameraOptimizerConfig(mode="SO3xR3"),
        ),
        model_name="nerfacto",
        model=nerfacto_model.Config(eval_num_rays_per_chunk=1 << 15),
    ),
    optimizers={
        "proposal_networks": {
            "optimizer": AdamOptimizerConfig(lr=1e-2, eps=1e-15),
            "scheduler": None,
        },
        "fields": {
            "optimizer": AdamOptimizerConfig(lr=1e-2, eps=1e-15),
            "scheduler": None,
        },
        "camera_opt": {
            "optimizer": AdamOptimizerConfig(lr=6e-4, eps=1e-8, weight_decay=1e-2),
            "scheduler": None,
        },
    },
    viewer=ViewerConfig(num_rays_per_chunk=1 << 15),
    vis="viewer",
)

# --- nerfplayer-nerfacto (fork method; ref: method_configs.py:616-660) ------
method_configs["nerfplayer-nerfacto"] = TrainerConfig(
    method_name="nerfplayer-nerfacto",
    steps_per_eval_batch=1000,
    steps_per_eval_all_images=0,
    steps_per_eval_image=500,
    steps_per_save=10000,
    save_only_latest_checkpoint=False,
    max_num_iterations=30000,
    mixed_precision=True,
    pipeline=PipelineConfig(
        datamanager=DynamicDataManagerConfig(
            dataparser=StadiumDataParserConfig(),
            train_num_rays_per_batch=4096,
            eval_num_rays_per_batch=1024,
            train_num_images_to_sample_from=3000,
            train_num_times_to_repeat_images=1000,
            eval_num_images_to_sample_from=50,
            eval_num_times_to_repeat_images=5000,
            use_importance_sampling=True,
            is_pixel_ratio=0.15,
            isg=False,
            ist_range=1.0,
            iters_to_start_is=3000,
            camera_optimizer=CameraOptimizerConfig(mode="off"),
        ),
        model_name="nerfplayer_nerfacto",
        model=npn_model.Config(
            disable_scene_contraction=True,
            eval_num_rays_per_chunk=1 << 15,
            log2_hashmap_size=19,
            temporal_dim=64,
            temporal_tv_weight=1.0,
        ),
    ),
    optimizers={
        "proposal_networks": {
            "optimizer": AdamOptimizerConfig(lr=1e-2, eps=1e-12),
            "scheduler": CosineDecaySchedulerConfig(
                warm_up_end=512, max_steps=30000, learning_rate_alpha=0
            ),
        },
        "fields": {
            "optimizer": AdamOptimizerConfig(lr=1e-2, eps=1e-12),
            "scheduler": CosineDecaySchedulerConfig(
                warm_up_end=512, max_steps=30000, learning_rate_alpha=0
            ),
        },
    },
    viewer=ViewerConfig(num_rays_per_chunk=65536),
    vis="wandb",
)

from soccernerfs_tpu.models import nerfplayer as nerfplayer_model
from soccernerfs_tpu.models import nerfplayer_ngp as npngp_model
from soccernerfs_tpu.models import instant_ngp as ingp_model

descriptions.update({
    "nerfplayer": "Full NeRFPlayer: static/deform/new decomposition (fork).",
    "nerfplayer-ngp": "NeRFPlayer with occupancy-grid NGP backbone.",
    "instant-ngp": "Occupancy-grid volumetric NeRF (upstream).",
    "instant-ngp-bounded": "Instant-NGP tuned for bounded dynamic scenes (fork).",
})

# --- nerfplayer (fork full decomposition; ref: method_configs.py:562-614) ---
method_configs["nerfplayer"] = TrainerConfig(
    method_name="nerfplayer",
    steps_per_eval_batch=1000,
    steps_per_eval_all_images=0,
    steps_per_eval_image=500,
    steps_per_save=10000,
    save_only_latest_checkpoint=False,
    max_num_iterations=30000,
    mixed_precision=True,
    pipeline=PipelineConfig(
        datamanager=DynamicDataManagerConfig(
            dataparser=StadiumDataParserConfig(),
            camera_optimizer=CameraOptimizerConfig(mode="off"),
            train_num_rays_per_batch=4096,
            eval_num_rays_per_batch=1024,
            train_num_images_to_sample_from=3000,
            train_num_times_to_repeat_images=1000,
            eval_num_images_to_sample_from=50,
            eval_num_times_to_repeat_images=5000,
            use_importance_sampling=True,
            is_pixel_ratio=0.1,
            isg=False,
            ist_range=0.25,
            iters_to_start_is=3000,
        ),
        model_name="nerfplayer",
        model=nerfplayer_model.Config(
            disable_scene_contraction=True,
            eval_num_rays_per_chunk=1 << 15,
            log2_hashmap_size=18,
            temporal_dim=64,
            depth_weight=0.0,
            depth_sigma=0.01,
            prob_reg_loss_mult=0.1,
            distortion_loss_mult=0.001,
            temporal_tv_weight=1.0,
        ),
    ),
    optimizers={
        "proposal_networks": {
            "optimizer": AdamOptimizerConfig(lr=1e-2, eps=1e-6),
            "scheduler": CosineDecaySchedulerConfig(
                warm_up_end=512, max_steps=30000, learning_rate_alpha=0
            ),
        },
        "fields": {
            "optimizer": AdamOptimizerConfig(lr=1e-2, eps=1e-6),
            "scheduler": CosineDecaySchedulerConfig(
                warm_up_end=512, max_steps=30000, learning_rate_alpha=0
            ),
        },
    },
    viewer=ViewerConfig(num_rays_per_chunk=64000),
    vis="wandb",
)

# --- nerfplayer-ngp (ref: method_configs.py:662-698) ------------------------
method_configs["nerfplayer-ngp"] = TrainerConfig(
    method_name="nerfplayer-ngp",
    steps_per_eval_batch=1000,
    steps_per_eval_image=500,
    steps_per_eval_all_images=0,
    steps_per_save=5000,
    max_num_iterations=30000,
    mixed_precision=True,
    pipeline=PipelineConfig(
        datamanager=DynamicDataManagerConfig(
            dataparser=StadiumDataParserConfig(),
            train_num_rays_per_batch=8192,
            eval_num_rays_per_batch=4096,
            train_num_images_to_sample_from=500,
            train_num_times_to_repeat_images=2000,
            eval_num_images_to_sample_from=50,
            eval_num_times_to_repeat_images=5000,
            use_importance_sampling=True,
        ),
        model_name="nerfplayer_ngp",
        model=npngp_model.Config(
            eval_num_rays_per_chunk=8192,
            contraction_type="aabb",
            render_step_size=0.001,
            max_num_samples_per_ray=48,
            near_plane=0.01,
            temporal_tv_weight=0.05,
        ),
        dynamic_batch=True,
    ),
    optimizers={
        "fields": {
            "optimizer": AdamOptimizerConfig(lr=1e-2, eps=1e-12),
            "scheduler": None,
        }
    },
    viewer=ViewerConfig(num_rays_per_chunk=64000),
    vis="viewer",
)

# --- instant-ngp (upstream; ref: method_configs.py:197-215) -----------------
method_configs["instant-ngp"] = TrainerConfig(
    method_name="instant-ngp",
    steps_per_eval_batch=500,
    steps_per_save=2000,
    max_num_iterations=30000,
    mixed_precision=True,
    pipeline=PipelineConfig(
        datamanager=VanillaDataManagerConfig(
            dataparser=NerfstudioDataParserConfig(), train_num_rays_per_batch=8192
        ),
        model_name="instant_ngp",
        model=ingp_model.Config(eval_num_rays_per_chunk=8192),
        dynamic_batch=True,
    ),
    optimizers={
        "fields": {
            "optimizer": AdamOptimizerConfig(lr=1e-2, eps=1e-15),
            "scheduler": None,
        }
    },
    viewer=ViewerConfig(num_rays_per_chunk=64000),
    vis="viewer",
)

# --- instant-ngp-bounded (fork-tuned; ref: method_configs.py:217-248) -------
method_configs["instant-ngp-bounded"] = TrainerConfig(
    method_name="instant-ngp-bounded",
    steps_per_eval_batch=500,
    steps_per_save=2000,
    max_num_iterations=30000,
    mixed_precision=True,
    pipeline=PipelineConfig(
        datamanager=DynamicDataManagerConfig(
            dataparser=StadiumDataParserConfig(),
            train_num_rays_per_batch=8192,
            use_importance_sampling=True,
        ),
        model_name="instant_ngp",
        model=ingp_model.Config(
            eval_num_rays_per_chunk=8192,
            contraction_type="aabb",
            render_step_size=0.001,
            max_num_samples_per_ray=48,
            near_plane=0.01,
            background_color="black",
        ),
        dynamic_batch=True,
    ),
    optimizers={
        "fields": {
            "optimizer": AdamOptimizerConfig(lr=1e-2, eps=1e-15),
            "scheduler": None,
        }
    },
    viewer=ViewerConfig(num_rays_per_chunk=64000),
    vis="viewer",
)

from soccernerfs_tpu.models import vanilla_nerf as vnerf_model
from soccernerfs_tpu.models import mipnerf as mipnerf_model
from soccernerfs_tpu.models import tensorf as tensorf_model
from soccernerfs_tpu.data.dataparsers.dnerf import DNeRFDataParserConfig

descriptions.update({
    "vanilla-nerf": "Original NeRF with coarse/fine MLPs.",
    "mipnerf": "mip-NeRF with integrated positional encoding.",
    "tensorf": "TensoRF factorized-grid NeRF with coarse-to-fine upsampling.",
    "dnerf": "Vanilla NeRF on the D-NeRF dynamic blender format.",
})

# --- vanilla-nerf (ref: method_configs.py:280-305) --------------------------
method_configs["vanilla-nerf"] = TrainerConfig(
    method_name="vanilla-nerf",
    pipeline=PipelineConfig(
        datamanager=VanillaDataManagerConfig(dataparser=BlenderDataParserConfig()),
        model_name="vanilla_nerf",
        model=vnerf_model.Config(),
    ),
    optimizers={
        "fields": {
            "optimizer": RAdamOptimizerConfig(lr=5e-4, eps=1e-08),
            "scheduler": None,
        },
    },
    vis="viewer",
)

# --- dnerf (ref: method_configs.py:330-352) ---------------------------------
method_configs["dnerf"] = TrainerConfig(
    method_name="dnerf",
    pipeline=PipelineConfig(
        datamanager=VanillaDataManagerConfig(dataparser=DNeRFDataParserConfig()),
        model_name="vanilla_nerf",
        model=vnerf_model.Config(),
    ),
    optimizers={
        "fields": {
            "optimizer": RAdamOptimizerConfig(lr=5e-4, eps=1e-08),
            "scheduler": None,
        },
    },
    vis="viewer",
)

# --- mipnerf (ref: method_configs.py:251-270) -------------------------------
method_configs["mipnerf"] = TrainerConfig(
    method_name="mipnerf",
    pipeline=PipelineConfig(
        datamanager=VanillaDataManagerConfig(
            dataparser=NerfstudioDataParserConfig(), train_num_rays_per_batch=1024
        ),
        model_name="mipnerf",
        model=mipnerf_model.Config(eval_num_rays_per_chunk=1024),
    ),
    optimizers={
        "fields": {
            "optimizer": RAdamOptimizerConfig(lr=5e-4, eps=1e-08),
            "scheduler": None,
        },
    },
    vis="viewer",
)

# --- tensorf (ref: method_configs.py:307-328) -------------------------------
method_configs["tensorf"] = TrainerConfig(
    method_name="tensorf",
    max_num_iterations=30000,
    mixed_precision=False,
    pipeline=PipelineConfig(
        datamanager=VanillaDataManagerConfig(
            dataparser=BlenderDataParserConfig(),
            train_num_rays_per_batch=4096,
            eval_num_rays_per_batch=4096,
        ),
        model_name="tensorf",
        model=tensorf_model.Config(),
    ),
    optimizers={
        "fields": {
            "optimizer": AdamOptimizerConfig(lr=0.001),
            "scheduler": ExponentialDecaySchedulerConfig(lr_final=0.0001, max_steps=30000),
        },
        "encodings": {
            "optimizer": AdamOptimizerConfig(lr=0.02),
            "scheduler": ExponentialDecaySchedulerConfig(lr_final=0.002, max_steps=30000),
        },
    },
    viewer=ViewerConfig(num_rays_per_chunk=1 << 15),
    vis="viewer",
)

from soccernerfs_tpu.models import depth_nerfacto as depth_nerfacto_model

descriptions["depth-nerfacto"] = "Nerfacto with DS-NeRF depth supervision."

# --- depth-nerfacto (ref: method_configs.py:124-153) ------------------------
method_configs["depth-nerfacto"] = TrainerConfig(
    method_name="depth-nerfacto",
    steps_per_eval_batch=500,
    steps_per_save=2000,
    max_num_iterations=30000,
    mixed_precision=True,
    pipeline=PipelineConfig(
        datamanager=DynamicDataManagerConfig(
            dataparser=NerfstudioDataParserConfig(),
            train_num_rays_per_batch=4096,
            eval_num_rays_per_batch=4096,
            use_importance_sampling=False,
            camera_optimizer=CameraOptimizerConfig(mode="SO3xR3"),
        ),
        model_name="depth_nerfacto",
        model=depth_nerfacto_model.Config(eval_num_rays_per_chunk=1 << 15),
    ),
    optimizers={
        "proposal_networks": {
            "optimizer": AdamOptimizerConfig(lr=1e-2, eps=1e-15),
            "scheduler": None,
        },
        "fields": {
            "optimizer": AdamOptimizerConfig(lr=1e-2, eps=1e-15),
            "scheduler": None,
        },
        "camera_opt": {
            "optimizer": AdamOptimizerConfig(lr=6e-4, eps=1e-8, weight_decay=1e-2),
            "scheduler": None,
        },
    },
    viewer=ViewerConfig(num_rays_per_chunk=1 << 15),
    vis="viewer",
)

from soccernerfs_tpu.models import nerfplayer_ngp_complete as npngpc_model

descriptions["nerfplayer-ngp-complete"] = (
    "NGP backbone with the full static/deform/new decomposition (fork)."
)

# --- nerfplayer-ngp-complete (fork; model at
# models/nerfplayer_ngp_complete.py — the reference ships the model
# without a registry entry; registered here for direct use) -----------------
method_configs["nerfplayer-ngp-complete"] = TrainerConfig(
    method_name="nerfplayer-ngp-complete",
    steps_per_eval_batch=1000,
    steps_per_eval_image=500,
    steps_per_eval_all_images=0,
    steps_per_save=5000,
    max_num_iterations=30000,
    mixed_precision=True,
    pipeline=PipelineConfig(
        datamanager=DynamicDataManagerConfig(
            dataparser=StadiumDataParserConfig(),
            train_num_rays_per_batch=8192,
            eval_num_rays_per_batch=4096,
            use_importance_sampling=True,
        ),
        model_name="nerfplayer_ngp_complete",
        model=npngpc_model.Config(
            eval_num_rays_per_chunk=8192,
            contraction_type="aabb",
            render_step_size=0.001,
            max_num_samples_per_ray=48,
            near_plane=0.01,
            temporal_tv_weight=0.05,
        ),
        dynamic_batch=True,
    ),
    optimizers={
        "fields": {
            "optimizer": AdamOptimizerConfig(lr=1e-2, eps=1e-12),
            "scheduler": None,
        }
    },
    viewer=ViewerConfig(num_rays_per_chunk=64000),
    vis="viewer",
)

from soccernerfs_tpu.data.datamanager import SemanticDataManagerConfig
from soccernerfs_tpu.data.dataparsers.sitcoms3d import Sitcoms3DDataParserConfig
from soccernerfs_tpu.models import neus as neus_model
from soccernerfs_tpu.models import semantic_nerfw as semantic_model

descriptions.update({
    "semantic-nerfw": "Nerfacto with a semantic segmentation head (Sitcoms3D).",
    "neus": "NeuS SDF surface reconstruction with eikonal regularization.",
})

# --- semantic-nerfw (ref: method_configs.py:270-280) ------------------------
method_configs["semantic-nerfw"] = TrainerConfig(
    method_name="semantic-nerfw",
    steps_per_eval_batch=500,
    steps_per_save=2000,
    max_num_iterations=30000,
    mixed_precision=True,
    pipeline=PipelineConfig(
        datamanager=SemanticDataManagerConfig(
            dataparser=Sitcoms3DDataParserConfig(),
            train_num_rays_per_batch=4096,
            eval_num_rays_per_batch=8192,
        ),
        model_name="semantic_nerfw",
        model=semantic_model.Config(eval_num_rays_per_chunk=1 << 16),
    ),
    optimizers={
        "proposal_networks": {
            "optimizer": AdamOptimizerConfig(lr=1e-2, eps=1e-15),
            "scheduler": None,
        },
        "fields": {
            "optimizer": AdamOptimizerConfig(lr=1e-2, eps=1e-15),
            "scheduler": None,
        },
    },
    viewer=ViewerConfig(num_rays_per_chunk=1 << 16),
    vis="viewer",
)

# --- neus (ref: method_configs.py neus entry) -------------------------------
method_configs["neus"] = TrainerConfig(
    method_name="neus",
    steps_per_eval_batch=500,
    steps_per_save=2000,
    max_num_iterations=100000,
    mixed_precision=False,
    pipeline=PipelineConfig(
        datamanager=VanillaDataManagerConfig(
            dataparser=NerfstudioDataParserConfig(),
            train_num_rays_per_batch=1024,
            eval_num_rays_per_batch=1024,
        ),
        model_name="neus",
        model=neus_model.Config(eval_num_rays_per_chunk=1024),
    ),
    optimizers={
        "fields": {
            "optimizer": AdamOptimizerConfig(lr=5e-4, eps=1e-15),
            "scheduler": CosineDecaySchedulerConfig(
                warm_up_end=500, learning_rate_alpha=0.05, max_steps=300000
            ),
        },
    },
    viewer=ViewerConfig(num_rays_per_chunk=1 << 12),
    vis="viewer",
)

# external plugin methods (ref: method_configs.py:700-702)
from soccernerfs_tpu.plugins import discover_methods

_ext_methods, _ext_descriptions = discover_methods()
method_configs.update(_ext_methods)
descriptions.update(_ext_descriptions)
