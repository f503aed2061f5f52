"""K-Planes model — proposal-sampled dynamic NeRF on multiscale feature planes.

Functional re-design of the reference's ``models/kplanes.py``: the torch
Module becomes (Config, init, get_outputs, get_metrics_dict, get_loss_dict)
pure functions composed inside one jitted train step.  Stateful training
callbacks (proposal anneal / update schedule, models/kplanes.py:318-347)
become the pure schedule functions ``proposal_anneal`` and
``proposal_update_decision``.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from soccernerfs_tpu.core.math import intersect_aabb
from soccernerfs_tpu.core.rays import RayBundle, RaySamples
from soccernerfs_tpu.fields.kplanes import (
    KPlanesDensityFieldConfig,
    KPlanesFieldConfig,
    init_kplanes_density_field,
    init_kplanes_field,
    kplanes_density_field_density,
    kplanes_field_forward,
    pack_grids_for_render,
)
from soccernerfs_tpu.ops import losses as L
from soccernerfs_tpu.ops.rendering import (
    render_accumulation,
    render_depth,
    render_median_rgb,
    render_rgb,
)
from soccernerfs_tpu.ops.samplers import proposal_sample


@dataclass(frozen=True)
class Config:
    """K-Planes model config (ref: models/kplanes.py:67-177).

    Field names and defaults mirror KPlanesModelConfig so the CLI surface
    stays compatible.
    """

    near_plane: float = 0.05
    far_plane: float = 1000.0
    bounded: bool = True
    spacetime_resolution: Tuple[int, ...] = (64, 64, 64, 50)
    feature_dim: int = 32
    multiscale_res: Tuple[int, ...] = (1, 2, 4, 8)
    concat_features_across_scales: bool = True
    linear_decoder: bool = False
    linear_decoder_layers: int = 1
    sigma_net_layers: int = 1
    sigma_net_hidden_dim: int = 64
    rgb_net_layers: int = 2
    rgb_net_hidden_dim: int = 64
    background_color_train: str = "random"
    background_color_eval: str = "last_sample"
    num_proposal_iterations: int = 2
    use_same_proposal_network: bool = False
    proposal_net_args_list: Tuple[Dict, ...] = (
        {"feature_dim": 8, "resolution": (128, 128, 128, 150)},
        {"feature_dim": 8, "resolution": (256, 256, 256, 150)},
    )
    num_nerf_samples_per_ray: int = 48
    num_proposal_samples_per_ray: Tuple[int, ...] = (256, 128)
    use_single_jitter: bool = False
    proposal_warmup: int = 5000
    proposal_update_every: int = 5
    use_proposal_weight_anneal: bool = True
    proposal_weights_anneal_max_num_iters: int = 1000
    proposal_weights_anneal_slope: float = 10.0
    use_appearance_embedding: bool = False
    appearance_embedding_dim: int = 0
    disable_viewing_dependent: bool = False
    loss_coefficients: Tuple[Tuple[str, float], ...] = (
        ("rgb_loss", 1.0),
        ("interlevel_loss", 1.0),
        ("distortion_loss", 0.001),
        ("space_tv_loss", 0.0002),
        ("time_smoothness_loss", 0.001),
        ("sparse_transients_loss", 0.0001),
        ("space_tv_proposal_loss", 0.0002),
        ("time_smoothness_proposal_loss", 0.00001),
        ("sparse_transients_proposal_loss", 0.0001),
        ("depth_loss", 0.05),
    )
    is_euclidean_depth: bool = True
    depth_sigma: float = 0.01
    should_decay_sigma: bool = False
    starting_depth_sigma: float = 0.2
    sigma_decay_rate: float = 0.99985
    depth_loss_type: str = "ds_nerf"
    freeze_time_planes: bool = False
    freeze_space_planes: bool = False
    eval_num_rays_per_chunk: int = 1 << 15
    # TPU sorted-sampler gate: detaches sample positions, so the Trainer
    # flips it off when the camera optimizer needs pose gradients
    # (engine/trainer.py); plumbed to the field configs below.
    sorted_sampler: bool = True

    def __post_init__(self):
        # tuples keep the config hashable for jit static args
        def freeze(v):
            if isinstance(v, dict):
                return tuple(sorted((k, freeze(x)) for k, x in v.items()))
            if isinstance(v, (list, tuple)):
                return tuple(freeze(x) for x in v)
            return v

        object.__setattr__(
            self, "proposal_net_args_list", freeze(self.proposal_net_args_list)
        )
        if isinstance(self.loss_coefficients, dict):
            object.__setattr__(
                self, "loss_coefficients", tuple(self.loss_coefficients.items())
            )
        for name in (
            "spacetime_resolution",
            "multiscale_res",
            "num_proposal_samples_per_ray",
        ):
            object.__setattr__(self, name, tuple(getattr(self, name)))

    @property
    def loss_coef(self) -> Dict[str, float]:
        return dict(self.loss_coefficients)

    @property
    def has_time(self) -> bool:
        return len(self.spacetime_resolution) == 4

    def field_config(self) -> KPlanesFieldConfig:
        return KPlanesFieldConfig(
            spacetime_resolution=self.spacetime_resolution,
            feat_dim=self.feature_dim,
            multiscale_res=self.multiscale_res,
            concat_features_across_scales=self.concat_features_across_scales,
            linear_decoder=self.linear_decoder,
            linear_decoder_layers=self.linear_decoder_layers,
            use_appearance_embedding=self.use_appearance_embedding,
            appearance_dim=self.appearance_embedding_dim,
            disable_viewing_dependent=self.disable_viewing_dependent,
            sigma_net_layers=self.sigma_net_layers,
            sigma_net_hidden_dim=self.sigma_net_hidden_dim,
            rgb_net_layers=self.rgb_net_layers,
            rgb_net_hidden_dim=self.rgb_net_hidden_dim,
            bounded=self.bounded,
            freeze_time_planes=self.freeze_time_planes,
            freeze_space_planes=self.freeze_space_planes,
            sorted_sampler=self.sorted_sampler,
        )

    def density_field_configs(self):
        cfgs = []
        n = self.num_proposal_iterations
        arg_list = [dict(a) for a in self.proposal_net_args_list]
        if self.use_same_proposal_network:
            arg_list = arg_list[:1]
            indices = [0] * n
        else:
            indices = [min(i, len(arg_list) - 1) for i in range(n)]
        built = {}
        for i in indices:
            if i not in built:
                a = arg_list[i]
                built[i] = KPlanesDensityFieldConfig(
                    resolution=tuple(a["resolution"]),
                    feature_dim=a["feature_dim"],
                    linear_decoder=self.linear_decoder,
                    bounded=self.bounded,
                    freeze_time_planes=self.freeze_time_planes,
                    freeze_space_planes=self.freeze_space_planes,
                    sorted_sampler=self.sorted_sampler,
                )
            cfgs.append((i, built[i]))
        return cfgs


def init(rng: jax.Array, cfg: Config, num_train_data: int = 0) -> dict:
    """Build the model param pytree, split into the reference's two
    optimizer groups (ref: models/kplanes.py:311-316)."""
    field_cfg = KPlanesFieldConfig(
        **{
            **cfg.field_config().__dict__,
            "num_images": num_train_data,
        }
    )
    k_field, k_prop = jax.random.split(rng)
    fields = init_kplanes_field(k_field, field_cfg)

    prop_params = {}
    prop_keys = jax.random.split(k_prop, cfg.num_proposal_iterations)
    for (idx, dcfg), key in zip(cfg.density_field_configs(), prop_keys):
        name = f"proposal_{idx}"
        if name not in prop_params:
            prop_params[name] = init_kplanes_density_field(key, dcfg)
    return {"fields": fields, "proposal_networks": prop_params}


def param_count(params: dict) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def prepare_render_params(cfg: Config, params: dict) -> dict:
    """Quad-pack every plane table (field + proposals) to bf16 once per
    parameter snapshot — whole-image rendering reuses the packed tables
    across chunks instead of repacking ~1.8 GB per chunk (PERF.md r3).
    EVAL ONLY: the packed copies carry no gradient link to the grids."""
    return {
        **params,
        "fields": pack_grids_for_render(params["fields"]),
        "proposal_networks": {
            k: pack_grids_for_render(v)
            for k, v in params["proposal_networks"].items()
        },
    }


def proposal_anneal(cfg: Config, step: jnp.ndarray) -> jnp.ndarray:
    """Proposal weight anneal schedule (ref: models/kplanes.py:326-331,
    mip-NeRF 360 eq. 18 bias)."""
    if not cfg.use_proposal_weight_anneal:
        return jnp.asarray(1.0)
    n = cfg.proposal_weights_anneal_max_num_iters
    b = cfg.proposal_weights_anneal_slope
    x = jnp.clip(step / n, 0.0, 1.0)
    return (b * x) / ((b - 1.0) * x + 1.0)


def proposal_update_decision(
    cfg: Config, step: jnp.ndarray, steps_since_update: jnp.ndarray
):
    """Functional form of ProposalNetworkSampler's update schedule
    (ref: ray_samplers.py:554-557,573,596-597 + models/kplanes.py:254-259).

    Returns (updated, new_steps_since_update): gradients flow into the
    proposal networks only on ``updated`` steps.
    """
    sched = jnp.clip(
        jnp.interp(
            step.astype(jnp.float32),
            jnp.asarray([0.0, float(cfg.proposal_warmup)]),
            jnp.asarray([0.0, float(cfg.proposal_update_every)]),
        ),
        1.0,
        float(cfg.proposal_update_every),
    )
    # The reference increments the counter BEFORE comparing
    # (ray_samplers.py:556-557,573): an update fires every sched+1 steps.
    updated = ((steps_since_update + 1) > sched) | (step < 10)
    new_ssu = jnp.where(updated, 0, steps_since_update + 1)
    return updated, new_ssu


def init_aux(cfg: Config) -> dict:
    """Trainer-threaded schedule state: the ProposalNetworkSampler's
    steps-since-update counter (ref: ray_samplers.py:547-557)."""
    return {"steps_since_update": jnp.asarray(0, jnp.int32)}


def schedules(cfg: Config, step: jnp.ndarray, aux: dict):
    """Per-step schedule kwargs for get_outputs + updated aux.

    Replaces the reference's BEFORE/AFTER-iteration callbacks
    (models/kplanes.py:318-347) with pure functions of the step.
    """
    anneal = proposal_anneal(cfg, step)
    updated, ssu = proposal_update_decision(cfg, step, aux["steps_since_update"])
    return (
        {"anneal": anneal, "train_proposal_networks": updated},
        {"steps_since_update": ssu},
    )


def host_static_kwargs(cfg: Config, step: int, host_state: dict) -> dict:
    """Host-side (static) proposal-update decision.

    The reference's update schedule wraps the proposal density in
    torch.no_grad() on non-update steps (ray_samplers.py:586-595), which
    truly skips the proposal backward.  A traced boolean can only mask
    the gradient — XLA still executes the proposal scatter-adds (~60% of
    step time, see PERF.md).  Deciding on the host makes the flag a jit
    STATIC argument, so XLA compiles a variant with the proposal backward
    pruned and runs it on ~4/5 steps after warmup.

    Mutates ``host_state['steps_since_update']`` (not checkpointed — the
    reference's counter isn't either).
    """
    ssu = host_state.get("steps_since_update", 0)
    sched = float(
        np.clip(
            np.interp(step, [0, cfg.proposal_warmup], [0, cfg.proposal_update_every]),
            1,
            cfg.proposal_update_every,
        )
    )
    # Counter increments before the comparison, matching the reference
    # (ray_samplers.py:556-557,573) and proposal_update_decision above.
    updated = (ssu + 1) > sched or step < 10
    host_state["steps_since_update"] = 0 if updated else ssu + 1
    return {"train_proposal_networks": bool(updated)}


def set_nears_and_fars(cfg: Config, ray_bundle: RayBundle, aabb, train: bool) -> RayBundle:
    """Collider: AABB intersection when bounded, constant near/far otherwise
    (ref: models/kplanes.py:276-279; scene_colliders.py:47-134)."""
    if cfg.bounded:
        nears, fars = intersect_aabb(
            ray_bundle.origins, ray_bundle.directions, aabb, near_plane=0.0
        )
    else:
        n = ray_bundle.origins.shape[0]
        nears = jnp.full((n,), cfg.near_plane)
        fars = jnp.full((n,), cfg.far_plane)
    return ray_bundle.replace(nears=nears, fars=fars)


def get_outputs(
    cfg: Config,
    params: dict,
    aabb: jnp.ndarray,
    ray_bundle: RayBundle,
    rng: Optional[jax.Array] = None,
    train: bool = True,
    anneal: jnp.ndarray | float = 1.0,
    train_proposal_networks: jnp.ndarray | bool = True,
) -> dict:
    """Forward pass (ref: models/kplanes.py:349-388).

    Proposal-samples the rays with the density fields, evaluates the main
    field, and composites rgb/accumulation/depth/median outputs.  When
    ``train``, the per-level (weights, ray_samples) lists are kept for the
    interlevel/distortion/depth losses.
    """
    if ray_bundle.nears is None or ray_bundle.fars is None:
        ray_bundle = set_nears_and_fars(cfg, ray_bundle, aabb, train)

    dcfgs = cfg.density_field_configs()

    def make_density_fn(idx, dcfg):
        def density_fn(ray_samples: RaySamples):
            positions = ray_samples.get_positions()  # [N, S, 3]
            n, s = positions.shape[:2]
            times = ray_samples.times
            flat_times = (
                jnp.repeat(times, s) if (times is not None and cfg.has_time) else None
            )
            d = kplanes_density_field_density(
                dcfg,
                params["proposal_networks"][f"proposal_{idx}"],
                aabb,
                positions.reshape(-1, 3),
                flat_times,
            )
            return d.reshape(n, s)

        return density_fn

    density_fns = [make_density_fn(idx, dcfg) for idx, dcfg in dcfgs]

    rng_sample, rng_bg = (
        jax.random.split(rng) if rng is not None else (None, None)
    )
    initial_spacing = "uniform" if cfg.bounded else "piecewise"
    ray_samples, weights_list, ray_samples_list = proposal_sample(
        ray_bundle,
        density_fns,
        num_proposal_samples_per_ray=cfg.num_proposal_samples_per_ray,
        num_nerf_samples_per_ray=cfg.num_nerf_samples_per_ray,
        rng=rng_sample,
        stratified=train,
        single_jitter=cfg.use_single_jitter,
        initial_spacing=initial_spacing,
        anneal=anneal,
        train_proposal_networks=train_proposal_networks,
    )

    field_cfg = cfg.field_config()
    positions = ray_samples.get_positions()
    n, s = positions.shape[:2]
    flat_times = (
        jnp.repeat(ray_samples.times, s)
        if (ray_samples.times is not None and cfg.has_time)
        else None
    )
    flat_dirs = jnp.broadcast_to(
        ray_samples.directions[:, None, :], (n, s, 3)
    ).reshape(-1, 3)
    flat_cam = (
        jnp.repeat(ray_samples.camera_indices, s)
        if ray_samples.camera_indices is not None
        else None
    )
    density, rgb_samples = kplanes_field_forward(
        field_cfg,
        params["fields"],
        aabb,
        positions.reshape(-1, 3),
        flat_dirs,
        flat_times,
        flat_cam,
        train=train,
    )
    rgb_samples = rgb_samples.reshape(n, s, 3)
    density = density.reshape(n, s)

    weights = ray_samples.get_weights(density)
    weights_list = weights_list + [weights]
    ray_samples_list = ray_samples_list + [ray_samples]

    background = cfg.background_color_train if train else cfg.background_color_eval
    rgb = render_rgb(rgb_samples, weights, background_color=background, rng=rng_bg, train=train)
    accumulation = render_accumulation(weights)
    depth = render_depth(weights, ray_samples)
    median_rgb = render_median_rgb(rgb_samples, weights)

    outputs = {
        "rgb": rgb,
        "accumulation": accumulation,
        "depth": depth,
        "median_rgb": median_rgb,
        "weights_list": weights_list,
        "ray_samples_list": ray_samples_list,
    }
    for i in range(cfg.num_proposal_iterations):
        outputs[f"prop_depth_{i}"] = render_depth(weights_list[i], ray_samples_list[i])
    if ray_bundle.directions_norm is not None:
        outputs["directions_norm"] = ray_bundle.directions_norm
    return outputs


def depth_sigma_for_step(cfg: Config, step) -> jnp.ndarray:
    """Optionally exponentially-decayed depth sigma
    (ref: models/kplanes.py:508-515, made a pure function of step)."""
    if not cfg.should_decay_sigma:
        return jnp.asarray(cfg.depth_sigma)
    decayed = cfg.starting_depth_sigma * (cfg.sigma_decay_rate ** step)
    return jnp.maximum(decayed, cfg.depth_sigma)


def get_metrics_dict(cfg: Config, outputs: dict, batch: dict, step=0) -> dict:
    """PSNR + (train) accumulated depth loss (ref: models/kplanes.py:390-412)."""
    metrics = {}
    image = batch["image"]
    mse = jnp.mean((outputs["rgb"] - image) ** 2)
    metrics["psnr"] = -10.0 * jnp.log10(mse)
    if "depth_image" in batch and cfg.loss_coef.get("depth_loss", 0) > 0:
        sigma = depth_sigma_for_step(cfg, step)
        term_depth = batch["depth_image"]
        dn = outputs.get("directions_norm", jnp.ones_like(term_depth))
        total = 0.0
        k = len(outputs["weights_list"])
        for w, rs in zip(outputs["weights_list"], outputs["ray_samples_list"]):
            total += (
                L.depth_loss(
                    w,
                    rs,
                    term_depth,
                    outputs["depth"],
                    sigma,
                    dn,
                    cfg.is_euclidean_depth,
                    cfg.depth_loss_type,
                )
                / k
            )
        metrics["depth_loss"] = total
    return metrics


def get_loss_dict(
    cfg: Config,
    params: dict,
    outputs: dict,
    batch: dict,
    metrics_dict: Optional[dict] = None,
    train: bool = True,
    rng=None,
) -> dict:
    """Scaled loss dict (ref: models/kplanes.py:414-452)."""
    loss_coef = cfg.loss_coef
    image = batch["image"]
    loss_dict = {"rgb_loss": L.mse_loss(image, outputs["rgb"])}

    if train:
        wl, rsl = outputs["weights_list"], outputs["ray_samples_list"]
        if "distortion_loss" in loss_coef:
            loss_dict["distortion_loss"] = L.distortion_loss(wl, rsl)
        if "interlevel_loss" in loss_coef:
            loss_dict["interlevel_loss"] = L.interlevel_loss(wl, rsl)

        ms_grids_nerf = params["fields"]["grids"]
        ms_grids_prop = [
            p["grids"][0] for p in params["proposal_networks"].values()
        ]
        if "space_tv_loss" in loss_coef:
            loss_dict["space_tv_loss"] = L.space_tv_loss(ms_grids_nerf)
        if "space_tv_proposal_loss" in loss_coef and ms_grids_prop:
            loss_dict["space_tv_proposal_loss"] = L.space_tv_loss(ms_grids_prop)
        if cfg.has_time and not cfg.freeze_time_planes:
            if "sparse_transients_loss" in loss_coef:
                loss_dict["sparse_transients_loss"] = L.sparse_transients_loss(ms_grids_nerf)
            if "sparse_transients_proposal_loss" in loss_coef and ms_grids_prop:
                loss_dict["sparse_transients_proposal_loss"] = L.sparse_transients_loss(ms_grids_prop)
            if "time_smoothness_loss" in loss_coef:
                loss_dict["time_smoothness_loss"] = L.time_smoothness_loss(ms_grids_nerf)
            if "time_smoothness_proposal_loss" in loss_coef and ms_grids_prop:
                loss_dict["time_smoothness_proposal_loss"] = L.time_smoothness_loss(ms_grids_prop)

        if "depth_image" in batch and loss_coef.get("depth_loss", 0) > 0:
            assert metrics_dict is not None and "depth_loss" in metrics_dict
            loss_dict["depth_loss"] = metrics_dict["depth_loss"]

    return L.scale_dict(loss_dict, loss_coef)
