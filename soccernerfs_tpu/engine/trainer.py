"""Trainer: one jitted, mesh-sharded train step + host orchestration.

TPU-native re-design of the reference Trainer (ref: engine/trainer.py:90-448).
What was a python loop of module calls + AMP + DDP becomes:

  * ``train_step`` — a single jitted function (donated state) doing
    raygen -> proposal sampling -> field eval -> render -> losses ->
    grads -> optax update.  Data-parallel by construction: the ray batch
    is sharded over the mesh's ``data`` axis, params replicated, XLA
    inserts the grad all-reduce (replaces DDP+NCCL,
    ref: pipelines/base_pipeline.py:244-246, scripts/train.py:124-137).
  * bf16 matmuls with fp32 master weights replace autocast+GradScaler
    (ref: trainer.py:382-409).
  * training callbacks become pure per-step schedule functions threaded
    through ``TrainState.aux`` (ref: engine/callbacks.py).

Host side keeps the reference cadence: eval batch/image every N steps,
checkpoints, rays/s + ETA events, profiler (ref: trainer.py:195-260).
"""
from __future__ import annotations

import functools
import os
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from soccernerfs_tpu import models as model_registry
from soccernerfs_tpu.core.camera_optimizer import (
    apply_camera_optimizer,
    init_camera_optimizer,
)
from soccernerfs_tpu.core.cameras import Cameras, generate_rays, get_image_coords
from soccernerfs_tpu.configs.base import TrainerConfig
from soccernerfs_tpu.engine import checkpoints as ckpt
from soccernerfs_tpu.engine.optimizers import build_optimizers
from soccernerfs_tpu.parallel import mesh as meshlib
from soccernerfs_tpu.utils import profiler, writer
from soccernerfs_tpu.utils.writer import EventName


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar
    aux: Any  # model schedule state


_PIN_TABLE_BYTES = 64 * 1024 * 1024


def _pin_big_table_layouts(tree):
    """Anchor big 2-D tables (hash-grid embeddings, their grads and Adam
    moments) to the unpadded column-major layout on TPU.

    XLA's layout assignment otherwise flips the whole state-update chain
    of the nerfplayer-nerfacto field to row-major {1,0:T(8,128)} — the 66
    channel lanes pad to 128 (1.9x) and params, mu AND nu each
    materialize a 2.72 GB relayout copy, pushing the step to 15.94 G >
    15.75 G HBM (measured; the r3 program paid the same copies and fit
    only by ~0.2 G).  Constraining the GRADIENTS and the UPDATED state
    keeps the optimizer fusion and the donated in/out aliases in the
    natural column-major form; the per-level {1,0}->{0,1} copies of the
    scatter-kernel outputs that remain are ~20x smaller.  Pinning
    column-major inside the encode backward instead was measured
    counterproductive (ops/hash_grid.py NOTE), as was pinning row-major
    anywhere (PERF.md r4 negative results)."""
    if jax.default_backend() == "cpu":
        return tree
    if os.environ.get("SNT_PIN_TABLE_LAYOUTS", "1") == "0":  # ablation
        return tree
    # jax.experimental.layout is an UNSTABLE API (upstream already renamed
    # Layout -> Format once); an API break must degrade to unpinned
    # layouts (slower, correct), not crash the train step on first TPU use
    # — same loud-fallback contract as data/native_loader.py.
    try:
        from jax.experimental import layout

        constrain = layout.with_layout_constraint
        major_to_minor = layout.Layout((1, 0))
    except Exception as e:  # pragma: no cover - exercised on API churn
        import warnings

        warnings.warn(
            "jax.experimental.layout unavailable "
            f"({type(e).__name__}: {e}); big-table layouts left unpinned "
            "— expect extra relayout copies on the nerfplayer family",
            stacklevel=2,
        )
        return tree

    def pin(x):
        if (hasattr(x, "ndim") and x.ndim == 2
                and x.size * x.dtype.itemsize >= _PIN_TABLE_BYTES):
            return constrain(x, major_to_minor)
        return x

    return jax.tree_util.tree_map(pin, tree)


class Trainer:
    """(ref: engine/trainer.py:90-448)."""

    def __init__(self, config: TrainerConfig, test_mode: str = "val"):
        self.config = config
        self.test_mode = test_mode
        self.base_dir = config.get_base_dir()

        meshlib.initialize_distributed(
            config.machine.coordinator,
            config.machine.num_machines,
            config.machine.machine_rank,
        )
        devices = jax.devices()
        if config.machine.num_devices > 0:
            devices = devices[: config.machine.num_devices]
        self.mesh = meshlib.make_data_mesh(devices)

        self.model = model_registry.get_model(config.pipeline.model_name)
        self.model_cfg = config.pipeline.model

        # serializes state handoff between the train loop (which donates
        # the state buffers into the jitted step) and viewer renders
        self._state_lock = __import__("threading").Lock()

        config.seed_everything()

    # ------------------------------------------------------------------
    def setup(self):
        """Build datamanager, params, optimizer, jitted step
        (ref: trainer.py:132-193)."""
        config = self.config
        self.datamanager = config.pipeline.datamanager.setup(
            test_mode=self.test_mode, seed=config.machine.seed
        )
        self.train_cameras: Cameras = self.datamanager.train_cameras
        self.eval_cameras: Cameras = self.datamanager.eval_cameras
        self.aabb = jnp.asarray(self.datamanager.train_dataparser_outputs.scene_box.aabb)
        self.num_train_data = len(self.datamanager.train_dataset)

        rng = jax.random.PRNGKey(config.machine.seed)
        init_rng, self.train_rng = jax.random.split(rng)
        params = self.model.init(init_rng, self.model_cfg, self.num_train_data)

        self.cam_opt_cfg = config.pipeline.datamanager.camera_optimizer
        if self.cam_opt_cfg.mode != "off":
            rng, cam_rng = jax.random.split(rng)
            params["camera_opt"] = init_camera_optimizer(
                cam_rng, self.cam_opt_cfg, self.train_cameras.num_cameras
            )
            # pose gradients flow through sample positions: the sorted
            # plane sampler (which detaches positions) must stand down.
            # Per-instance config replace — other Trainers in the process
            # keep the fast path.
            if getattr(self.model_cfg, "sorted_sampler", False):
                import dataclasses

                self.model_cfg = dataclasses.replace(
                    self.model_cfg, sorted_sampler=False
                )
                print(
                    "[trainer] camera optimizer is on: disabling the sorted "
                    "plane sampler (pose grads need sample positions) — "
                    "expect a slower train step on TPU"
                )
            # same story for the hash-grid families' detached-input
            # encode fast path: pose grads must flow through positions.
            if getattr(self.model_cfg, "detached_inputs", False):
                import dataclasses

                self.model_cfg = dataclasses.replace(
                    self.model_cfg, detached_inputs=False
                )
                print(
                    "[trainer] camera optimizer is on: enabling encode "
                    "input gradients (pose grads flow through sample "
                    "positions) — expect a slower train step on TPU"
                )

        opt_configs = dict(config.optimizers)
        if self.cam_opt_cfg.mode != "off" and "camera_opt" not in opt_configs:
            opt_configs["camera_opt"] = {
                "optimizer": self.cam_opt_cfg_optimizer(),
                "scheduler": None,
            }
        self.optimizer = build_optimizers(opt_configs, tuple(params.keys()))
        self.opt_configs = opt_configs

        aux = self.model.init_aux(self.model_cfg) if hasattr(self.model, "init_aux") else {}
        state = TrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            step=jnp.asarray(0, jnp.int32),
            aux=aux,
        )
        self.state = meshlib.replicate_tree(state, self.mesh)

        self._maybe_load_checkpoint()
        self._build_step_fns()

        # persist run metadata (ref: trainer.py:197-201); eval/inference
        # rebuilds must not overwrite the training run's artifacts
        if meshlib.is_main_process() and self.test_mode == "val":
            config.save_config()
            self.datamanager.train_dataparser_outputs.save_dataparser_transform(
                self.base_dir / "dataparser_transforms.json"
            )
            writer.setup_writers(config.vis, self.base_dir, config.experiment_name)
            profiler.setup_profiler(config.logging.enable_profiler)
            if "viewer" in config.vis:
                self._start_viewer()
        return self

    def _start_viewer(self):
        """Launch the interactive viewer against the live trainer
        (replaces the reference's in-trainer ViewerState + bridge
        subprocess, ref: viewer/server/viewer_utils.py:242-320).  Renders
        share the device queue with training; the viewer thread is a
        daemon so it dies with training."""
        import threading

        from soccernerfs_tpu.viewer.server import serve

        port = self.config.viewer.websocket_port
        t = threading.Thread(
            target=serve,
            args=(self, port),
            kwargs={"output_dir": self.config.get_base_dir()},
            daemon=True,
        )
        t.start()

    def cam_opt_cfg_optimizer(self):
        from soccernerfs_tpu.engine.optimizers import AdamOptimizerConfig

        return AdamOptimizerConfig(lr=6e-4, eps=1e-8, weight_decay=1e-2)

    # ------------------------------------------------------------------
    def _build_step_fns(self):
        model, model_cfg = self.model, self.model_cfg
        cam_opt_cfg = self.cam_opt_cfg
        optimizer = self.optimizer
        aabb = self.aabb
        train_cameras = self.train_cameras
        base_rng = self.train_rng

        mesh = self.mesh
        n_dev = int(np.prod(mesh.devices.shape)) if mesh is not None else 1
        use_shard_map = n_dev > 1 or (
            mesh is not None and self.config.machine.force_shard_map
        )

        def shard_loss_and_grads(params, batch, step, sched_kwargs,
                                 shard_idx=None):
            """Loss + grads over ONE ray shard with that shard's folded rng
            — the exact per-device body the sharded train step runs.
            ``shard_idx`` is the device's data-axis index under shard_map
            (the reference's per-rank DDP randomness); tests pass concrete
            indices to emulate an n-device run on one logical device
            (tests/test_multichip.py equivalence test)."""
            rng0 = jax.random.fold_in(base_rng, step)
            if shard_idx is not None:
                rng0 = jax.random.fold_in(rng0, shard_idx)
            # split every key needed this step up front so no key is
            # both consumed and re-split (independence)
            rng, rng_loss = jax.random.split(rng0)

            def loss_fn(params):
                cam_opt = apply_camera_optimizer(
                    cam_opt_cfg, params.get("camera_opt"), batch["cam_idx"]
                )
                rays = generate_rays(
                    train_cameras, batch["cam_idx"], batch["coords"], cam_opt
                )
                outputs = model.get_outputs(
                    model_cfg, params, aabb, rays, rng=rng, train=True,
                    **sched_kwargs
                )
                metrics = model.get_metrics_dict(model_cfg, outputs, batch, step)
                loss_dict = model.get_loss_dict(
                    model_cfg, params, outputs, batch, metrics, train=True,
                    rng=rng_loss,
                )
                loss = functools.reduce(jnp.add, loss_dict.values())
                return loss, (loss_dict, metrics)

            return jax.value_and_grad(loss_fn, has_aux=True)(params)

        self._shard_loss_and_grads = shard_loss_and_grads

        def train_step(
            state: TrainState,
            batch: Dict[str, jnp.ndarray],
            static_kwargs: tuple = (),
        ):
            step = state.step
            if hasattr(model, "schedules"):
                sched_kwargs, new_aux = model.schedules(model_cfg, step, state.aux)
            else:
                sched_kwargs, new_aux = {}, state.aux
            # host-decided static flags (e.g. the proposal-update decision)
            # override their traced counterparts so XLA can prune dead
            # backward passes (see models/kplanes.host_static_kwargs)
            sched_kwargs.update(dict(static_kwargs))

            def local_grads(params, batch):
                """Per-device loss + grads over the LOCAL ray shard.  Under
                shard_map each device folds its axis index into the rng
                (the reference's per-rank DDP randomness) and the gradient
                all-reduce is an explicit pmean over the data axis — the
                NCCL replacement that also keeps Pallas custom calls legal
                under SPMD (they cannot be auto-partitioned)."""
                shard_idx = (
                    jax.lax.axis_index(meshlib.DATA_AXIS)
                    if use_shard_map else None
                )
                (loss, (loss_dict, metrics)), grads = shard_loss_and_grads(
                    params, batch, step, sched_kwargs, shard_idx
                )
                if use_shard_map:
                    loss, loss_dict, metrics, grads = jax.lax.pmean(
                        (loss, loss_dict, metrics, grads), meshlib.DATA_AXIS
                    )
                return loss, loss_dict, metrics, grads

            if use_shard_map:
                from jax.sharding import PartitionSpec as P

                loss, loss_dict, metrics, grads = jax.shard_map(
                    local_grads,
                    mesh=mesh,
                    in_specs=(P(), P(meshlib.DATA_AXIS)),
                    out_specs=P(),
                    check_vma=False,
                )(state.params, batch)
            else:
                loss, loss_dict, metrics, grads = local_grads(state.params, batch)

            # aux updates (occupancy EMA) run replicated, outside shard_map;
            # a distinct fold keeps this key independent of the loss keys
            rng_aux = jax.random.fold_in(
                jax.random.fold_in(base_rng, step), 0x7FFFFFFF
            )
            grads = _pin_big_table_layouts(grads)
            updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            params = _pin_big_table_layouts(params)
            opt_state = _pin_big_table_layouts(opt_state)
            if hasattr(model, "update_aux"):
                # non-trainable state updates (e.g. occupancy grid EMA)
                new_aux = model.update_aux(model_cfg, params, aabb, step, new_aux, rng_aux)
            new_state = TrainState(
                params=params, opt_state=opt_state, step=step + 1, aux=new_aux
            )
            out_metrics = {"Train Loss": loss, **loss_dict, **metrics}
            return new_state, out_metrics

        self._train_step = jax.jit(train_step, donate_argnums=0, static_argnums=2)
        self._host_sched_state: Dict = {}

        def eval_forward(params, aux, cam_idx, coords, cameras: Cameras):
            rays = generate_rays(cameras, cam_idx, coords)
            extra = (
                model.eval_kwargs(model_cfg, aux)
                if hasattr(model, "eval_kwargs")
                else {}
            )
            outputs = model.get_outputs(
                model_cfg, params, aabb, rays, rng=None, train=False, **extra
            )
            keep = {
                k: v
                for k, v in outputs.items()
                if k in ("rgb", "accumulation", "depth", "median_rgb")
                or k.startswith("prop_depth")
            }
            return keep

        if use_shard_map:
            # sharded whole-image rendering: each chip renders 1/n of the
            # chunk's rays (params/cameras replicated).  shard_map — not
            # auto-SPMD — because the Pallas render kernels are custom
            # calls XLA cannot partition (ref: pipelines/
            # base_pipeline.py:343-352 rank-split eval).
            from jax.sharding import PartitionSpec as P

            sharded_eval_forward = jax.shard_map(
                eval_forward,
                mesh=mesh,
                in_specs=(
                    P(), P(), P(meshlib.DATA_AXIS), P(meshlib.DATA_AXIS), P()
                ),
                out_specs=P(meshlib.DATA_AXIS),
                check_vma=False,
            )
            self._eval_forward = jax.jit(sharded_eval_forward)
        else:
            self._eval_forward = jax.jit(eval_forward, static_argnums=())
        self._eval_n_dev = n_dev if use_shard_map else 1

        # render fast path: pack plane tables once per snapshot (models
        # that define prepare_render_params), reused by every image chunk
        self._prepare_render = (
            jax.jit(functools.partial(model.prepare_render_params, model_cfg))
            if hasattr(model, "prepare_render_params")
            else None
        )

        def eval_batch_step(params, batch, step):
            rays = generate_rays(self.eval_cameras, batch["cam_idx"], batch["coords"])
            rng = jax.random.fold_in(base_rng, step + 1_000_000)
            outputs = model.get_outputs(
                model_cfg, params, aabb, rays, rng=rng, train=True
            )
            metrics = model.get_metrics_dict(model_cfg, outputs, batch, step)
            loss_dict = model.get_loss_dict(
                model_cfg, params, outputs, batch, metrics, train=True
            )
            return {**loss_dict, **metrics}

        self._eval_batch_step = jax.jit(eval_batch_step)

    # ------------------------------------------------------------------
    def _device_batch(self, raw: Dict) -> Dict[str, jnp.ndarray]:
        indices = raw["indices"]
        batch = {
            "cam_idx": indices[:, 0].astype(np.int32),
            "coords": indices[:, 1:].astype(np.float32) + 0.5,
            "image": raw["image"].astype(np.float32),
        }
        if "depth_image" in raw:
            batch["depth_image"] = raw["depth_image"].astype(np.float32)
        return meshlib.shard_batch(batch, self.mesh)

    @profiler.time_function
    def train_iteration(self, step: int) -> Dict:
        """(ref: trainer.py:382-412)."""
        raw = self.datamanager.next_train_raw(step)
        batch = self._device_batch(raw)
        static_kwargs = ()
        if hasattr(self.model, "host_static_kwargs"):
            static_kwargs = tuple(
                sorted(
                    self.model.host_static_kwargs(
                        self.model_cfg, step, self._host_sched_state
                    ).items()
                )
            )
        with self._state_lock:
            self.state, metrics = self._train_step(self.state, batch, static_kwargs)
        return metrics

    def snapshot_state(self):
        """A donation-safe copy of (params, aux) for concurrent readers
        (the live viewer): dispatched under the state lock so the train
        loop cannot donate these buffers first."""
        with self._state_lock:
            params = jax.tree_util.tree_map(lambda x: x + 0, self.state.params)
            aux = jax.tree_util.tree_map(
                lambda x: x + 0 if hasattr(x, "dtype") else x, self.state.aux
            )
        return params, aux

    @profiler.time_function
    def eval_iteration(self, step: int) -> Dict:
        """Eval-batch losses (ref: trainer.py:414-425)."""
        raw = self.datamanager.next_eval_raw(step)
        indices = raw["indices"]
        batch = {
            "cam_idx": jnp.asarray(indices[:, 0].astype(np.int32)),
            "coords": jnp.asarray(indices[:, 1:].astype(np.float32)) + 0.5,
            "image": jnp.asarray(raw["image"].astype(np.float32)),
        }
        if "depth_image" in raw:
            batch["depth_image"] = jnp.asarray(raw["depth_image"].astype(np.float32))
        return self._eval_batch_step(self.state.params, batch, jnp.asarray(step))

    def render_camera(
        self, cameras: Cameras, camera_index: int, chunk: Optional[int] = None
    ) -> Dict[str, np.ndarray]:
        """Chunked whole-image render
        (ref: models/base_model.py:163-186 get_outputs_for_camera_ray_bundle).
        Fixed chunk size keeps one compiled program; the tail is padded."""
        chunk = chunk or getattr(self.model_cfg, "eval_num_rays_per_chunk", 1 << 14)
        # sharded render: every chip takes chunk/n rays, so chunk must
        # divide evenly over the data mesh
        chunk = (chunk + self._eval_n_dev - 1) // self._eval_n_dev * self._eval_n_dev
        h = int(np.asarray(cameras.height)[camera_index])
        w = int(np.asarray(cameras.width)[camera_index])
        coords = np.asarray(get_image_coords(h, w)).reshape(-1, 2)
        n = coords.shape[0]
        n_pad = (n + chunk - 1) // chunk * chunk
        coords = np.concatenate([coords, np.zeros((n_pad - n, 2), np.float32)])
        cam_idx = np.full((n_pad,), camera_index, np.int32)

        params, aux = self.snapshot_state()
        if self._prepare_render is not None:
            params = self._prepare_render(params)
        outs = []
        for i in range(0, n_pad, chunk):
            # dispatch all chunks without syncing; convert once at the end
            outs.append(
                self._eval_forward(
                    params,
                    aux,
                    jnp.asarray(cam_idx[i : i + chunk]),
                    jnp.asarray(coords[i : i + chunk]),
                    cameras,
                )
            )
        merged = {
            k: np.concatenate([np.asarray(o[k]) for o in outs])[:n] for k in outs[0]
        }
        return {
            k: v.reshape(h, w, *v.shape[1:]) for k, v in merged.items()
        }

    def eval_image(self, step: int) -> Dict[str, float]:
        """Render one eval image + metrics
        (ref: base_pipeline.py:288-321, trainer.py:426-448)."""
        idx, _, batch = self.datamanager.next_eval_image(step // max(self.config.steps_per_eval_image, 1))
        outputs = self.render_camera(self.eval_cameras, idx)
        gt = np.asarray(batch["image"], np.float32)
        mse = float(np.mean((outputs["rgb"] - gt) ** 2))
        psnr = -10.0 * np.log10(max(mse, 1e-12))
        writer.put_scalar(EventName.CURR_TEST_PSNR, psnr, step)
        writer.put_image("Eval Images/img", np.concatenate([gt, outputs["rgb"]], axis=1), step)
        return {"psnr": psnr, "image_idx": idx}

    # ------------------------------------------------------------------
    def train(self):
        """Main loop (ref: trainer.py:195-260)."""
        config = self.config
        start_step = int(jax.device_get(self.state.step))
        num_iters = config.max_num_iterations
        t_start = time.time()
        rays_per_batch = self.datamanager.get_train_rays_per_batch()

        dynamic_batch = getattr(config.pipeline, "dynamic_batch", False)
        target_samples = getattr(config.pipeline, "target_num_samples", 1 << 18)
        base_rays = rays_per_batch
        db_lg = None  # EMA of log2(desired rays/batch), see below
        t_last_log = time.time()

        for step in range(start_step, num_iters):
            if hasattr(self.model, "host_update"):
                # host-side param reshapes (e.g. TensoRF grid upsampling)
                new_state = self.model.host_update(
                    self.model_cfg, self.state, step, self.optimizer
                )
                if new_state is not None:
                    self.state = meshlib.replicate_tree(new_state, self.mesh)
            t0 = time.time()
            metrics = self.train_iteration(step)

            if dynamic_batch and "num_samples_per_batch" in metrics:
                # DynamicBatchPipeline: scale rays/batch toward the target
                # sample budget (ref: pipelines/dynamic_batch.py:72-89),
                # bucketed to powers of two so recompiles stay bounded.
                num_samples = max(float(jax.device_get(metrics["num_samples_per_batch"])), 1.0)
                cur = self.datamanager.train_pixel_sampler.num_rays_per_batch
                desired = cur * target_samples / num_samples
                # hysteresis on the bucket switch: every NEW bucket shape
                # is a fresh XLA compile (minutes through the remote
                # toolchain) and even a cached flip drains the async
                # queue, so track an EMA of log2(desired) and move only
                # when it sits clearly past the bucket midpoint (0.25
                # octave margin).  Large occupancy-warmup jumps still
                # cross the margin within 1-2 steps; boundary noise no
                # longer ping-pongs the shape.
                lg = float(np.log2(desired))
                db_lg = lg if db_lg is None else 0.7 * db_lg + 0.3 * lg
                bucket = int(2 ** np.clip(np.round(db_lg), 6, np.log2(base_rays * 4)))
                if bucket != cur and abs(db_lg - np.log2(cur)) > 0.75:
                    self.datamanager.train_pixel_sampler.set_num_rays_per_batch(bucket)
                rays_per_batch = self.datamanager.train_pixel_sampler.num_rays_per_batch

            if step % config.logging.steps_per_log == 0:
                metrics = {k: float(jax.device_get(v)) for k, v in metrics.items()}
                # steps run async; the device_get above drains the backlog,
                # so average over the whole interval since the last log for
                # an honest rolling rays/s (the reference's rolling average,
                # ref: trainer.py:225-231)
                now = time.time()
                interval_steps = (
                    config.logging.steps_per_log if step != start_step else 1
                )
                dt = (now - t_last_log) / interval_steps
                t_last_log = now
                writer.put_scalar(EventName.TRAIN_RAYS_PER_SEC, rays_per_batch / dt, step)
                remaining = (num_iters - step) * dt
                writer.put_scalar(EventName.ETA, remaining, step)
                writer.put_dict("Train Loss Dict", metrics, step)
                writer.put_scalar("Train Loss", metrics["Train Loss"], step)

            if config.steps_per_eval_batch and step_check(step, config.steps_per_eval_batch):
                eval_metrics = {
                    k: float(jax.device_get(v)) for k, v in self.eval_iteration(step).items()
                }
                writer.put_dict("Eval Loss Dict", eval_metrics, step)
            if config.steps_per_eval_image and step_check(step, config.steps_per_eval_image):
                self.eval_image(step)
            if config.steps_per_eval_all_images and step_check(
                step, config.steps_per_eval_all_images
            ):
                self.eval_all_images(step)
            if config.steps_per_save and step_check(step, config.steps_per_save, run_at_zero=False):
                self.save_checkpoint(step)
            writer.write_out_storage()

        # final checkpoint + flush (ref: trainer.py:245-260)
        self.save_checkpoint(num_iters - 1)
        writer.write_out_storage()
        profiler.flush_profiler()
        total = time.time() - t_start
        print(f"training finished: {num_iters - start_step} steps in {total:.1f}s")

    def eval_all_images(self, step: int) -> Dict[str, float]:
        """Average metrics over every eval image
        (ref: base_pipeline.py:323-362)."""
        psnrs = []
        t0 = time.time()
        num_rays = 0
        for idx in range(len(self.datamanager.eval_dataset)):
            _, _, batch = self.datamanager.next_eval_image(idx)
            outputs = self.render_camera(self.eval_cameras, idx)
            gt = np.asarray(batch["image"], np.float32)
            mse = float(np.mean((outputs["rgb"] - gt) ** 2))
            psnrs.append(-10.0 * np.log10(max(mse, 1e-12)))
            num_rays += gt.shape[0] * gt.shape[1]
        dt = time.time() - t0
        metrics = {
            "psnr": float(np.mean(psnrs)),
            "num_rays_per_sec": num_rays / dt,
            "fps": len(psnrs) / dt,
        }
        writer.put_dict("Eval Images Metrics Dict (all images)", metrics, step)
        return metrics

    # ------------------------------------------------------------------
    def save_checkpoint(self, step: int):
        """(ref: trainer.py:352-380)."""
        if not meshlib.is_main_process():
            return
        state = jax.device_get(self.state)
        ckpt.save_checkpoint(
            self.base_dir, step, state, self.config.save_only_latest_checkpoint
        )

    def _maybe_load_checkpoint(self):
        """(ref: trainer.py:331-350)."""
        load_dir = self.config.load_dir
        if load_dir is None:
            return
        target = jax.device_get(self.state)
        step, state = ckpt.load_checkpoint(Path(load_dir), self.config.load_step, target)
        state = jax.tree_util.tree_map(jnp.asarray, state)
        self.state = meshlib.replicate_tree(
            TrainState(
                params=state["params"],
                opt_state=state["opt_state"],
                step=jnp.asarray(step + 1, jnp.int32),
                aux=state["aux"],
            )
            if isinstance(state, dict)
            else state,
            self.mesh,
        )
        print(f"resumed from checkpoint step {step}")


def step_check(step: int, interval: int, run_at_zero: bool = False) -> bool:
    """(ref: utils/decorators.py / misc.step_check)."""
    if interval == 0:
        return False
    return (run_at_zero or step != 0) and step % interval == 0
