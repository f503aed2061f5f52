"""Benchmark: K-Planes train throughput (rays/sec/chip) on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 32k rays/sec/chip — the RECONCILED toolchain-floor
bound: the sum of the round-4 MEASURED per-segment floors (kfloor_r4
per-call kernel sums + measured XLA gather/sort/streaming rates) over
the 5:1 noprop:full step mix; see BASELINE.md "Reconciled target" for
the line-item derivation.  The earlier 60k line assumed extrapolated
kernel floors (~5-6 ms) that the round-4 per-call measurements refuted
(19-24 ms); it is retired.  The physical bound with hardware-rate
gathers (broken Mosaic dynamic_gather) remains ~165k for context.

Workload mirrors the reference's `k-planes` method defaults
(nerfstudio method_configs.py:481-560): 4096 rays/batch,
256+128 proposal + 64 nerf samples/ray, multiscale 1-16 over
64^3 x 100, feature dim 32 — the throughput metric of record
(TRAIN_RAYS_PER_SEC, ref: engine/trainer.py:225-231).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    from soccernerfs_tpu.core.cameras import Cameras, generate_rays
    from soccernerfs_tpu.models import kplanes

    cfg = kplanes.Config(
        spacetime_resolution=(64, 64, 64, 100),
        feature_dim=32,
        multiscale_res=(1, 2, 4, 8, 16),
        proposal_net_args_list=(
            {"feature_dim": 8, "resolution": (128, 128, 128, 100)},
            {"feature_dim": 8, "resolution": (256, 256, 256, 100)},
        ),
        num_proposal_samples_per_ray=(256, 128),
        num_nerf_samples_per_ray=64,
        sigma_net_hidden_dim=128,
        disable_viewing_dependent=True,
    )
    batch_size = 4096

    params = kplanes.init(jax.random.PRNGKey(0), cfg, num_train_data=20)
    aabb = jnp.asarray([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]])

    n_cams = 20
    rng = np.random.default_rng(0)
    c2w = np.zeros((n_cams, 3, 4), np.float32)
    for i in range(n_cams):
        th = 2 * np.pi * i / n_cams
        # look-at-origin pose
        z = np.array([np.cos(th), np.sin(th), 0.5])
        z = z / np.linalg.norm(z)
        x = np.cross(np.array([0.0, 0.0, 1.0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w[i, :, 0], c2w[i, :, 1], c2w[i, :, 2] = x, y, z
        c2w[i, :, 3] = z * 2.5
    cameras = Cameras.create(
        camera_to_worlds=c2w,
        fx=800.0, fy=800.0, cx=480.0, cy=270.0, width=960, height=540,
        times=np.linspace(0, 1, n_cams).astype(np.float32),
    )

    # the method-of-record optimizer (configs/method_configs.py "k-planes"):
    # Adam eps=1e-12 with bf16 moment STORAGE (f32 compute; quality parity
    # verified in PERF.md)
    from soccernerfs_tpu.engine.optimizers import scale_by_adam_lowp

    optimizer = optax.chain(
        scale_by_adam_lowp(eps=1e-12), optax.scale(-1e-2)
    )
    aux = kplanes.init_aux(cfg)
    state = {
        "params": params,
        "opt_state": optimizer.init(params),
        "step": jnp.asarray(0, jnp.int32),
        "aux": aux,
    }

    def train_step(state, cam_idx, coords, image, train_props):
        step = state["step"]
        sched_kwargs, new_aux = kplanes.schedules(cfg, step, state["aux"])
        # host-static decision: lets XLA prune the proposal backward on
        # the reference's non-update steps (4/5 after warmup)
        sched_kwargs["train_proposal_networks"] = train_props
        rng = jax.random.fold_in(jax.random.PRNGKey(1), step)
        batch = {"image": image}

        def loss_fn(p):
            rays = generate_rays(cameras, cam_idx, coords)
            outputs = kplanes.get_outputs(
                cfg, p, aabb, rays, rng=rng, train=True, **sched_kwargs
            )
            loss_dict = kplanes.get_loss_dict(cfg, p, outputs, batch, {})
            loss = sum(loss_dict.values())
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        updates, opt_state = optimizer.update(grads, state["opt_state"])
        new_params = optax.apply_updates(state["params"], updates)
        return (
            {"params": new_params, "opt_state": opt_state, "step": step + 1, "aux": new_aux},
            loss,
        )

    step_fn = jax.jit(train_step, donate_argnums=0, static_argnums=4)
    host_sched: dict = {}

    def make_batch(i):
        r = np.random.default_rng(i)
        return (
            jnp.asarray(r.integers(0, n_cams, (batch_size,)).astype(np.int32)),
            jnp.asarray(
                np.stack(
                    [r.uniform(0, 540, batch_size), r.uniform(0, 960, batch_size)], -1
                ).astype(np.float32)
            ),
            jnp.asarray(r.uniform(0, 1, (batch_size, 3)).astype(np.float32)),
        )

    def flag(step):
        return kplanes.host_static_kwargs(cfg, step, host_sched)[
            "train_proposal_networks"
        ]

    # warmup / compile both variants
    batches = [make_batch(i) for i in range(8)]
    state, loss = step_fn(state, *batches[0], True)
    jax.block_until_ready(loss)
    state, loss = step_fn(state, *batches[1], False)
    jax.block_until_ready(loss)

    # measure the steady-state mix at a post-warmup step offset: the
    # update schedule runs every proposal_update_every steps there
    host_sched["steps_since_update"] = 0
    n_steps = 50
    t0 = time.time()
    for i in range(n_steps):
        # post-warmup regime (update_sched = 5 -> update every ~7th step)
        state, loss = step_fn(state, *batches[i % len(batches)], flag(10_000 + i))
    float(jax.device_get(loss))
    dt = time.time() - t0

    rays_per_sec = batch_size * n_steps / dt
    # reconciled toolchain-floor target (BASELINE.md "Reconciled
    # target"): sum of the round-4 MEASURED per-segment floors over the
    # 5:1 noprop:full mix — ~117 ms noprop + ~179 ms full = 127 ms mix
    baseline = 32_000.0
    print(
        json.dumps(
            {
                "metric": "kplanes_train_rays_per_sec_per_chip",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / baseline, 4),
            }
        )
    )


def render_main() -> None:
    """Eval-render throughput: full-frame chunked rendering of the bench
    workload's model, reported in megapixels/sec and test rays/sec
    (the reference's TEST_RAYS_PER_SEC / eval fps metrics,
    ref: utils/writer.py:52, pipelines/base_pipeline.py:343-352)."""
    from soccernerfs_tpu.core.cameras import Cameras, generate_rays
    from soccernerfs_tpu.models import kplanes

    cfg = kplanes.Config(
        spacetime_resolution=(64, 64, 64, 100),
        feature_dim=32,
        multiscale_res=(1, 2, 4, 8, 16),
        proposal_net_args_list=(
            {"feature_dim": 8, "resolution": (128, 128, 128, 100)},
            {"feature_dim": 8, "resolution": (256, 256, 256, 100)},
        ),
        num_proposal_samples_per_ray=(256, 128),
        num_nerf_samples_per_ray=64,
        sigma_net_hidden_dim=128,
        disable_viewing_dependent=True,
    )
    params = kplanes.init(jax.random.PRNGKey(0), cfg, num_train_data=20)
    aabb = jnp.asarray([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]])
    h, w = 540, 960
    cameras = Cameras.create(
        camera_to_worlds=np.eye(3, 4, dtype=np.float32)[None]
        + np.zeros((1, 3, 4), np.float32),
        fx=800.0, fy=800.0, cx=w / 2, cy=h / 2, width=w, height=h,
        times=np.zeros((1,), np.float32),
    )
    chunk = 1 << 16
    coords_all = np.stack(
        np.meshgrid(np.arange(h, dtype=np.float32),
                    np.arange(w, dtype=np.float32), indexing="ij"), -1
    ).reshape(-1, 2)
    n_pix = coords_all.shape[0]
    n_chunks = -(-n_pix // chunk)
    pad = n_chunks * chunk - n_pix
    coords_all = np.concatenate([coords_all, coords_all[:pad]], 0)

    @jax.jit
    def render_chunk(params, coords):
        # params as an ARGUMENT: closed-over arrays become baked program
        # constants and the 620 MB param tree blows the compile request
        rays = generate_rays(
            cameras, jnp.zeros((coords.shape[0],), jnp.int32), coords
        )
        out = kplanes.get_outputs(
            cfg, params, aabb, rays, rng=jax.random.PRNGKey(0), train=False
        )
        return out["rgb"]

    # pack plane tables to bf16 once per snapshot (the render fast path —
    # per-chunk repacking dominated eval throughput before round 3)
    params = jax.jit(lambda p: kplanes.prepare_render_params(cfg, p))(params)

    chunks = [jnp.asarray(coords_all[i * chunk:(i + 1) * chunk])
              for i in range(n_chunks)]
    jax.block_until_ready(render_chunk(params, chunks[0]))  # compile
    n_frames = 3
    t0 = time.time()
    outs = []
    for _ in range(n_frames):
        outs = [render_chunk(params, c) for c in chunks]
    jax.block_until_ready(outs)
    dt = time.time() - t0
    pix_per_sec = n_pix * n_frames / dt
    print(json.dumps({
        "metric": "kplanes_render_megapixels_per_sec",
        "value": round(pix_per_sec / 1e6, 3),
        "unit": "MP/s",
        "test_rays_per_sec": round(pix_per_sec, 1),
        "fps_960x540": round(pix_per_sec / n_pix, 3),
    }))


def families_main(which=None, json_path=None, steady=False) -> None:
    """Per-family TPU throughput at REGISTRY-DEFAULT model workloads.

    Emits one JSON line per method: ms/step + train rays/s (same metric of
    record as the primary line; ref nerfstudio engine/trainer.py:225-231).
    Uses the real Trainer on synthetic fixtures so raygen/datamanager/
    dynamic-batch behavior all match production; model hyperparameters are
    the registry defaults (configs/method_configs.py).  ``--json PATH``
    additionally writes all records to one artifact file (the per-family
    numbers of record next to BENCH_r*.json).  ``--steady`` warms
    occupancy-grid methods past their 256-step nerfacc warmup so the
    measured windows see the production steady state (sampled cell
    probes) instead of the warmup's full-grid probes — the long-run
    number a 30k-iteration training converges to (table in PERF.md)."""
    import copy
    import dataclasses  # noqa: F401  (kept for parity with callers)
    import pathlib
    import tempfile
    import traceback

    from soccernerfs_tpu.configs.method_configs import method_configs
    from soccernerfs_tpu.data.dataparsers.blender import BlenderDataParserConfig
    from soccernerfs_tpu.data.dataparsers.soccer import (
        BroadcaststyleDataParserConfig,
    )
    from soccernerfs_tpu.data.dataparsers.sitcoms3d import (
        Sitcoms3DDataParserConfig,
    )
    from soccernerfs_tpu.data.fixtures import (
        make_blender_fixture,
        make_broadcaststyle_fixture,
        make_sitcoms3d_fixture,
    )
    from soccernerfs_tpu.engine.trainer import Trainer

    dynamic = {
        "k-planes", "nerfplayer", "nerfplayer-nerfacto", "nerfplayer-ngp",
        "nerfplayer-ngp-complete",
    }
    methods = which or [
        "nerfacto", "instant-ngp", "instant-ngp-bounded", "nerfplayer",
        "nerfplayer-nerfacto", "nerfplayer-ngp", "nerfplayer-ngp-complete",
        "tensorf", "k-planes-static", "vanilla-nerf", "mipnerf", "dnerf",
        "neus", "depth-nerfacto", "semantic-nerfw",
    ]
    tmp = pathlib.Path(tempfile.mkdtemp())
    bl = tmp / "blender"
    make_blender_fixture(str(bl), num_frames=4, h=96, w=96)
    dn = tmp / "dnerf"
    make_blender_fixture(str(dn), num_frames=4, h=96, w=96, with_times=True)
    bc = make_broadcaststyle_fixture(
        tmp / "bstyle", num_cameras=4, num_steps=4, h=96, w=96
    )
    sit = make_sitcoms3d_fixture(tmp / "sitcoms3d", num_cameras=4, h=96, w=96)
    records = []
    for method in methods:
        try:
            cfg = copy.deepcopy(method_configs[method])
            cfg.vis = "terminal"
            cfg.output_dir = tmp / "out" / method
            cfg.max_num_iterations = 64
            cfg.steps_per_eval_batch = 0
            cfg.steps_per_eval_image = 0
            cfg.steps_per_eval_all_images = 0
            cfg.steps_per_save = 10**9
            dm = cfg.pipeline.datamanager
            if method in dynamic:
                dm.dataparser = BroadcaststyleDataParserConfig(
                    data=bc, fps_downsample=1.0
                )
            elif method == "semantic-nerfw":
                dm.dataparser = Sitcoms3DDataParserConfig(data=sit)
            elif method == "dnerf":
                # time-conditioned fixture so the temporal path is real
                dm.dataparser = BlenderDataParserConfig(data=dn)
            else:
                dm.dataparser = BlenderDataParserConfig(data=bl)
            if hasattr(dm, "pick_mode"):
                dm.pick_mode = "normal"
                dm.iters_to_start_is = 1
            cfg.set_timestamp()
            trainer = Trainer(cfg).setup()
            warmup, n_windows, w_steps = 12, 3, 8
            if getattr(cfg.pipeline, "dynamic_batch", False):
                # occupancy pruning walks the rays/batch bucket up during
                # early steps; measure steady state, not the climb's
                # first-visit compiles (the trainer's bucket hysteresis
                # bounds flips, but new buckets still compile once)
                warmup = 28
            occ_cfg = getattr(cfg.pipeline.model, "occ", None)
            if steady and occ_cfg is not None:
                warmup = occ_cfg.warmup_steps + 4
            for step in range(warmup):
                m = trainer.train_iteration(step)
            float(jax.device_get(m["Train Loss"]))  # drain the queue
            # measure in WINDOWS: the fastest window is robust to a
            # dynamic-batch bucket flip triggering a multi-minute remote
            # recompile (nerfacto measured 6 s/step that way); median and
            # the all-window rolling average are the steady-state numbers
            # the reference's rolling TRAIN_RAYS_PER_SEC converges to
            # (ref: engine/trainer.py:225-231) — all three are reported.
            windows = []  # (rays/s, ms/step, rays/step)
            tot_rays, tot_dt = 0, 0.0
            step = warmup
            for _ in range(n_windows):
                rays = 0
                t0 = time.time()
                for _ in range(w_steps):
                    rays += trainer.datamanager.get_train_rays_per_batch()
                    m = trainer.train_iteration(step)
                    step += 1
                float(jax.device_get(m["Train Loss"]))
                dt = time.time() - t0
                windows.append((rays / dt, dt / w_steps * 1e3, rays / w_steps))
                tot_rays += rays
                tot_dt += dt
            best = max(windows)
            med = sorted(w[0] for w in windows)[len(windows) // 2]
            rec = {
                "metric": f"{method}_train_rays_per_sec_per_chip",
                "value": round(best[0], 1),
                "unit": "rays/s",
                "median_rays_per_sec": round(med, 1),
                "rolling_rays_per_sec": round(tot_rays / tot_dt, 1),
                "ms_per_step": round(best[1], 1),
                "rays_per_batch": round(best[2]),
            }
            if steady and occ_cfg is not None:
                rec["phase"] = "steady_state"  # windows after occ warmup
            print(json.dumps(rec), flush=True)
            records.append(rec)
            del trainer
        except Exception as e:  # one OOM must not kill the sweep
            traceback.print_exc()
            rec = {
                "metric": f"{method}_train_rays_per_sec_per_chip",
                "error": f"{type(e).__name__}: {e}"[:200],
            }
            print(json.dumps(rec), flush=True)
            records.append(rec)
    if json_path:
        pathlib.Path(json_path).write_text(
            json.dumps(records, indent=2), "utf8")


def scaling_child(n_devices: int) -> None:
    """Weak-scaling probe on a virtual n-device CPU mesh: tiny K-Planes
    config, batch sharded over the data axis, params replicated (the pod
    design of parallel/mesh.py).  Prints rays/s for this device count."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__ as ge
    from soccernerfs_tpu.models import kplanes
    from soccernerfs_tpu.parallel import mesh as meshlib

    devices = jax.devices()[:n_devices]
    mesh = meshlib.make_data_mesh(devices)
    cfg = ge._tiny_config()
    params = kplanes.init(jax.random.PRNGKey(0), cfg, num_train_data=4)
    aabb = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    optimizer = optax.adam(1e-2)
    state = {
        "params": params,
        "opt_state": optimizer.init(params),
        "step": jnp.asarray(0, jnp.int32),
        "aux": kplanes.init_aux(cfg),
    }
    state = jax.device_put(state, meshlib.replicated(mesh))
    batch_sharding = NamedSharding(mesh, P(meshlib.DATA_AXIS))
    n_rays = 1024 * n_devices
    rng = np.random.default_rng(0)
    rays = ge._rays(n_rays, jax.random.PRNGKey(1))
    rays = jax.device_put(rays, batch_sharding)
    image = jax.device_put(
        jnp.asarray(rng.uniform(0, 1, (n_rays, 3)).astype(np.float32)),
        batch_sharding,
    )

    def train_step(state, rays, image):
        step = state["step"]
        sched_kwargs, new_aux = kplanes.schedules(cfg, step, state["aux"])
        rng_ = jax.random.fold_in(jax.random.PRNGKey(3), step)

        def loss_fn(p):
            outputs = kplanes.get_outputs(
                cfg, p, aabb, rays, rng=rng_, train=True, **sched_kwargs
            )
            loss_dict = kplanes.get_loss_dict(
                cfg, p, outputs, {"image": image}, {}
            )
            return sum(loss_dict.values())

        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        updates, opt_state = optimizer.update(grads, state["opt_state"])
        return (
            {
                "params": optax.apply_updates(state["params"], updates),
                "opt_state": opt_state,
                "step": step + 1,
                "aux": new_aux,
            },
            loss,
        )

    step_fn = jax.jit(train_step, donate_argnums=0)
    state, loss = step_fn(state, rays, image)
    jax.block_until_ready(loss)
    n_steps = 20
    t0 = time.time()
    for _ in range(n_steps):
        state, loss = step_fn(state, rays, image)
    float(jax.device_get(loss))
    dt = time.time() - t0
    print(json.dumps({
        "n_devices": n_devices,
        "rays_per_sec": round(n_rays * n_steps / dt, 1),
        "rays_per_sec_per_device": round(n_rays * n_steps / dt / n_devices, 1),
    }))


def render_scaling_child(n_devices: int) -> None:
    """Sharded eval-render weak-scaling probe: whole-image chunks sharded
    over an n-device data mesh via the Trainer's shard_map eval path
    (VERDICT r3 weak #8; ref: pipelines/base_pipeline.py:343-352)."""
    from jax.sharding import PartitionSpec as P
    from jax.sharding import NamedSharding

    import __graft_entry__ as ge
    from soccernerfs_tpu.core.cameras import Cameras, generate_rays
    from soccernerfs_tpu.models import kplanes
    from soccernerfs_tpu.parallel import mesh as meshlib

    devices = jax.devices()[:n_devices]
    mesh = meshlib.make_data_mesh(devices)
    cfg = ge._tiny_config()
    params = kplanes.init(jax.random.PRNGKey(0), cfg, num_train_data=4)
    params = jax.device_put(params, meshlib.replicated(mesh))
    aabb = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    h, w = 96, 96
    cameras = Cameras.create(
        camera_to_worlds=np.eye(3, 4, dtype=np.float32)[None],
        fx=80.0, fy=80.0, cx=w / 2, cy=h / 2, width=w, height=h,
        times=np.zeros((1,), np.float32),
    )

    def forward(params, coords):
        rays = generate_rays(
            cameras, jnp.zeros((coords.shape[0],), jnp.int32), coords
        )
        out = kplanes.get_outputs(
            cfg, params, aabb, rays, rng=None, train=False
        )
        return out["rgb"]

    render_chunk = jax.jit(jax.shard_map(
        forward, mesh=mesh,
        in_specs=(P(), P(meshlib.DATA_AXIS)), out_specs=P(meshlib.DATA_AXIS),
        check_vma=False,
    ))
    coords = np.stack(
        np.meshgrid(np.arange(h, dtype=np.float32),
                    np.arange(w, dtype=np.float32), indexing="ij"), -1
    ).reshape(-1, 2)
    coords = jax.device_put(
        jnp.asarray(coords), NamedSharding(mesh, P(meshlib.DATA_AXIS))
    )
    rgb = jax.block_until_ready(render_chunk(params, coords))  # compile
    assert rgb.shape == (h * w, 3)
    n_frames = 5
    t0 = time.time()
    for _ in range(n_frames):
        rgb = render_chunk(params, coords)
    jax.block_until_ready(rgb)
    dt = time.time() - t0
    print(json.dumps({
        "n_devices": n_devices,
        "render_rays_per_sec": round(h * w * n_frames / dt, 1),
        "render_rays_per_sec_per_device": round(
            h * w * n_frames / dt / n_devices, 1
        ),
    }))


def scaling_main(mode: str = "train") -> None:
    """Run the weak-scaling table at 1/2/4/8 virtual devices (one
    subprocess each, CPU platform forced like dryrun_multichip)."""
    repo_root = os.path.dirname(os.path.abspath(__file__))
    child = "scaling_child" if mode == "train" else "render_scaling_child"
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["XLA_FLAGS"] = (
            f"{env.get('XLA_FLAGS', '')} "
            f"--xla_force_host_platform_device_count={n}".strip()
        )
        env["PYTHONPATH"] = os.pathsep.join(
            p for p in [repo_root, env.get("PYTHONPATH", "")] if p
        )
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu');"
            f"import bench; bench.{child}({n})"
        )
        subprocess.run([sys.executable, "-c", code], env=env, cwd=repo_root,
                       check=True)


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling_main("render" if "--render" in sys.argv else "train")
    elif "--render" in sys.argv:
        render_main()
    elif "--families" in sys.argv:
        out = (sys.argv[sys.argv.index("--json") + 1]
               if "--json" in sys.argv else None)
        rest = [a for a in sys.argv[1:]
                if not a.startswith("--") and a != out]
        families_main(rest or None, json_path=out,
                      steady="--steady" in sys.argv)
    else:
        main()
