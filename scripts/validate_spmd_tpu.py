"""Compile + run the shard_map SPMD train step on the REAL TPU chip.

The multi-chip dryrun runs on a virtual CPU mesh where the Pallas kernels
are gated off (they are TPU-only), so the exact program a pod executes —
Mosaic custom calls inside jax.shard_map with an explicit pmean — is
otherwise never compiled anywhere.  This script forces the shard_map
branch on a 1-device mesh on the real chip for both kernel families:

  * k-planes (feature_dim 32 -> the stripe-sorted Pallas fwd/bwd kernels)
  * nerfacto (hash-grid custom VJP + sorted_scatter_add + occupancy EMA)

and runs a few real Trainer iterations.  Ref analog: the reference always
wraps the model in DDP when world_size > 1 (pipelines/base_pipeline.py:
244-246); here the SPMD wrapper is exercised even at world size 1.

Usage (TPU):  python scripts/validate_spmd_tpu.py [--steps N]
Writes one JSON line per method; see PERF.md "Pallas under shard_map".
"""
from __future__ import annotations

import copy
import json
import pathlib
import sys
import tempfile
import time

import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def run(method: str, n_steps: int = 6) -> dict:
    from soccernerfs_tpu.configs.method_configs import method_configs
    from soccernerfs_tpu.data.dataparsers.blender import BlenderDataParserConfig
    from soccernerfs_tpu.data.dataparsers.soccer import (
        BroadcaststyleDataParserConfig,
    )
    from soccernerfs_tpu.data.fixtures import (
        make_blender_fixture,
        make_broadcaststyle_fixture,
    )
    from soccernerfs_tpu.engine.trainer import Trainer

    tmp = pathlib.Path(tempfile.mkdtemp())
    cfg = copy.deepcopy(method_configs[method])
    cfg.vis = "terminal"
    cfg.output_dir = tmp / "out"
    cfg.max_num_iterations = n_steps
    cfg.steps_per_eval_batch = 0
    cfg.steps_per_eval_image = 0
    cfg.steps_per_eval_all_images = 0
    cfg.steps_per_save = 10**9
    cfg.machine.force_shard_map = True
    dm = cfg.pipeline.datamanager
    if method.startswith("k-planes") and "static" not in method:
        data = make_broadcaststyle_fixture(
            tmp / "bstyle", num_cameras=4, num_steps=4, h=96, w=96
        )
        dm.dataparser = BroadcaststyleDataParserConfig(data=data, fps_downsample=1.0)
    else:
        bl = tmp / "blender"
        make_blender_fixture(str(bl), num_frames=4, h=96, w=96)
        dm.dataparser = BlenderDataParserConfig(data=bl)
    if hasattr(dm, "pick_mode"):
        dm.pick_mode = "normal"
        dm.iters_to_start_is = 1
    # keep the remote compile small but leave feature_dim 32 (k-planes)
    # so the Pallas sorted-sampler path stays ON
    import dataclasses

    if hasattr(cfg.pipeline.model, "spacetime_resolution") and method == "k-planes":
        cfg.pipeline.model = dataclasses.replace(
            cfg.pipeline.model,
            spacetime_resolution=(32, 32, 32, 8),
            multiscale_res=(1, 2),
            num_proposal_samples_per_ray=(64, 32),
            num_nerf_samples_per_ray=24,
        )
    dm.train_num_rays_per_batch = 1024
    cfg.set_timestamp()
    trainer = Trainer(cfg).setup()
    t_c0 = time.time()
    m = trainer.train_iteration(0)
    loss0 = float(jax.device_get(m["Train Loss"]))
    compile_s = time.time() - t_c0
    t0 = time.time()
    for step in range(1, n_steps):
        m = trainer.train_iteration(step)
    loss = float(jax.device_get(m["Train Loss"]))
    dt = time.time() - t0
    rec = {
        "method": method,
        "backend": jax.default_backend(),
        "shard_map": True,
        "steps": n_steps,
        "compile_s": round(compile_s, 1),
        "ms_per_step": round(dt / max(n_steps - 1, 1) * 1e3, 1),
        "loss_first": round(loss0, 4),
        "loss_last": round(loss, 4),
        "finite": bool(loss == loss and abs(loss) < 1e9),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    n_steps = 6
    if "--steps" in sys.argv:
        n_steps = int(sys.argv[sys.argv.index("--steps") + 1])
    ok = True
    for method in ("k-planes", "nerfacto"):
        try:
            rec = run(method, n_steps)
            ok = ok and rec["finite"]
        except Exception as e:  # noqa: BLE001
            import traceback

            traceback.print_exc()
            print(json.dumps({"method": method, "error": str(e)[:300]}),
                  flush=True)
            ok = False
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
