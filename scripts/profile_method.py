"""Per-source-line device-time profile of ANY registered method's train
step (the families-bench fixture + real Trainer), reusing
profile_step.parse.

Run (TPU): python scripts/profile_method.py <method> [n_steps]
"""
from __future__ import annotations

import copy
import pathlib
import sys
import tempfile

import jax

sys.path.insert(0, "/root/repo")

from scripts.profile_step import parse  # noqa: E402


def main(method: str, n_steps: int = 6) -> None:
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

    dynamic = {
        "k-planes", "nerfplayer", "nerfplayer-nerfacto", "nerfplayer-ngp",
        "nerfplayer-ngp-complete",
    }
    tmp = pathlib.Path(tempfile.mkdtemp())
    cfg = copy.deepcopy(method_configs[method])
    cfg.vis = "terminal"
    cfg.output_dir = tmp / "out"
    cfg.max_num_iterations = 64
    cfg.steps_per_eval_batch = 0
    cfg.steps_per_eval_image = 0
    cfg.steps_per_eval_all_images = 0
    cfg.steps_per_save = 10**9
    dm = cfg.pipeline.datamanager
    if method in dynamic:
        bc = make_broadcaststyle_fixture(
            tmp / "bstyle", num_cameras=4, num_steps=4, h=96, w=96
        )
        dm.dataparser = BroadcaststyleDataParserConfig(
            data=bc, fps_downsample=1.0
        )
    else:
        bl = tmp / "blender"
        make_blender_fixture(str(bl), num_frames=4, h=96, w=96)
        dm.dataparser = BlenderDataParserConfig(data=bl)
    if hasattr(dm, "pick_mode"):
        dm.pick_mode = "normal"
        dm.iters_to_start_is = 1
    cfg.set_timestamp()
    trainer = Trainer(cfg).setup()
    for step in range(10):
        m = trainer.train_iteration(step)
    float(jax.device_get(m["Train Loss"]))
    import shutil
    shutil.rmtree("/tmp/snt_trace", ignore_errors=True)  # stale traces
    # host python events flood the 1M-event trace cap before any device
    # event lands (the Trainer's host loop is chatty) — disable them
    opts = jax.profiler.ProfileOptions()
    opts.python_tracer_level = 0
    with jax.profiler.trace("/tmp/snt_trace", profiler_options=opts):
        for step in range(10, 10 + n_steps):
            m = trainer.train_iteration(step)
        float(jax.device_get(m["Train Loss"]))
    parse(n_steps)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 6)
