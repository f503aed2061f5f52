"""Mid-train checkpoint -> resume -> continue (ref: engine/trainer.py:331-350).

Trains N steps, checkpoints, resumes into a FRESH Trainer, continues to
2N, and asserts the resumed trajectory matches an uninterrupted 2N run:
step counter, schedule state (optimizer counts live in opt_state), loss
trajectory, and final params.  The device rng is already step-folded
(deterministic); the host pixel sampler is re-seeded per step in both
runs so they see identical batches, which turns "within tolerance" into
a near-exact check.
"""
import copy
import dataclasses

import jax
import numpy as np
import pytest

from soccernerfs_tpu.configs.method_configs import method_configs
from soccernerfs_tpu.data.dataparsers.blender import BlenderDataParserConfig
from soccernerfs_tpu.data.fixtures import make_blender_fixture
from soccernerfs_tpu.engine.trainer import Trainer

N = 3  # resume point; full run is 2N steps

SMALL = dict(
    num_levels=3, max_res=32, log2_hashmap_size=9,
    num_proposal_samples_per_ray=(8, 6), num_nerf_samples_per_ray=4,
    hidden_dim=16, hidden_dim_color=16,
    proposal_net_args_list=(
        {"hidden_dim": 8, "log2_hashmap_size": 9, "num_levels": 3, "max_res": 16},
        {"hidden_dim": 8, "log2_hashmap_size": 9, "num_levels": 3, "max_res": 32},
    ),
)


@pytest.fixture(scope="module")
def blender_root(tmp_path_factory):
    return make_blender_fixture(tmp_path_factory.mktemp("blender"), h=12, w=16)


def _make_trainer(tmp_path, blender_root, name, load_dir=None):
    cfg = copy.deepcopy(method_configs["nerfacto"])
    cfg.pipeline.model = dataclasses.replace(cfg.pipeline.model, **SMALL)
    dm = cfg.pipeline.datamanager
    dm.train_num_rays_per_batch = 32
    dm.eval_num_rays_per_batch = 16
    dm.train_num_images_to_sample_from = -1
    dm.eval_num_images_to_sample_from = -1
    dm.dataparser = BlenderDataParserConfig(data=blender_root)
    cfg.max_num_iterations = 2 * N
    cfg.steps_per_save = 0
    cfg.steps_per_eval_batch = 0
    cfg.steps_per_eval_image = 0
    cfg.steps_per_eval_all_images = 0
    cfg.vis = "none"
    cfg.output_dir = tmp_path / name
    cfg.set_timestamp()
    if load_dir is not None:
        cfg.load_dir = load_dir
    return Trainer(cfg).setup()


def _run_steps(trainer, steps):
    losses = []
    for step in steps:
        # identical host batches across runs: both the uninterrupted and
        # the resumed trainer draw from a per-step-seeded sampler
        trainer.datamanager.train_pixel_sampler.rng = np.random.default_rng(
            9000 + step
        )
        metrics = trainer.train_iteration(step)
        losses.append(float(jax.device_get(metrics["Train Loss"])))
    return losses


def _params(trainer):
    return jax.device_get(trainer.state.params)


def test_resume_matches_uninterrupted(tmp_path, blender_root):
    # uninterrupted 2N-step run
    full = _make_trainer(tmp_path, blender_root, "full")
    loss_full = _run_steps(full, range(2 * N))
    params_full = _params(full)

    # interrupted run: N steps -> checkpoint
    first = _make_trainer(tmp_path, blender_root, "first")
    loss_first = _run_steps(first, range(N))
    first.save_checkpoint(N - 1)
    params_first = _params(first)

    # identical prefixes (same seeds, same program)
    np.testing.assert_allclose(loss_first, loss_full[:N], rtol=1e-6)

    # fresh Trainer resumes from the checkpoint (ref: trainer.py:331-350)
    resumed = _make_trainer(
        tmp_path, blender_root, "resumed", load_dir=first.base_dir
    )
    # step counter resumes AFTER the checkpointed step
    assert int(jax.device_get(resumed.state.step)) == N
    # checkpoint round-trip is exact: params AND opt_state (schedule
    # counts, Adam moments) survive bit-for-bit
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, _params(resumed), params_first
    )
    jax.tree_util.tree_map(
        np.testing.assert_array_equal,
        jax.device_get(resumed.state.opt_state),
        jax.device_get(first.state.opt_state),
    )

    # continue to 2N: loss trajectory and final params match the
    # uninterrupted run within fp tolerance
    loss_resumed = _run_steps(resumed, range(N, 2 * N))
    np.testing.assert_allclose(loss_resumed, loss_full[N:], rtol=1e-5, atol=1e-7)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-5, atol=1e-6,
        ),
        _params(resumed), params_full,
    )


def test_resume_via_train_loop(tmp_path, blender_root):
    """The train() loop itself honors start_step: a resumed trainer runs
    only the remaining steps and writes the final checkpoint
    (ref: trainer.py:195-260)."""
    first = _make_trainer(tmp_path, blender_root, "loop_first")
    first.config.max_num_iterations = N
    first.train()  # writes final checkpoint at step N-1

    resumed = _make_trainer(
        tmp_path, blender_root, "loop_resumed", load_dir=first.base_dir
    )
    assert int(jax.device_get(resumed.state.step)) == N
    resumed.train()  # N..2N-1 only
    assert int(jax.device_get(resumed.state.step)) == 2 * N
    from soccernerfs_tpu.engine import checkpoints as ckpt

    assert ckpt.latest_checkpoint_step(resumed.base_dir) == 2 * N - 1
