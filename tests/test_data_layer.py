"""Data-layer tests: dataparsers, IST/ISG weights, pixel samplers, cameras.

Covers fork components the reference left untested (SURVEY §4): IST
determinism and semantics, dataparser splits + fps-downsample, and the
importance pixel sampler's ratio/cap/empty-map behaviors.
"""
import numpy as np
import pytest

from soccernerfs_tpu.data.datamanager import DynamicDataManagerConfig
from soccernerfs_tpu.data.dataparsers.blender import BlenderDataParserConfig
from soccernerfs_tpu.data.dataparsers.soccer import BroadcaststyleDataParserConfig
from soccernerfs_tpu.data.fixtures import make_blender_fixture, make_broadcaststyle_fixture
from soccernerfs_tpu.data.pixel_samplers import DynamicBasedPixelSampler, PixelSampler


@pytest.fixture(scope="module")
def broadcast_root(tmp_path_factory):
    return make_broadcaststyle_fixture(
        tmp_path_factory.mktemp("bstyle"), num_cameras=4, num_steps=4
    )


@pytest.fixture(scope="module")
def blender_root(tmp_path_factory):
    return make_blender_fixture(tmp_path_factory.mktemp("blender"))


def test_broadcaststyle_parser_splits(broadcast_root):
    cfg = BroadcaststyleDataParserConfig(
        data=broadcast_root, fps_downsample=1.0, cam_split_setup="all"
    )
    parser = cfg.setup()
    train = parser.get_dataparser_outputs("train")
    # fixture: Camera_1..3 train + Camera_20 eval; 4 steps each
    assert len(train.image_filenames) == 3 * 4
    evalo = parser.get_dataparser_outputs("val")
    assert len(evalo.image_filenames) == 4  # Camera_20 only
    # camera ids are 0..3, times normalized to [0,1]
    ids = np.asarray(train.cameras.ids)
    assert set(ids.tolist()) <= set(range(19))
    times = np.asarray(train.cameras.times)
    assert times.min() == 0.0 and times.max() == 1.0


def test_broadcaststyle_fps_downsample(broadcast_root):
    full = BroadcaststyleDataParserConfig(
        data=broadcast_root, fps_downsample=1.0
    ).setup().get_dataparser_outputs("train")
    half = BroadcaststyleDataParserConfig(
        data=broadcast_root, fps_downsample=2.0
    ).setup().get_dataparser_outputs("train")
    # linspace(0, 3, 2) -> steps {0, 3}: half the frames
    assert len(half.image_filenames) == len(full.image_filenames) // 2


def test_blender_parser(blender_root):
    cfg = BlenderDataParserConfig(data=blender_root)
    out = cfg.setup().get_dataparser_outputs("train")
    assert len(out.image_filenames) == 3
    assert out.cameras.num_cameras == 3
    aabb = np.asarray(out.scene_box.aabb)
    assert aabb[0][0] == -1.5 and aabb[1][2] == 1.5


def test_dynamic_datamanager_end_to_end(broadcast_root):
    cfg = DynamicDataManagerConfig(
        dataparser=BroadcaststyleDataParserConfig(data=broadcast_root, fps_downsample=1.0),
        train_num_rays_per_batch=64,
        eval_num_rays_per_batch=32,
        use_importance_sampling=True,
        iters_to_start_is=0,
        ist_range=1.0,
        pick_mode="normal",
    )
    dm = cfg.setup(seed=0)
    ray_bundle, batch = dm.next_train(step=0)
    assert ray_bundle.origins.shape == (64, 3)
    assert batch["image"].shape == (64, 3)
    assert ray_bundle.times is not None
    # directions are unit
    norms = np.linalg.norm(np.asarray(ray_bundle.directions), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    idx, image_bundle, image_batch = dm.next_eval_image(0)
    h = int(np.asarray(dm.eval_cameras.height)[idx])
    w = int(np.asarray(dm.eval_cameras.width)[idx])
    assert image_bundle.origins.shape == (h * w, 3)
    assert image_batch["image"].shape == (h, w, 3)


def test_ist_weights_semantics(broadcast_root):
    """IST: moving-ball pixels get weight, static-floor pixels get zero;
    deterministic across runs (ref: dynamic_dataset.py:328-470)."""
    from soccernerfs_tpu.data.datasets import DynamicDataset, ImportanceSamplingConfig
    from soccernerfs_tpu.data import importance

    outputs = BroadcaststyleDataParserConfig(
        data=broadcast_root, fps_downsample=1.0
    ).setup().get_dataparser_outputs("train")
    ds = DynamicDataset(outputs, is_config=ImportanceSamplingConfig(ist_range=1.0))
    batch = {
        "image_idx": np.arange(len(ds)),
        "image": np.stack([ds.get_image(i) for i in range(len(ds))]),
    }
    w1 = importance.compute_ist(ds, batch, ist_range=1.0, split="train")
    w2 = importance.compute_ist(ds, batch, ist_range=1.0, split="train")
    np.testing.assert_array_equal(w1, w2)
    assert w1.dtype == np.float16
    assert w1.shape == batch["image"].shape[:3]
    # the ball moves: some pixels exceed the 0.15 threshold...
    assert (w1 > 0).any()
    # ...but most of the image is static floor/background -> zero weight
    assert (w1 == 0).mean() > 0.5


def test_ist_uniform_fallback(broadcast_root):
    """Frames with no close-in-time neighbors get uniform maps
    (ref: dynamic_dataset.py:431-434)."""
    from soccernerfs_tpu.data.datasets import DynamicDataset, ImportanceSamplingConfig
    from soccernerfs_tpu.data import importance

    outputs = BroadcaststyleDataParserConfig(
        data=broadcast_root, fps_downsample=1.0
    ).setup().get_dataparser_outputs("train")
    ds = DynamicDataset(outputs)
    batch = {
        "image_idx": np.arange(len(ds)),
        "image": np.stack([ds.get_image(i) for i in range(len(ds))]),
    }
    # ist_range smaller than the time gap between any two frames
    w = importance.compute_ist(ds, batch, ist_range=0.02, split="train")
    np.testing.assert_array_equal(np.asarray(w, np.float32), 1.0)


def test_ist_without_camera_ids(broadcast_root):
    """Datasets without multi-camera metadata (cameras.ids=None, e.g.
    d-nerf) group all frames as one camera instead of crashing
    (regression: dnerf-data + nerfplayer-* via the CLI)."""
    import dataclasses

    from soccernerfs_tpu.data.datasets import DynamicDataset, ImportanceSamplingConfig
    from soccernerfs_tpu.data import importance

    outputs = BroadcaststyleDataParserConfig(
        data=broadcast_root, fps_downsample=1.0
    ).setup().get_dataparser_outputs("train")
    outputs = dataclasses.replace(
        outputs, cameras=dataclasses.replace(outputs.cameras, ids=None)
    )
    ds = DynamicDataset(outputs, is_config=ImportanceSamplingConfig(ist_range=1.0))
    batch = {
        "image_idx": np.arange(len(ds)),
        "image": np.stack([ds.get_image(i) for i in range(len(ds))]),
    }
    w_ist = importance.compute_ist(ds, batch, ist_range=1.0, split="train")
    assert w_ist.shape == batch["image"].shape[:3]
    assert (w_ist > 0).any()
    w_isg = importance.compute_isg(ds, batch, gamma=1e-3, split="train")
    assert w_isg.shape == batch["image"].shape[:3]


def test_dynamic_pixel_sampler_ratio_and_fallback():
    h, w, n = 16, 16, 4
    batch = {
        "image": np.random.default_rng(0).random((n, h, w, 3)).astype(np.float32),
        "image_idx": np.arange(n),
        "iter_steps": 100,
    }
    weights = np.zeros((n, h, w), np.float16)
    weights[0, 2, 3] = 1.0  # single-pixel support -> replacement path
    weights[1] = 0.0  # empty map -> skipped
    weights[2, :4, :4] = 0.5
    batch["ist_weights"] = weights

    sampler = DynamicBasedPixelSampler(
        num_rays_per_batch=64, is_pixel_ratio=0.25, iters_to_start_is=10, seed=1
    )
    idx = sampler.sample_method(64, n, h, w, batch=batch)
    assert idx.shape == (64, 3)
    # before start iters: falls back to uniform
    batch["iter_steps"] = 5
    idx2 = sampler.sample_method(64, n, h, w, batch=batch)
    assert idx2.shape == (64, 3)

    # importance rows come only from nonzero weight regions
    batch["iter_steps"] = 100
    num_ist = int(0.25 * 64)
    ist_rows = sampler.sample_method(64, n, h, w, batch=batch)[:num_ist]
    for c, y, x in ist_rows:
        if weights[c].sum() > 0:
            assert weights[c, y, x] > 0


def test_uniform_sampler_bounds():
    s = PixelSampler(128, seed=0)
    idx = s.sample_method(128, 3, 10, 12)
    assert idx[:, 0].max() < 3 and idx[:, 1].max() < 10 and idx[:, 2].max() < 12
    assert idx.min() >= 0
