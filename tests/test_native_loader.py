"""Native C++ data-path tests (native/snt_loader.cpp via data/native_loader).

Builds ``libsnt_loader.so`` (skipped when the toolchain/image libs are
missing), then checks the two contracts the Python fallbacks define:

- ``decode_batch`` reproduces the PIL decode+alpha-composite exactly
  (ref analog: data/utils/dataloaders.py:188-194 threaded decode);
- ``snt_weighted_sample`` is a true inverse-CDF draw: empirical
  frequencies converge to the weight distribution, indices stay in
  range, and without replacement the draws are distinct;
- the CacheDataloader fast path (`_native_decode`) matches the threaded
  PIL collate byte-for-byte.
"""
import subprocess

import numpy as np
import pytest
from PIL import Image

from soccernerfs_tpu.data import native_loader

NATIVE_DIR = native_loader._NATIVE_DIR


def _build_ok() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(NATIVE_DIR)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _build_ok() or not native_loader.available(),
    reason="native toolchain / libsnt_loader.so unavailable",
)


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    # RGB png, RGBA png (exercises the composite), and a jpg
    rgb = rng.integers(0, 256, (12, 16, 3), np.uint8)
    Image.fromarray(rgb).save(root / "a.png")
    paths.append(root / "a.png")
    rgba = rng.integers(0, 256, (12, 16, 4), np.uint8)
    Image.fromarray(rgba, "RGBA").save(root / "b.png")
    paths.append(root / "b.png")
    jpg = rng.integers(0, 256, (12, 16, 3), np.uint8)
    Image.fromarray(jpg).save(root / "c.jpg", quality=95)
    paths.append(root / "c.jpg")
    return paths


@pytest.mark.parametrize("alpha_color", [None, [0.25, 0.5, 0.75]])
def test_decode_batch_matches_pil(image_dir, alpha_color):
    from soccernerfs_tpu.data.datasets import get_image

    out = native_loader.decode_batch(image_dir, 12, 16, alpha_color)
    assert out is not None and out.shape == (3, 12, 16, 3)
    for i, p in enumerate(image_dir):
        ref = get_image(p, 1.0, alpha_color)
        # 1-ulp tolerance: C computes v*(1/255.f), numpy divides by 255.0
        np.testing.assert_allclose(
            out[i], ref.astype(np.float32), atol=1.2e-7, rtol=0,
            err_msg=str(p),
        )


def test_decode_batch_reports_failure(tmp_path):
    bad = tmp_path / "missing.png"
    assert native_loader.decode_batch([bad], 8, 8) is None


def test_weighted_sample_distribution_and_range():
    rng = np.random.default_rng(1)
    w = rng.uniform(0, 1, 256).astype(np.float32)
    w[::7] = 0.0  # zero-weight cells must never be drawn
    k = 200_000
    out = native_loader.weighted_sample(w, k, True, seed=42)
    assert out is not None and out.shape == (k,)
    assert out.min() >= 0 and out.max() < w.size
    counts = np.bincount(out, minlength=w.size)
    assert counts[::7].sum() == 0
    emp = counts / k
    ref = w / w.sum()
    # 200k draws over 256 cells: ~3.7% RMS noise at p~1/256
    np.testing.assert_allclose(emp, ref, atol=6e-3)


def test_weighted_sample_without_replacement_is_distinct():
    w = np.ones(64, np.float32)
    out = native_loader.weighted_sample(w, 64, False, seed=7)
    assert out is not None
    assert sorted(out.tolist()) == list(range(64))


def test_cache_dataloader_native_path_matches_python(tmp_path):
    """End-to-end: the ImageCache fast path returns the same batch as the
    threaded PIL collate (same fixture, native on vs off)."""
    from soccernerfs_tpu.data.dataparsers.blender import BlenderDataParserConfig
    from soccernerfs_tpu.data.datasets import InputDataset
    from soccernerfs_tpu.data.fixtures import make_blender_fixture
    from soccernerfs_tpu.data.image_cache import ImageBatchCache

    make_blender_fixture(str(tmp_path), num_frames=3, h=20, w=20)
    outputs = BlenderDataParserConfig(data=tmp_path).setup() \
        .get_dataparser_outputs("train")
    ds = InputDataset(outputs)
    dl = ImageBatchCache(ds, num_images_to_sample_from=-1)
    native = dl._native_decode(list(range(len(ds))))
    assert native is not None, "native decode fell back on the fixture"
    ref = np.stack([ds[i]["image"] for i in range(len(ds))])
    np.testing.assert_allclose(native, ref, atol=1.2e-7, rtol=0)
