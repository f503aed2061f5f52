"""Quality regression: K-Planes must actually LEARN, not just run.

Trains k-planes-static on the synthetic blender fixture (analytic
ball+floor scene) for a few hundred steps and checks held-out-view PSNR.
This is the fixture-scale stand-in for the reference's 0.2 dB-parity
north star (BASELINE.md): any change that silently breaks gradients,
sampling distributions, or the bf16 precision policy shows up here as a
multi-dB drop.  Measured headroom: ~22 dB at 300 steps on CPU.
"""
import json

import pytest

from soccernerfs_tpu.data.fixtures import make_blender_fixture
from soccernerfs_tpu.scripts import eval as eval_script
from soccernerfs_tpu.scripts import train as train_script


@pytest.mark.slow
def test_kplanes_static_converges(tmp_path):
    data = tmp_path / "data"
    data.mkdir()
    make_blender_fixture(str(data))
    out = tmp_path / "outputs"
    train_script.main([
        "k-planes-static",
        "--max-num-iterations", "300",
        "--steps-per-save", "300",
        "--output-dir", str(out),
        "--pipeline.model.spacetime-resolution", "16", "16", "16",
        "--pipeline.model.multiscale-res", "1", "2",
        "--pipeline.model.feature-dim", "8",
        "--pipeline.model.num-proposal-samples-per-ray", "24", "16",
        "--pipeline.model.num-nerf-samples-per-ray", "16",
        "--pipeline.model.sigma-net-hidden-dim", "32",
        "--pipeline.model.rgb-net-hidden-dim", "32",
        "--pipeline.datamanager.train-num-rays-per-batch", "512",
        "blender-data", "--data", str(data),
    ])
    cfg = sorted(out.glob("*/k-planes-static/*/config.yml"))[-1]
    eval_script.main([
        "--load-config", str(cfg),
        "--output-path", str(tmp_path / "r.json"),
        "--no-dynmetric",
    ])
    results = json.loads((tmp_path / "r.json").read_text())["results"]
    psnr, ssim = results["psnr"], results["ssim"]
    # round-3 measured values on this fixture/schedule: 22.05 dB / 0.490
    # SSIM — the gates sit ~1.5 dB / ~0.05 below so a 1 dB regression
    # (e.g. a silent bf16/kernel change) fails while run-to-run noise
    # (~0.2 dB) passes (VERDICT r2 item 5).
    assert psnr > 20.5, f"held-out PSNR regressed: {psnr:.2f} dB (expect ~22.0)"
    assert ssim > 0.44, f"held-out SSIM regressed: {ssim:.3f} (expect ~0.49)"
