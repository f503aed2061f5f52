"""Long dynamic-model quality gate on TPU: 5k-step k-planes (4D).

Trains the DYNAMIC k-planes method (full registry loss set: interlevel,
distortion, plane TV, temporal smoothness — configs/method_configs.py)
on the synthetic broadcaststyle fixture (moving ball, 10 frames, 96x96)
for 5000 steps on the real chip, then evals held-out PSNR/SSIM through
the standard eval CLI.  Extends the round-2 2000-step check
(VERDICT r2 item 5); numbers land in PERF.md.

Run (TPU): python scripts/tpu_dynamic_convergence.py [steps]
"""
import json
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from soccernerfs_tpu.data.fixtures import make_broadcaststyle_fixture  # noqa: E402
from soccernerfs_tpu.scripts import eval as eval_script  # noqa: E402
from soccernerfs_tpu.scripts import train as train_script  # noqa: E402


def main(steps: int = 5000) -> None:
    tmp = pathlib.Path(tempfile.mkdtemp(prefix="snt_dynconv_"))
    # 7 train views + the held-out Camera_20: 3 train views of a DYNAMIC
    # scene leave the held-out view genuinely unconstrained (~15 dB) and
    # gate nothing; 7 views pin a meaningful reconstruction number
    data = make_broadcaststyle_fixture(
        tmp / "data", num_cameras=8, num_steps=10, h=96, w=96
    )
    out = tmp / "outputs"
    t0 = time.time()
    train_script.main([
        "k-planes",
        "--max-num-iterations", str(steps),
        "--steps-per-save", str(steps),
        "--output-dir", str(out),
        "--vis", "terminal",
        "--pipeline.model.spacetime-resolution", "32", "32", "32", "10",
        "--pipeline.model.multiscale-res", "1", "2", "4",
        "broadcaststyle-data", "--data", str(data),
    ])
    train_s = time.time() - t0
    cfg = sorted(out.glob("*/k-planes/*/config.yml"))[-1]
    eval_script.main([
        "--load-config", str(cfg),
        "--output-path", str(tmp / "r.json"),
        "--no-dynmetric",
    ])
    results = json.loads((tmp / "r.json").read_text())["results"]
    print(json.dumps({
        "metric": "kplanes_dynamic_5k_heldout",
        "steps": steps,
        "psnr": round(results["psnr"], 2),
        "ssim": round(results["ssim"], 3),
        "train_s": round(train_s, 1),
        "ms_per_step": round(train_s / steps * 1e3, 1),
    }), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5000)
