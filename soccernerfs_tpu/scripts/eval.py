"""snt-eval — offline metrics to JSON (ref: scripts/eval.py:19-46).

    python -m soccernerfs_tpu.scripts.eval \
        --load-config outputs/<exp>/<method>/<ts>/config.yml \
        --output-path results.json

Renders every eval image and reports averaged psnr/ssim/lpips plus the
detection-gated dpsnr/dssim/dlpips (DynMetric) and throughput
(ref: pipelines/base_pipeline.py:323-362).
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

from soccernerfs_tpu.utils import metrics as M
from soccernerfs_tpu.utils.dynmetric import DynMetric
from soccernerfs_tpu.utils.eval_utils import eval_setup


def average_eval_image_metrics(trainer, use_dynmetric: bool = True) -> dict:
    """(ref: base_pipeline.py:323-362 + models/kplanes.py:454-506)."""
    dynmetric = DynMetric() if use_dynmetric else None
    per_image = []
    num_rays = 0
    t0 = time.time()
    dm = trainer.datamanager
    for idx in range(len(dm.eval_dataset)):
        _, _, batch = dm.next_eval_image(idx)
        outputs = trainer.render_camera(trainer.eval_cameras, idx)
        gt = np.asarray(batch["image"], np.float32)
        m = M.all_image_metrics(outputs["rgb"], gt)
        if dynmetric is not None:
            name = dm.eval_dataset.image_filenames[idx].name
            _, dpsnr, dssim, dlpips = dynmetric(gt, outputs["rgb"], image_name=name)
            m.update({"dpsnr": dpsnr, "dssim": dssim, "dlpips": dlpips})
        per_image.append(m)
        num_rays += gt.shape[0] * gt.shape[1]
    dt = time.time() - t0

    keys = per_image[0].keys()
    # Learned metrics (lpips / dynmetric) degrade to NaN when pretrained
    # weights are unavailable; emit an explicit null instead of letting
    # nanmean warn on an all-NaN slice (ref: utils/dynmetric.py:79-80).
    metrics: dict = {}
    unavailable = []
    for k in keys:
        vals = np.asarray([m[k] for m in per_image], np.float64)
        finite = vals[np.isfinite(vals)]
        if finite.size == 0:
            metrics[k] = None
            unavailable.append(k)
        else:
            metrics[k] = float(finite.mean())
    if unavailable:
        print(
            "note: metrics unavailable in this environment (no pretrained "
            f"weights): {', '.join(unavailable)} — reported as null"
        )
    metrics["num_rays_per_sec"] = num_rays / dt
    metrics["fps"] = len(per_image) / dt
    return metrics


def main(argv=None):
    parser = argparse.ArgumentParser("snt-eval")
    parser.add_argument("--load-config", type=Path, required=True)
    parser.add_argument("--output-path", type=Path, default=Path("output.json"))
    parser.add_argument("--load-step", type=int, default=None)
    parser.add_argument("--no-dynmetric", action="store_true")
    args = parser.parse_args(argv)

    config, trainer, step = eval_setup(args.load_config, "test", args.load_step)
    metrics = average_eval_image_metrics(trainer, use_dynmetric=not args.no_dynmetric)

    # JSON shape mirrors ns-eval (ref: scripts/eval.py:32-42)
    benchmark_info = {
        "experiment_name": config.experiment_name,
        "method_name": config.method_name,
        "checkpoint": str(step),
        "results": metrics,
    }
    args.output_path.parent.mkdir(parents=True, exist_ok=True)
    args.output_path.write_text(json.dumps(benchmark_info, indent=2), "utf8")
    print(f"saved metrics to {args.output_path}")
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
