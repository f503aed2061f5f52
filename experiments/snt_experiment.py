"""Experiment sweep harness (ref: experiments/ns_experiment.py).

Drives parameter sweeps by shelling out to the snt-train / snt-render /
snt-eval CLIs, grouping runs under one experiment name with a
param-slug timestamp — same surface as the reference's Experiment class
so sweep drivers port one-to-one.

Example:

    exp = Experiment("kp_res_study", "camera_path.json", "k-planes",
                     "broadcaststyle-data --data /data/broadcaststyle")
    exp.set_params([
        {"pipeline.model.multiscale-res": "1 2 4"},
        {"pipeline.model.multiscale-res": "1 2 4 8 16"},
    ])
    exp.run(do_eval=True)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path
from typing import Dict, List, Optional

OUTPUT_ROOT = Path(os.environ.get("SNT_EXPERIMENTS_ROOT", "outputs"))
PY = sys.executable


class Experiment:
    """One sweep: a model, a dataset, and a list of param dicts
    (ref: ns_experiment.py:11-71)."""

    def __init__(self, name: str, cam_path, model: str, dataset: str = ""):
        self.name = name
        self.cam_path = cam_path
        self.model = model
        self.dataset = dataset
        self.params: Optional[List[Dict]] = None
        self.data_params: Optional[List[Dict]] = None
        self._active_params: Optional[Dict] = None
        self._active_data_params: Optional[Dict] = None
        for sub in ("", "renders", "evals"):
            (self.get_path() / sub).mkdir(parents=True, exist_ok=True)

    def set_params(self, params: List[Dict], data_params=None):
        """(ref: ns_experiment.py:53-71)."""
        self.params = [{k: str(v) for k, v in p.items()} for p in params]
        if data_params is not None:
            if isinstance(data_params, dict):
                self.data_params = [
                    {k: str(v) for k, v in data_params.items()}
                ] * len(params)
            else:
                self.data_params = [
                    {k: str(v) for k, v in p.items()} for p in data_params
                ]
        (self.get_path() / "params.json").write_text(json.dumps(self.params, indent=4))

    def run(self, do_eval: bool = False, do_render: bool = True):
        """Train (+render/eval) every parameter combination
        (ref: ns_experiment.py:38-51)."""
        assert self.params is not None, "Params not set"
        for i, param in enumerate(self.params):
            self._active_params = param
            if self.data_params is not None:
                self._active_data_params = self.data_params[i]
            self._train()
            if do_render and self.cam_path:
                self._render()
            if do_eval:
                self._eval()

    # -- steps --------------------------------------------------------------
    def _sh(self, cmd: List[str]):
        print("Running:", " ".join(cmd), flush=True)
        subprocess.run(cmd, check=False)

    def _train(self):
        assert self._active_params is not None
        cmd = [PY, "-m", "soccernerfs_tpu.scripts.train", self.model]
        for k, v in self._active_params.items():
            cmd += [f"--{k}"] + str(v).split()
        cmd += ["--experiment-name", self.name, "--timestamp", self._timestamp()]
        cmd += ["--output-dir", str(OUTPUT_ROOT)]
        if self.dataset:
            cmd += self.dataset.split()
        if self._active_data_params is not None:
            for k, v in self._active_data_params.items():
                cmd += [f"--{k}"] + str(v).split()
        self._sh(cmd)

    def _render(self):
        cam_paths = self.cam_path if isinstance(self.cam_path, list) else [self.cam_path]
        for i, path in enumerate(cam_paths):
            self._sh(
                [
                    PY, "-m", "soccernerfs_tpu.scripts.render",
                    "--load-config", str(self.get_config_path()),
                    "--traj", "filename",
                    "--camera-path-filename", str(path),
                    "--output-path", str(self.get_render_path(i)),
                ]
            )

    def _eval(self):
        self._sh(
            [
                PY, "-m", "soccernerfs_tpu.scripts.eval",
                "--load-config", str(self.get_config_path()),
                "--output-path", str(self.get_eval_path()),
            ]
        )

    # -- paths (ref: ns_experiment.py:117-152) ------------------------------
    def get_path(self) -> Path:
        return OUTPUT_ROOT / self.name

    def get_run_path(self) -> Path:
        return self.get_path() / self.model / self._timestamp()

    def get_config_path(self) -> Path:
        return self.get_run_path() / "config.yml"

    def get_render_path(self, cam_path_id: int = 0) -> Path:
        if isinstance(self.cam_path, list):
            stem = Path(self.cam_path[cam_path_id]).stem
            return self.get_path() / "renders" / self._timestamp() / f"{stem}.mp4"
        return self.get_path() / "renders" / f"{self._timestamp()}.mp4"

    def get_eval_path(self) -> Path:
        return self.get_path() / "evals" / f"{self._timestamp()}.json"

    def _timestamp(self) -> str:
        assert self._active_params is not None
        values = list(self._active_params.values())
        if self._active_data_params is not None:
            values += list(self._active_data_params.values())
        slug = "-".join(str(v).replace(".", "_").replace(" ", "_") for v in values)
        return slug or "default"
