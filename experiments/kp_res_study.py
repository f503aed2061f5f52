"""K-Planes multiscale-resolution sweep on the Stadium scene
(ref: experiments/kp_res_study.py; paper exp 5.3.5)."""
from snt_experiment import Experiment


def main():
    exp = Experiment(
        name="kp_res_study",
        cam_path="data/stadium/camera_paths/nicecam.json",
        model="k-planes",
        dataset="stadium-data",
    )
    base = {"pipeline.model.feature-dim": "32",
            "pipeline.model.spacetime-resolution": "64 64 64 100"}
    exp.set_params(
        [
            {**base, "pipeline.model.multiscale-res": "1 2 4 8"},
            {**base, "pipeline.model.multiscale-res": "1 2 4 8 16"},
            {**base, "pipeline.model.multiscale-res": "1 2 4 8 16 32",
             "pipeline.model.feature-dim": "24"},
        ]
    )
    exp.run(do_eval=True)


if __name__ == "__main__":
    main()
