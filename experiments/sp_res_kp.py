"""Spatial-resolution sweep of the K-Planes base grid
(ref: experiments/sp_res_kp.py)."""
from snt_experiment import Experiment


def main():
    exp = Experiment("sp_res_kp", "data/stadium/camera_paths/nicecam.json",
                     "k-planes", "stadium-data")
    exp.set_params(
        [
            {"pipeline.model.spacetime-resolution": f"{r} {r} {r} 100"}
            for r in (32, 64, 128)
        ]
    )
    exp.run(do_eval=True)


if __name__ == "__main__":
    main()
