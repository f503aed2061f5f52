"""K-Planes temporal-resolution sweep (ref: experiments/kp_temporal_res.py)."""
from snt_experiment import Experiment


def main():
    exp = Experiment("kp_temporal_res", "data/stadium/camera_paths/nicecam.json",
                     "k-planes", "stadium-data")
    exp.set_params(
        [
            {"pipeline.model.spacetime-resolution": f"64 64 64 {t}"}
            for t in (25, 50, 100, 200)
        ]
    )
    exp.run(do_eval=True)


if __name__ == "__main__":
    main()
