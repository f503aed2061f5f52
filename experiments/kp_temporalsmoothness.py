"""Time-smoothness regularizer sweep (ref: experiments/kp_temporalsmoothness.py)."""
from snt_experiment import Experiment


def main():
    exp = Experiment("kp_temporalsmoothness", "data/stadium/camera_paths/nicecam.json",
                     "k-planes", "stadium-data")
    exp.set_params(
        [
            {"pipeline.model.loss-coefficients.time-smoothness-loss": w}
            for w in (0.0, 0.001, 0.1, 1.0, 10.0)
        ]
    )
    exp.run(do_eval=True)


if __name__ == "__main__":
    main()
