"""Sparse-transients regularizer sweep (ref: experiments/kp_sparsetransients.py)."""
from snt_experiment import Experiment


def main():
    exp = Experiment("kp_sparsetransients", "data/stadium/camera_paths/nicecam.json",
                     "k-planes", "stadium-data")
    exp.set_params(
        [
            {"pipeline.model.loss-coefficients.sparse-transients-loss": w}
            for w in (0.0, 0.0001, 0.001, 0.01)
        ]
    )
    exp.run(do_eval=True)


if __name__ == "__main__":
    main()
