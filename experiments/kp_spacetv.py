"""Space-TV regularizer weight sweep (ref: experiments/kp_spacetv.py)."""
from snt_experiment import Experiment


def main():
    exp = Experiment("kp_spacetv", "data/stadium/camera_paths/nicecam.json",
                     "k-planes", "stadium-data")
    exp.set_params(
        [
            {"pipeline.model.loss-coefficients.space-tv-loss": w,
             "pipeline.model.loss-coefficients.space-tv-proposal-loss": w}
            for w in (0.0, 0.0002, 0.002, 0.02, 0.2)
        ]
    )
    exp.run(do_eval=True)


if __name__ == "__main__":
    main()
