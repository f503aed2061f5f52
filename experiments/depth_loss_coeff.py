"""Depth-loss coefficient sweep (ref: experiments/depth_loss_coeff.py)."""
from snt_experiment import Experiment


def main():
    exp = Experiment("depth_loss_coeff", "data/broadcaststyle/camera_paths/main.json",
                     "k-planes", "broadcaststyle-data --depth-maps depth-maps")
    exp.set_params(
        [
            {"pipeline.model.loss-coefficients.depth-loss": w}
            for w in (0.0, 0.01, 0.05, 0.1, 0.5)
        ]
    )
    exp.run(do_eval=True)


if __name__ == "__main__":
    main()
