"""Importance-sampling ratio/range sweep on Stadium
(ref: experiments/stadium_is.py)."""
from snt_experiment import Experiment


def main():
    exp = Experiment("stadium_is", "data/stadium/camera_paths/nicecam.json",
                     "k-planes", "stadium-data")
    exp.set_params(
        [
            {"pipeline.datamanager.is-pixel-ratio": r,
             "pipeline.datamanager.ist-range": rng}
            for r in (0.05, 0.15, 0.3)
            for rng in (0.25, 0.5, 1.0)
        ]
    )
    exp.run(do_eval=True)


if __name__ == "__main__":
    main()
