"""Scene-box size sweep (ref: experiments/stadium_size.py)."""
from snt_experiment import Experiment


def main():
    exp = Experiment("stadium_size", "data/stadium/camera_paths/nicecam.json",
                     "k-planes", "")
    exp.set_params(
        [{}] * 3,
        data_params=[
            {"scene-scale": s} for s in (1.0, 1.5, 2.0)
        ],
    )
    exp.dataset = "stadium-data"
    exp.run(do_eval=True)


if __name__ == "__main__":
    main()
