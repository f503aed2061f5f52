"""Number-of-training-cameras sweep (ref: experiments/stadiumplayers_nb_cams.py)."""
from snt_experiment import Experiment


def main():
    exp = Experiment("stadiumplayers_nb_cams", "data/stadium/camera_paths/nicecam.json",
                     "k-planes", "")
    exp.set_params(
        [{}] * 4,
        data_params=[
            {"train-split-percentage": p} for p in (0.25, 0.5, 0.75, 0.95)
        ],
    )
    exp.dataset = "stadium-data"
    exp.run(do_eval=True)


if __name__ == "__main__":
    main()
