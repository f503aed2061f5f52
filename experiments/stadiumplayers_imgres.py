"""Image-resolution sweep, players subset (ref: experiments/stadiumplayers_imgres.py)."""
from snt_experiment import Experiment


def main():
    exp = Experiment("stadiumplayers_imgres", "data/stadium/camera_paths/nicecam.json",
                     "k-planes", "")
    exp.set_params([{}] * 2, data_params=[{"downscale-factor": d} for d in (2, 4)])
    exp.dataset = "stadium-data"
    exp.run(do_eval=True)


if __name__ == "__main__":
    main()
