"""Image-resolution sweep on the Stadium scene (ref: experiments/stadium_imgres.py)."""
from snt_experiment import Experiment


def main():
    exp = Experiment("stadium_imgres", "data/stadium/camera_paths/nicecam.json",
                     "k-planes", "")
    exp.set_params([{}] * 3, data_params=[{"downscale-factor": d} for d in (1, 2, 4)])
    exp.dataset = "stadium-data"
    exp.run(do_eval=True)


if __name__ == "__main__":
    main()
