"""IS parameter grid on StadiumPlayers (ref: experiments/stadiumplayersIS.py;
note the reference references a 'stadiumplayers-data' parser name absent
from its registry — the stadium parser covers that scene here)."""
from snt_experiment import Experiment


def main():
    exp = Experiment("stadiumplayersIS", "data/stadium/camera_paths/nicecam.json",
                     "k-planes", "stadium-data")
    exp.set_params(
        [
            {"pipeline.datamanager.use-importance-sampling": "false"},
            {"pipeline.datamanager.is-pixel-ratio": 0.075},
            {"pipeline.datamanager.is-pixel-ratio": 0.15},
            {"pipeline.datamanager.is-pixel-ratio": 0.3},
        ]
    )
    exp.run(do_eval=True)


if __name__ == "__main__":
    main()
