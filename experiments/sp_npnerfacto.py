"""NeRFPlayer-nerfacto on StadiumPlayers (ref: experiments/sp_npnerfacto.py)."""
from snt_experiment import Experiment


def main():
    exp = Experiment("sp_npnerfacto", "data/stadium/camera_paths/nicecam.json",
                     "nerfplayer-nerfacto", "stadium-data")
    exp.set_params(
        [
            {"pipeline.model.temporal-dim": t} for t in (16, 32, 64, 128)
        ]
    )
    exp.run(do_eval=True)


if __name__ == "__main__":
    main()
