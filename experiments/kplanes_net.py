"""K-Planes decoder-network size sweep (ref: experiments/kplanes_net.py)."""
from snt_experiment import Experiment


def main():
    exp = Experiment("kplanes_net", "data/stadium/camera_paths/nicecam.json",
                     "k-planes", "stadium-data")
    exp.set_params(
        [
            {"pipeline.model.sigma-net-hidden-dim": s,
             "pipeline.model.rgb-net-hidden-dim": r}
            for (s, r) in ((64, 64), (128, 64), (128, 128), (256, 128))
        ]
    )
    exp.run(do_eval=True)


if __name__ == "__main__":
    main()
