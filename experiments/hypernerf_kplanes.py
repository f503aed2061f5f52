"""K-Planes on HyperNeRF captures (ref: experiments/hypernerf_kplanes.py)."""
from snt_experiment import Experiment


def main():
    exp = Experiment("hypernerf_kplanes", None, "k-planes", "hypernerf-data")
    exp.set_params(
        [
            {"pipeline.model.bounded": "false"},
            {"pipeline.model.bounded": "true"},
        ]
    )
    exp.run(do_eval=True, do_render=False)


if __name__ == "__main__":
    main()
