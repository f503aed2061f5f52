"""Full NeRFPlayer on the synthetic stadium-wide scene
(ref: experiments/np_synth_paderborn.py)."""
from snt_experiment import Experiment


def main():
    exp = Experiment("np_synth_paderborn", None, "nerfplayer", "stadiumwide-data")
    exp.set_params(
        [
            {"pipeline.model.prob-reg-loss-mult": w} for w in (0.0001, 0.01, 0.1)
        ]
    )
    exp.run(do_eval=True, do_render=False)


if __name__ == "__main__":
    main()
