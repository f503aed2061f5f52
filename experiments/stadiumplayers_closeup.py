"""Close-up training cameras on stadium-wide (ref: experiments/stadiumplayers_closeup.py)."""
from snt_experiment import Experiment


def main():
    exp = Experiment("stadiumplayers_closeup", None, "k-planes", "")
    exp.set_params(
        [{}] * 2,
        data_params=[{"closeup-training": v} for v in ("false", "true")],
    )
    exp.dataset = "stadiumwide-data"
    exp.run(do_eval=True, do_render=False)


if __name__ == "__main__":
    main()
