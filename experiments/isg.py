"""ISG vs IST comparison (ref: experiments/isg.py, ist_isg.py)."""
from snt_experiment import Experiment


def main():
    exp = Experiment("isg", "data/stadium/camera_paths/nicecam.json",
                     "k-planes", "stadium-data")
    exp.set_params(
        [
            {"pipeline.datamanager.isg": "true",
             "pipeline.datamanager.isg-gamma": g}
            for g in (1e-2, 5e-2, 1e-1)
        ]
        + [{"pipeline.datamanager.isg": "false",
            "pipeline.datamanager.ist-range": "1.0"}]
    )
    exp.run(do_eval=True)


if __name__ == "__main__":
    main()
