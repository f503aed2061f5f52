"""IST + ISG combination study (ref: experiments/ist_isg.py)."""
from snt_experiment import Experiment


def main():
    exp = Experiment("ist_isg", "data/stadium/camera_paths/nicecam.json",
                     "k-planes", "stadium-data")
    exp.set_params(
        [
            {"pipeline.datamanager.isg": "false", "pipeline.datamanager.ist-range": 1.0},
            {"pipeline.datamanager.isg": "true", "pipeline.datamanager.isg-gamma": 5e-2},
            {"pipeline.datamanager.isg": "true", "pipeline.datamanager.isg-gamma": 5e-2,
             "pipeline.datamanager.iters-to-start-is": 1000},
        ]
    )
    exp.run(do_eval=True)


if __name__ == "__main__":
    main()
