"""snt-train — training entry point (ref: scripts/train.py).

Usage mirrors ns-train (ref: README.md:38-45):

    python -m soccernerfs_tpu.scripts.train k-planes \
        --pipeline.model.multiscale-res 1 2 4 8 16 \
        --pipeline.datamanager.ist-range 0.75 \
        broadcaststyle-data --fps-downsample 4 --data <path>

No mp.spawn / NCCL (ref: train.py:90-214): a single JAX program drives
every local device through the trainer's mesh; multi-host runs launch one
process per host with --machine.coordinator set.
"""
from __future__ import annotations

from soccernerfs_tpu.configs.cli import parse_train_cli
from soccernerfs_tpu.engine.trainer import Trainer
from soccernerfs_tpu.utils import profiler


def main(argv=None) -> None:
    config = parse_train_cli(argv)
    config.set_timestamp()
    print(f"[snt-train] method={config.method_name} output={config.get_base_dir()}")
    try:
        trainer = Trainer(config).setup()
        trainer.train()
    finally:
        profiler.flush_profiler()


if __name__ == "__main__":
    main()
