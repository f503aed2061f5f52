"""Device mesh + sharding helpers — the NCCL/DDP replacement.

The reference scales with one process per GPU, NCCL all-reduce through
DDP, and rank-gated side effects (ref: scripts/train.py:90-214,
pipelines/base_pipeline.py:244-246, utils/comms.py).  TPU-native
equivalent (SURVEY §2.2): a single program over a ``jax.sharding.Mesh``
— the ray batch is sharded over the ``data`` axis, params are replicated,
and XLA inserts the gradient all-reduce over ICI automatically when the
loss is differentiated under jit.  Multi-host runs call
``jax.distributed.initialize`` once; "rank 0" checks become
``jax.process_index() == 0``.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed(
    coordinator: Optional[str] = None,
    num_machines: int = 1,
    machine_rank: int = 0,
):
    """Multi-host bring-up (ref: train.py:124-137's dist.init_process_group,
    configs/base_config.py:68-75 machine_rank/num_machines/dist_url).
    Without a coordinator this is a no-op; with one, every process calls
    this with its rank and blocks until all ``num_machines`` rendezvous."""
    if coordinator:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_machines,
            process_id=machine_rank,
        )


def make_data_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over all local (or given) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, axis_names=(DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (ray) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place host arrays onto the mesh, ray axis sharded."""
    sharding = batch_sharding(mesh)
    return {
        k: jax.device_put(v, sharding) if hasattr(v, "shape") and np.ndim(v) > 0 else v
        for k, v in batch.items()
    }


def replicate_tree(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def is_main_process() -> bool:
    """(ref: utils/comms.py:18-40 is_main_process)."""
    return jax.process_index() == 0
