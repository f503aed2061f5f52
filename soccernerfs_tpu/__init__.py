"""soccernerfs_tpu — a TPU-native dynamic-NeRF framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
iSach/SoccerNeRFs (nerfstudio fork with K-Planes / NeRFPlayer for dynamic
soccer scenes).  The compute path is pure JAX under a single jitted train
step; hot kernels are Pallas; multi-chip scaling uses jax.sharding meshes.

Layer map (mirrors the reference's L0-L8, re-expressed functionally):
  core/      rays, cameras, scene boxes, pose & Lie-group math   (ref: nerfstudio/cameras, utils)
  ops/       samplers, renderers, losses, encodings, kernels     (ref: model_components, field_components)
  fields/    K-Planes / NeRFPlayer / hash fields                 (ref: nerfstudio/fields)
  models/    model configs + functional forward/loss             (ref: nerfstudio/models)
  data/      dataparsers, datasets, importance sampling          (ref: nerfstudio/data)
  engine/    trainer, optimizers, schedulers, checkpoints        (ref: nerfstudio/engine)
  parallel/  device-mesh & sharding helpers                      (ref: NCCL/DDP path)
  configs/   method registry + CLI                               (ref: nerfstudio/configs)
  utils/     writer, profiler, metrics, colormaps                (ref: nerfstudio/utils)
"""

__version__ = "0.1.0"
