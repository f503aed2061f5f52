"""Pack-transpose variants for the fold backward's gradient prep (r4).

The fold kernel consumes g as [S, CHUNK, SUB*feat] blocks; XLA-side
pack_features pays a (j, c) transpose per plane (the ~9 ms "bwd g/meta
prep" segment).  Variants measured here at the in-step shape
(m=262144, feat=32):

  cur   - per-plane pack_features(g.astype(bf16)) + lane concat (today)
  f32t  - transpose in f32, convert to bf16 last
  joint - lane-concat planes first, one wide transpose
  sigma - gather with block-order indices (sigma-permute) instead of a
          transpose (gathers measured 1.6-1.8 ns/row on small sources)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_pack.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from jax.experimental import pallas as pl  # noqa: E402

from soccernerfs_tpu.ops.pallas.plane_kernels import (  # noqa: E402
    CHUNK, SC, SUB, pack_features,
)
from scripts.microbench_r2 import bench  # noqa: E402

rng = np.random.default_rng(0)


def _first_block_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[0]


def consume(out):
    """Opaque consumer: a pallas call forces the operand to materialize
    in the default row-major layout (like the real fold kernel input),
    so XLA cannot elide the pack transpose or defer it as a bitcast."""
    blk = pl.pallas_call(
        _first_block_kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((1,) + out.shape[1:], lambda i: (0, 0, 0))],
        out_specs=pl.BlockSpec(out.shape[1:], lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct(out.shape[1:], out.dtype),
    )(out)
    return blk.astype(jnp.float32)[0, :8].sum()


def main():
    print("devices:", jax.devices())
    m, feat = 262_144, 32
    s_rows = (m + (-m) % SC + SC) // SC

    for planes in (2, 3):
        gs = [
            jnp.asarray(rng.standard_normal((m, feat), dtype=np.float32))
            for _ in range(planes)
        ]

        def cur(c, gs):
            out = jnp.concatenate(
                [pack_features((g + c).astype(jnp.bfloat16), s_rows)
                 for g in gs], axis=1)
            return c + consume(out)

        def f32t(c, gs):
            out = jnp.concatenate(
                [pack_features(g + c, s_rows).astype(jnp.bfloat16)
                 for g in gs], axis=1)
            return c + consume(out)

        def joint(c, gs):
            gw = jnp.concatenate([g + c for g in gs], axis=1)  # [m, P*feat]
            gw = jnp.concatenate(
                [gw.astype(jnp.bfloat16),
                 jnp.zeros((s_rows * SC - m, planes * feat), jnp.bfloat16)],
                0)
            out = (gw.reshape(s_rows, SUB, CHUNK, planes * feat)
                     .transpose(0, 2, 1, 3)
                     .reshape(s_rows, CHUNK, SUB * planes * feat))
            return c + consume(out)

        # block-order gather: out row (s*CHUNK + c) lane group j holds
        # point s*SC + j*CHUNK + c -> gather g rows with sigma indices
        iota = np.arange(s_rows * CHUNK * SUB)
        s_i, rem = np.divmod(iota, CHUNK * SUB)
        c_i, j_i = np.divmod(rem, SUB)
        sigma = jnp.asarray(
            np.minimum(s_i * SC + j_i * CHUNK + c_i, m - 1), jnp.int32)

        def sig(c, gs):
            outs = []
            for g in gs:
                gb = jnp.take((g + c).astype(jnp.bfloat16), sigma, axis=0,
                              mode="clip")
                outs.append(gb.reshape(s_rows, CHUNK, SUB * feat))
            out = jnp.concatenate(outs, axis=1)
            return c + consume(out)

        carry = jnp.zeros((feat,), jnp.float32)
        print(f"-- planes={planes} m={m} --")
        bench(f"cur  P={planes}", cur, carry, gs)
        bench(f"f32t P={planes}", f32t, carry, gs)
        bench(f"joint P={planes}", joint, carry, gs)
        bench(f"sigma P={planes}", sig, carry, gs)


if __name__ == "__main__":
    main()
