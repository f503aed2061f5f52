"""Per-call measured floor for the k-planes FULL-UPDATE step's proposal
scatter kernels (VERDICT r4 weak #2: the 16 ms "scatter kernels" extras
segment had no kfloor-style measurement).

The call inventory is captured by TRACING the pinned bench workload's
full-update step (eval_shape with the pallas gates forced) — every
`packed_bilerp_bwd_group` call's (planes, m, feat, r, tr, group):

    prop2 (m = 4096 x 128 = 524288, feat 8):
        planes=3 r=25600 tr=64 group=21   (time planes, 100x256 packed)
        planes=2 r=65536 tr=64 group=32   (xy/xz/yz spatial pairs)
        planes=1 r=65536 tr=64 group=64
    prop1 (m = 4096 x 256 = 1048576, feat 8):
        planes=3 r=12800 tr=32 group=42
        planes=2 r=16384 tr=32 group=64
        planes=1 r=16384 tr=32 group=128

Each call runs standalone with the marginal-cost harness (the axon
tunnel adds ~30 ms/call; closures bake constants) on SORTED row ids —
the in-step stream arrives sorted by the stripe key, so this is the
kernel's honest in-context floor.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/kfloor_r5.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from scripts.microbench_r2 import bench  # noqa: E402
from soccernerfs_tpu.ops.pallas import plane_kernels as pk  # noqa: E402

rng = np.random.default_rng(0)

# (planes, m, feat, r, tr, group) — traced from the full-update step
CALLS = [
    (3, 524288, 8, 25600, 64, 21),
    (2, 524288, 8, 65536, 64, 32),
    (1, 524288, 8, 65536, 64, 64),
    (3, 1048576, 8, 12800, 32, 42),
    (2, 1048576, 8, 16384, 32, 64),
    (1, 1048576, 8, 16384, 32, 128),
]


def make_case(planes, m, feat, r):
    # packed rows: r is the PACKED row count (r4 = r_full // g_pack);
    # rowids address packed rows, sorted (in-step stream is stripe-sorted)
    w4 = 4 * feat  # packed lane count per plane row quad
    rowids = np.sort(rng.integers(0, r * (128 // w4), m)).astype(np.int32)
    gs = [jnp.asarray(rng.standard_normal((m, feat)).astype(np.float32)
                      .astype(np.float16).astype(np.float32))
          for _ in range(planes)]
    gs = [g.astype(jnp.bfloat16) for g in gs]
    txs = [jnp.asarray(rng.uniform(0, 1, m).astype(np.float32))
           for _ in range(planes)]
    ty = jnp.asarray(rng.uniform(0, 1, m).astype(np.float32))
    return gs, [jnp.asarray(rowids)] * planes, txs, ty


def main():
    print(f"devices: {jax.devices()}")
    total = 0.0
    for planes, m, feat, r, tr, group in CALLS:
        gs, rowids, txs, ty = make_case(planes, m, feat, r)

        def call(c, args):
            gs_, rowids_, txs_, ty_ = args
            gs_ = [g + c.astype(jnp.bfloat16) for g in gs_]
            outs = pk.packed_bilerp_bwd_group(
                gs_, rowids_, txs_, ty_, r=r, tr=tr, group=group,
                interpret=False,
            )
            return c + sum(jnp.sum(o) for o in outs) * 1e-20

        ms = bench(
            f"propscatter planes={planes} m={m} r={r} tr={tr} group={group}",
            call, jnp.float32(0.0), (gs, rowids, txs, ty), n1=3, n2=9,
        )
        total += ms if ms is not None else 0.0
    print(f"TOTAL propscatter floor: {total:.2f} ms")


if __name__ == "__main__":
    main()
