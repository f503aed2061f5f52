"""Round-3 kernel A/Bs (TPU): fold-bwd / fwd-kernel tiling, quad-pack.

Targets the roofline's licensed segments (scripts/roofline.py): the
m=16 spatial group dominates the fold backward's one-hot MACs
(~206 of ~500 GMAC), and quad-pack runs at 28% of streaming.  Uses the
marginal-cost harness from microbench_r2 (axon tunnel adds ~30 ms/call;
closures become baked constants).

Run: python scripts/microbench_r3.py [fold|fwd|pack|all]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from scripts.microbench_r2 import bench  # noqa: E402

rng = np.random.default_rng(0)
M = 262_144


def sorted_points(h, w):
    y = np.sort(rng.uniform(0, h - 1, M)).astype(np.float32)
    x = rng.uniform(0, w - 1, M).astype(np.float32)
    rowid = (y.astype(np.int32) * w + x.astype(np.int32)).astype(np.int32)
    tx = (x - np.floor(x)).astype(np.float32)
    ty = (y - np.floor(y)).astype(np.float32)
    return jnp.asarray(rowid), jnp.asarray(tx), jnp.asarray(ty)


def fold_ab():
    from soccernerfs_tpu.ops.pallas import plane_kernels as pk

    h = w = 1024
    for planes, variants in (
        # tr=4096 g=1 P=2 OOMs scoped VMEM (s_acc 20.4M > 16M limit)
        (2, [(2048, 1), (1024, 2), (1024, 1), (2048, 2)]),
        (1, [(2048, 2), (1024, 4), (1024, 2)]),
    ):
        rowid, tx, ty = sorted_points(h, w)
        gs = [
            jnp.asarray(rng.standard_normal((M, 32)).astype(np.float32))
            for _ in range(planes)
        ]
        rowids = [rowid] * planes
        txs = [tx] * planes
        for tr, group in variants:
            if tr * group * planes > 4096:
                continue

            def step(c, args, tr=tr, group=group):
                gs_, rowids_, txs_, ty_ = args
                outs = pk.bilerp_bwd_group_fold(
                    [g + c for g in gs_], rowids_, txs_, ty_,
                    h=h, w=w, tr=tr, group=group,
                )
                return c + outs[0][0, 0] * 1e-20

            bench(
                f"fold_bwd h=w=1024 P={planes} tr={tr} g={group}",
                step, jnp.float32(0.0), (gs, rowids, txs, ty),
                n1=3, n2=13,
            )
    # time-plane group at m=16 (current policy tr=1024 g=1)
    h2, w2 = 100, 1024
    rowid, tx, ty = sorted_points(h2, w2)
    gs = [jnp.asarray(rng.standard_normal((M, 32)).astype(np.float32))
          for _ in range(3)]

    def stept(c, args):
        gs_, rowids_, txs_, ty_ = args
        outs = pk.bilerp_bwd_group_fold(
            [g + c for g in gs_], rowids_, txs_, ty_,
            h=h2, w=w2, tr=1024, group=1,
        )
        return c + outs[0][0, 0] * 1e-20

    bench("fold_bwd time h=100 w=1024 P=3 tr=1024 g=1",
          stept, jnp.float32(0.0), (gs, [rowid] * 3, [tx] * 3, ty),
          n1=3, n2=13)


def fwd_ab():
    from soccernerfs_tpu.ops.pallas import plane_kernels as pk

    h = w = 1024
    rowid, tx, ty = sorted_points(h, w)
    planes = 2
    tables = [
        jnp.asarray(
            rng.standard_normal((h * w, 128)).astype(np.float32)
        ).astype(jnp.bfloat16)
        for _ in range(planes)
    ]
    for tr, group in ((2048, 1), (1024, 2), (1024, 1), (4096, 1)):

        def step(c, args, tr=tr, group=group):
            tables_, rowid_, tx_, ty_ = args
            outs = pk.packed_bilerp_fwd_group(
                [t for t in tables_], [rowid_ + (c * 0).astype(jnp.int32)] * 2,
                [tx_ + c] * 2, ty_, tr=tr, group=group,
            )
            return c + outs[0][0, 0] * 1e-20

        bench(f"fwd_kernel h=w=1024 P=2 tr={tr} g={group}",
              step, jnp.float32(0.0), (tables, rowid, tx, ty),
              n1=3, n2=13)


def pack_ab():
    from soccernerfs_tpu.ops.grid_sample import quad_pack

    plane = jnp.asarray(
        rng.standard_normal((1024, 1024, 32)).astype(np.float32)
    )

    def cur(c, p):
        return c + quad_pack(p + c).astype(jnp.bfloat16)[0, 0] * 1e-20

    bench("quad_pack concat [1024,1024,32] f32->bf16", cur,
          jnp.float32(0.0), plane, n1=3, n2=13)

    def pad_stack(c, p):
        p = p + c
        pp = jnp.pad(p, ((0, 1), (0, 1), (0, 0)), mode="edge")
        out = jnp.stack(
            [pp[:-1, :-1], pp[:-1, 1:], pp[1:, :-1], pp[1:, 1:]], axis=2
        ).astype(jnp.bfloat16).reshape(1024 * 1024, 128)
        return c + out[0, 0] * 1e-20

    bench("quad_pack pad+stack bf16", pad_stack, jnp.float32(0.0), plane,
          n1=3, n2=13)

    def bf16_first(c, p):
        p = (p + c).astype(jnp.bfloat16)
        pp = jnp.pad(p, ((0, 1), (0, 1), (0, 0)), mode="edge")
        out = jnp.concatenate(
            [pp[:-1, :-1], pp[:-1, 1:], pp[1:, :-1], pp[1:, 1:]], axis=-1
        ).reshape(1024 * 1024, 128)
        return c + out[0, 0] * 1e-20

    bench("quad_pack bf16-first pad+concat", bf16_first, jnp.float32(0.0),
          plane, n1=3, n2=13)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("devices:", jax.devices(), flush=True)
    if which in ("pack", "all"):
        pack_ab()
    if which in ("fold", "all"):
        fold_ab()
    if which in ("fwd", "all"):
        fwd_ab()


if __name__ == "__main__":
    main()
