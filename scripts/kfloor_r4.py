"""Sum the production Pallas kernel costs at the EXACT in-step call
inventory (r4) — the honest structural floor for the fold-bwd and
unpacked-fwd segments of the pinned k-planes step.

The noprop step's fold-backward runs 7 kernel calls (3 spatial scales x
2 spatial groups + the scale-16 time group) at M=262144; this measures
each call standalone (marginal-cost harness) and prints the sum to
compare against the in-step profile segment.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/kfloor_r4.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from scripts.microbench_r2 import bench  # noqa: E402
from soccernerfs_tpu.ops.grid_sample import _fold_group_tiling  # noqa: E402
from soccernerfs_tpu.ops.pallas import plane_kernels as pk  # noqa: E402

rng = np.random.default_rng(0)
M = 262_144

# (h, w, planes) for every fold-eligible call of the reference workload
CALLS = [
    (1024, 1024, 1),
    (512, 512, 1),
    (256, 256, 1),
    (1024, 1024, 2),
    (512, 512, 2),
    (256, 256, 2),
    (100, 1024, 3),
]


def make_case(h, w, planes):
    y = np.sort(rng.uniform(0, h - 1, M)).astype(np.float32)
    x = rng.uniform(0, w - 1, M).astype(np.float32)
    rowid = jnp.asarray(
        (y.astype(np.int32) * w + x.astype(np.int32)).astype(np.int32))
    tx = jnp.asarray((x - np.floor(x)).astype(np.float32))
    ty = jnp.asarray((y - np.floor(y)).astype(np.float32))
    gs = [jnp.asarray(rng.standard_normal((M, 32)).astype(np.float32))
          for _ in range(planes)]
    tables = [jnp.asarray(rng.standard_normal((h * w, 32)).astype(np.float32))
              for _ in range(planes)]
    return gs, tables, [rowid] * planes, [tx] * planes, ty


def main():
    print("devices:", jax.devices())
    tot_b = tot_f = 0.0
    for h, w, planes in CALLS:
        r = h * w
        tr_b, g_b = _fold_group_tiling(r, w, M, planes)
        tr_f, g_f = _fold_group_tiling(r, w, M, planes, fwd=True)
        gs, tables, rowids, txs, ty = make_case(h, w, planes)

        def bwd(c, args):
            gs_, rowids_, txs_, ty_ = args
            outs = pk.bilerp_bwd_group_fold(
                [g + c for g in gs_], rowids_, txs_, ty_,
                h=h, w=w, tr=tr_b, group=g_b)
            return c + sum(o[0, :1] for o in outs)[0]

        def fwd(c, args):
            ts_, rowids_, txs_, ty_ = args
            outs = pk.unpacked_bilerp_fwd_group(
                [t + c for t in ts_], rowids_, txs_, ty_,
                h=h, w=w, tr=tr_f, group=g_f)
            return c + sum(o[0, :1] for o in outs)[0]

        ms_b = bench(f"bwd h{h} w{w} P{planes} tr{tr_b} g{g_b}",
                     bwd, jnp.float32(0), (gs, rowids, txs, ty))
        ms_f = bench(f"fwd h{h} w{w} P{planes} tr{tr_f} g{g_f}",
                     fwd, jnp.float32(0), (tables, rowids, txs, ty))
        tot_b += ms_b
        tot_f += ms_f
    print(f"\nSUM fold-bwd calls: {tot_b:.2f} ms  (in-step segment ~22.5)")
    print(f"SUM unpacked-fwd calls: {tot_f:.2f} ms  (in-step segment ~14.6)")


if __name__ == "__main__":
    main()
