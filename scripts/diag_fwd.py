"""Forward-kernel body ablation (TPU): attribute packed_bilerp_fwd_group's
time the way diag_fold did for the backward (PERF.md).

Variants strip one stage each: 'ones' skips the one-hot build, 'noweights'
skips the corner-weight selects, 'nofoldmm' skips the per-sub-chunk fold
matmul (emits the raw corner block), 'nomm' skips the gather matmul,
'nopend' replaces the pending-merge machinery with a plain store,
'nobody' leaves only the DMA + loop.

Run: python scripts/diag_fwd.py [names...]
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from scripts.microbench_r2 import bench  # noqa: E402
from soccernerfs_tpu.ops.pallas import plane_kernels as pk  # noqa: E402

CHUNK, SUB, SC, LANES, FEAT = pk.CHUNK, pk.SUB, pk.SC, pk.LANES, pk.FEAT
NBUF = pk.NBUF


def _diag_kernel(ts_ref, meta_ref, *refs, tr, group, planes, grid_n, mode):
    table_refs = refs[:planes]
    out_refs = refs[planes:2 * planes]
    s_meta, s_pend, s_state, sems, osems = refs[2 * planes:]
    b = pl.program_id(0)
    nbuf = s_meta.shape[0]

    lane_i = jax.lax.broadcasted_iota(jnp.int32, (LANES, FEAT), 0)
    lane_o = jax.lax.broadcasted_iota(jnp.int32, (LANES, FEAT), 1)
    fold = (lane_i % FEAT == lane_o).astype(jnp.float32)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    x_hi = (lane1 // FEAT) % 2 == 1
    y_hi = lane1 // (2 * FEAT) == 1

    def meta_cp(sc_row, slot):
        return pltpu.make_async_copy(meta_ref.at[sc_row], s_meta.at[slot],
                                     sems.at[slot])

    def flush_cp(slot, p, row):
        return pltpu.make_async_copy(s_pend.at[slot, p], out_refs[p].at[row],
                                     osems.at[slot, p])

    @pl.when(b == 0)
    def _():
        s_state[0] = 0
        s_state[1] = 0
        s_state[2] = 0
        s_state[3] = 0

    for g in range(group):
        t = b * group + g
        start = ts_ref[t]
        end = ts_ref[t + 1]
        r0 = start // SC
        n = jnp.maximum((end + SC - 1) // SC - r0, 0)
        base = t * tr

        for w in range(nbuf - 1):
            @pl.when(w < n)
            def _():
                meta_cp(r0 + w, w).start()

        def body(k, _):
            slot = jax.lax.rem(k, nbuf)

            @pl.when(k + nbuf - 1 < n)
            def _():
                meta_cp(r0 + k + nbuf - 1,
                        jax.lax.rem(k + nbuf - 1, nbuf)).start()

            meta_cp(r0 + k, slot).wait()
            blk = s_meta[slot]
            if "nobody" in mode:
                nr = blk.shape[0]
                s_pend[0, 0, 0:nr] += blk
                return 0
            wys = []
            for j in range(SUB):
                ty = blk[8 * planes + j][:, None]
                wys.append(jnp.where(y_hi, ty, 1.0 - ty))
            blocks, masks = [], []
            for p in range(planes):
                tile = table_refs[p][g * tr:(g + 1) * tr]
                vals, ms = [], []
                for j in range(SUB):
                    idx = blk[SUB * p + j].astype(jnp.int32)[:, None]
                    d2 = idx - base
                    if "ones" in mode:
                        oh = jnp.full((CHUNK, tr), 1.0, jnp.bfloat16) * (
                            d2[:, :1] * 0.0 + 1.0).astype(jnp.bfloat16)
                    else:
                        oh = (d2 == jax.lax.broadcasted_iota(
                            jnp.int32, (CHUNK, tr), 1)).astype(jnp.bfloat16)
                    if "nomm" in mode:
                        rows = oh[:, 0:LANES].astype(jnp.float32)
                    else:
                        rows = jnp.dot(oh, tile,
                                       preferred_element_type=jnp.float32)
                    if "noweights" in mode:
                        rw = rows
                    else:
                        tx = blk[SUB * (planes + p) + j][:, None]
                        wx = jnp.where(x_hi, tx, 1.0 - tx)
                        rw = rows * wx * wys[j]
                    if "nofoldmm" in mode:
                        vals.append(rw[:, :FEAT])
                    else:
                        vals.append(jnp.dot(rw, fold,
                                            preferred_element_type=jnp.float32))
                    m = ((d2 >= 0) & (d2 < tr)).astype(jnp.float32)
                    ms.append(jnp.broadcast_to(m, (CHUNK, FEAT)))
                blocks.append(jnp.concatenate(vals, axis=1))
                masks.append(jnp.concatenate(ms, axis=1))

            if "nopend" in mode:
                # plain store: ignores cross-stripe block sharing
                for p in range(planes):
                    s_pend[0, p] = blocks[p]
                    flush_cp(0, p, r0 + k).start()
                    flush_cp(0, p, r0 + k).wait()
                return 0

            rowk = r0 + k
            pend = s_state[0]

            @pl.when(pend == rowk + 1)
            def _():
                act = jax.lax.rem(s_state[1], 2)
                for p in range(planes):
                    s_pend[act, p] = jnp.where(
                        masks[p] > 0.5, blocks[p], s_pend[act, p]
                    )

            @pl.when(pend != rowk + 1)
            def _():
                @pl.when(pend != 0)
                def _():
                    fc = s_state[1]
                    act = jax.lax.rem(fc, 2)
                    for p in range(planes):
                        flush_cp(act, p, pend - 1).start()

                    @pl.when(act == 0)
                    def _():
                        s_state[2] = pend

                    @pl.when(act == 1)
                    def _():
                        s_state[3] = pend

                    s_state[1] = fc + 1
                act2 = jax.lax.rem(s_state[1], 2)
                infl = jnp.where(act2 == 0, s_state[2], s_state[3])

                @pl.when(infl != 0)
                def _():
                    for p in range(planes):
                        flush_cp(act2, p, infl - 1).wait()

                    @pl.when(act2 == 0)
                    def _():
                        s_state[2] = 0

                    @pl.when(act2 == 1)
                    def _():
                        s_state[3] = 0

                for p in range(planes):
                    s_pend[act2, p] = blocks[p]
                s_state[0] = rowk + 1

            return 0

        jax.lax.fori_loop(0, n, body, 0)

    if "nopend" not in mode and "nobody" not in mode:
        @pl.when(b == grid_n - 1)
        def _():
            pend = s_state[0]

            @pl.when(pend != 0)
            def _():
                fc = s_state[1]
                act = jax.lax.rem(fc, 2)
                for p in range(planes):
                    flush_cp(act, p, pend - 1).start()

                @pl.when(act == 0)
                def _():
                    s_state[2] = pend

                @pl.when(act == 1)
                def _():
                    s_state[3] = pend

            for slot in range(2):
                infl = s_state[2 + slot]

                @pl.when(infl != 0)
                def _():
                    for p in range(planes):
                        flush_cp(slot, p, infl - 1).wait()


@functools.partial(jax.jit, static_argnames=("tr", "group", "mode"))
def diag_fwd(tables, rowids, txs, ty, *, tr, group, mode):
    planes = len(tables)
    r, lanes = tables[0].shape
    r_pad, grid = pk._grid_shape(r, tr, group)
    tables_p = [
        pk._pad_rows(t.astype(jnp.bfloat16), tr * group) for t in tables
    ]
    m = rowids[0].shape[0]
    pad = (-m) % SC + SC
    meta = jnp.concatenate(
        [pk._rows(i, float(r_pad + 1), pad) for i in rowids]
        + [pk._rows(tx, 0.0, pad) for tx in txs]
        + [pk._rows(ty, 0.0, pad)],
        axis=1,
    )
    ts = pk.tile_starts(rowids[0], r_pad, tr)
    s_rows = meta.shape[0]

    outs = pl.pallas_call(
        functools.partial(_diag_kernel, tr=tr, group=group, planes=planes,
                          grid_n=grid, mode=mode),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
            + [
                pl.BlockSpec((tr * group, LANES), lambda b, ts: (b, 0))
                for _ in range(planes)
            ],
            out_specs=tuple(
                pl.BlockSpec(memory_space=pl.ANY) for _ in range(planes)
            ),
            scratch_shapes=[
                pltpu.VMEM((NBUF, 8 * planes + SUB, CHUNK), jnp.float32),
                pltpu.VMEM((2, planes, CHUNK, LANES), jnp.float32),
                pltpu.SMEM((4,), jnp.int32),
                pltpu.SemaphoreType.DMA((NBUF,)),
                pltpu.SemaphoreType.DMA((2, planes)),
            ],
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((s_rows, CHUNK, LANES), jnp.float32)
            for _ in range(planes)
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=False,
    )(ts, meta, *tables_p)
    if planes == 1:
        outs = (outs,) if not isinstance(outs, (tuple, list)) else outs
    return [pk.unpack_features(o, m) for o in outs]


def main():
    rng = np.random.default_rng(0)
    M = 262_144
    h = w = 1024
    planes = 2
    tr, group = 1024, 2
    y = np.sort(rng.uniform(0, h - 1, M)).astype(np.float32)
    x = rng.uniform(0, w - 1, M).astype(np.float32)
    rowid = jnp.asarray(
        (y.astype(np.int32) * w + x.astype(np.int32)).astype(np.int32))
    tx = jnp.asarray((x - np.floor(x)).astype(np.float32))
    ty = jnp.asarray((y - np.floor(y)).astype(np.float32))
    tables = [
        jnp.asarray(rng.standard_normal((h * w, LANES)).astype(np.float32)
                    ).astype(jnp.bfloat16)
        for _ in range(planes)
    ]

    modes = [
        frozenset(),
        frozenset({"ones"}),
        frozenset({"noweights"}),
        frozenset({"nofoldmm"}),
        frozenset({"nomm"}),
        frozenset({"nopend"}),
        frozenset({"nobody"}),
    ]
    which = sys.argv[1:] or None
    for mode in modes:
        name = "+".join(sorted(mode)) or "full"
        if which and name not in which:
            continue

        def step(c, args, mode=mode):
            tables_, rowid_, tx_, ty_ = args
            outs = diag_fwd(
                tables_, [rowid_ + (c * 0).astype(jnp.int32)] * planes,
                [tx_ + c] * planes, ty_, tr=tr, group=group, mode=mode,
            )
            return c + outs[0][0, 0] * 1e-20

        bench(f"diag_fwd[{name}] tr={tr} g={group} P={planes}",
              step, jnp.float32(0.0), (tables, rowid, tx, ty), n1=3, n2=13)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
