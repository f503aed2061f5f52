"""Fold-bwd kernel body ablation (TPU): where do the microseconds go?

The fold microbench (microbench_r3) showed halving tr leaves the time
unchanged — the kernel is NOT bound by the one-hot MACs or their build,
but by something per-superchunk.  This script times stripped-down kernel
variants (each removes one body stage) at the microbench scale to
attribute the per-iteration cost.  Results land in PERF.md.

Run: python scripts/diag_fold.py
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
BWD_NBUF = pk.BWD_NBUF


def _diag_kernel(ts_ref, meta_ref, g_ref, *refs, tr, group, planes, h, w,
                 spill_pad, mode):
    """_bwd_kernel_fold with stages removable via ``mode`` (a frozenset):
    'ones' constant one-hot; 'nospread' skip tiler matmuls; 'noweights'
    skip wx*wy; 'nomm' skip scatter matmul; 'nobody' skip all compute;
    'nofold' copy accumulator out instead of folding."""
    out_main = refs[:planes]
    s_meta, s_g, s_acc, s_carry, sems, gsems = refs[planes:]
    b = pl.program_id(0)
    nbuf = s_meta.shape[0]
    tg = tr * group
    feat = FEAT

    lane_i = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    lane_o = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    tilers = [
        (lane_i - j * feat == lane_o % feat).astype(jnp.bfloat16)
        for j in range(SUB)
    ]
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    x_hi = (lane1 // feat) % 2 == 1
    y_hi = lane1 // (2 * feat) == 1

    def meta_cp(sc_row, slot):
        return pltpu.make_async_copy(meta_ref.at[sc_row], s_meta.at[slot],
                                     sems.at[slot])

    def g_cp(sc_row, slot):
        return pltpu.make_async_copy(g_ref.at[sc_row], s_g.at[slot],
                                     gsems.at[slot])

    for p in range(planes):
        s_acc[p] = jnp.zeros((tg, LANES), jnp.float32)

    @pl.when(b == 0)
    def _():
        for p in range(planes):
            s_carry[p] = jnp.zeros(s_carry.shape[1:], jnp.float32)

    for g in range(group):
        t = b * group + g
        start = ts_ref[t]
        end = ts_ref[t + 1]
        r0 = start // SC
        n = jnp.maximum((end + SC - 1) // SC - r0, 0)
        base = t * tr

        for q in range(nbuf - 1):
            @pl.when(q < n)
            def _():
                meta_cp(r0 + q, q).start()
                g_cp(r0 + q, q).start()

        def chunk_work(k):
            slot = jax.lax.rem(k, nbuf)

            @pl.when(k + nbuf - 1 < n)
            def _():
                nslot = jax.lax.rem(k + nbuf - 1, nbuf)
                meta_cp(r0 + k + nbuf - 1, nslot).start()
                g_cp(r0 + k + nbuf - 1, nslot).start()

            meta_cp(r0 + k, slot).wait()
            g_cp(r0 + k, slot).wait()
            blk = s_meta[slot]
            if "nobody" in mode:
                # keep the DMAs + loop alive, skip all compute
                s_acc[0, 0:CHUNK] += s_g[slot, 0:CHUNK].astype(jnp.float32)
                return 0
            if "trans" in mode:
                # TRANSPOSED build: per-j [tr, CHUNK] one-hot via a
                # sublane iota against the [1, CHUNK] lane-resident row —
                # no [:, None] relayout, and the scatter matmul becomes a
                # standard ((1,),(0,)) contraction (no oh relayout)
                for p in range(planes):
                    g_blk = s_g[slot, p * CHUNK:(p + 1) * CHUNK]
                    upd = None
                    for j in range(SUB):
                        row = blk[SUB * p + j].astype(jnp.int32)[None, :]
                        ohT = (jax.lax.broadcasted_iota(
                            jnp.int32, (tr, CHUNK), 0) + base
                            == row).astype(jnp.bfloat16)
                        g_tile = jnp.dot(g_blk, tilers[j],
                                         preferred_element_type=jnp.float32)
                        tx = blk[SUB * (planes + p) + j][:, None]
                        ty = blk[8 * planes + j][:, None]
                        wx = jnp.where(x_hi, tx, 1.0 - tx)
                        wy = jnp.where(y_hi, ty, 1.0 - ty)
                        gw_j = (wx * wy * g_tile).astype(jnp.bfloat16)
                        d = jnp.dot(ohT, gw_j,
                                    preferred_element_type=jnp.float32)
                        upd = d if upd is None else upd + d
                    s_acc[p, g * tr:(g + 1) * tr] += upd
                return 0
            for p in range(planes):
                g_blk = s_g[slot, p * CHUNK:(p + 1) * CHUNK]
                ohs, gws = [], []
                for j in range(SUB):
                    idx = blk[SUB * p + j].astype(jnp.int32)[:, None]
                    d2 = idx - base
                    if "ones" in mode:
                        ohs.append(
                            jnp.full((CHUNK, tr), 1.0, jnp.bfloat16)
                            * (d2[:1, :1] * 0.0 + 1.0).astype(jnp.bfloat16))
                    else:
                        ohs.append((d2 == jax.lax.broadcasted_iota(
                            jnp.int32, (CHUNK, tr), 1)).astype(jnp.bfloat16))
                    if "nospread" in mode:
                        g_tile = g_blk.astype(jnp.float32)
                    else:
                        g_tile = jnp.dot(g_blk, tilers[j],
                                         preferred_element_type=jnp.float32)
                    if "noweights" in mode:
                        gws.append(g_tile.astype(jnp.bfloat16))
                    else:
                        tx = blk[SUB * (planes + p) + j][:, None]
                        ty = blk[8 * planes + j][:, None]
                        wx = jnp.where(x_hi, tx, 1.0 - tx)
                        wy = jnp.where(y_hi, ty, 1.0 - ty)
                        gws.append((wx * wy * g_tile).astype(jnp.bfloat16))
                gw = jnp.concatenate(gws, axis=0)
                if "nomm" in mode:
                    s_acc[p, 0:SC] += gw.astype(jnp.float32)
                    # keep the one-hot build alive (shape-matched slice)
                    s_acc[p, 0:CHUNK] += ohs[0][:, 0:LANES].astype(
                        jnp.float32)
                else:
                    oh = jnp.concatenate(ohs, axis=0)
                    s_acc[p, g * tr:(g + 1) * tr] += jax.lax.dot_general(
                        oh, gw,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            return 0

        if "u2" in mode:
            # two superchunks per loop iteration: halves the fori_loop
            # bookkeeping (NOT the DMA count) to isolate loop overhead
            def body(u, _):
                chunk_work(u * 2)

                @pl.when(u * 2 + 1 < n)
                def _():
                    chunk_work(u * 2 + 1)
                return 0

            jax.lax.fori_loop(0, (n + 1) // 2, body, 0)
        else:
            def body(k, _):
                chunk_work(k)
                return 0

            jax.lax.fori_loop(0, n, body, 0)

    halo = w + 1
    fc_main = min(512, tg)
    lane_q = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) // feat
    efold = (
        jax.lax.broadcasted_iota(jnp.int32, (LANES, FEAT), 0) % feat
        == jax.lax.broadcasted_iota(jnp.int32, (LANES, FEAT), 1)
    ).astype(jnp.float32)

    def lmask(q):
        return (lane_q == q).astype(jnp.float32)

    def fold_window(acc, s0, fc):
        gi = jax.lax.broadcasted_iota(jnp.int32, (fc, 1), 0) + b * tg + s0
        col = jax.lax.rem(gi, w)
        nc0 = jnp.where(col == 0, 0.0, 1.0)
        cwm = jnp.where(col == w - 1, 1.0, 0.0)
        rh = jnp.where(gi >= (h - 1) * w, 1.0, 0.0)
        parts = []
        lo = s0 - halo
        if lo < 0:
            parts.append(jnp.zeros((-lo, LANES), jnp.float32))
            lo = 0
        hi = min(s0 + fc, tg)
        if hi > lo:
            parts.append(acc[lo:hi])
        if s0 + fc > tg:
            parts.append(jnp.zeros((s0 + fc - tg, LANES), jnp.float32))
        src = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

        def sh(sft):
            return src[halo - sft:halo - sft + fc]

        m0 = lmask(0) + cwm * lmask(1) + rh * lmask(2) + rh * cwm * lmask(3)
        m1 = nc0 * (lmask(1) + rh * lmask(3))
        mw = lmask(2) + cwm * lmask(3)
        mw1 = nc0 * lmask(3)
        outv = sh(0) * m0 + sh(1) * m1 + sh(w) * mw + sh(w + 1) * mw1
        return jnp.dot(outv, efold, preferred_element_type=jnp.float32)

    for p in range(planes):
        acc = s_acc[p]
        if "nofold" in mode:
            for s0 in range(0, tg, fc_main):
                fc = min(fc_main, tg - s0)
                out_main[p][s0:s0 + fc] = acc[s0:s0 + fc, :FEAT]
            continue
        for s0 in range(0, tg, fc_main):
            fc = min(fc_main, tg - s0)
            outv = fold_window(acc, s0, fc)
            if s0 < spill_pad:
                ce = min(spill_pad, s0 + fc)
                cpart = s_carry[p, s0:ce]
                if ce - s0 < fc:
                    cpart = jnp.concatenate(
                        [cpart, jnp.zeros((fc - (ce - s0), feat),
                                          jnp.float32)], axis=0)
                outv = outv + cpart
            out_main[p][s0:s0 + fc] = outv
        sb = fold_window(acc, tg, spill_pad)
        if spill_pad > tg:
            sb = sb + jnp.concatenate(
                [s_carry[p, tg:],
                 jnp.zeros((tg, feat), jnp.float32)], axis=0
            )
        s_carry[p] = sb


@functools.partial(jax.jit, static_argnames=("h", "w", "tr", "group", "mode"))
def diag_fold(gs, rowids, txs, ty, *, h, w, tr, group, mode):
    planes = len(gs)
    r = h * w
    r_pad, grid = pk._grid_shape(r, tr, group)
    tg = tr * group
    spill_pad = w + 1 + (-(w + 1)) % 8
    m = rowids[0].shape[0]
    pad = (-m) % SC + SC
    parts = (
        [pk._rows(i, float(r_pad + 1), pad) for i in rowids]
        + [pk._rows(tx, 0.0, pad) for tx in txs]
        + [pk._rows(ty, 0.0, pad)]
    )
    s_rows = parts[0].shape[0]
    meta = jnp.concatenate(parts, axis=1)
    gcat = jnp.concatenate(
        [pk.pack_features(g.astype(jnp.bfloat16), s_rows) for g in gs],
        axis=1,
    )
    ts = pk.tile_starts(rowids[0], r_pad, tr)

    outs = pl.pallas_call(
        functools.partial(_diag_kernel, tr=tr, group=group, planes=planes,
                          h=h, w=w, spill_pad=spill_pad, mode=mode),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=tuple(
                pl.BlockSpec((tg, FEAT), lambda b, ts: (b, 0))
                for _ in range(planes)
            ),
            scratch_shapes=[
                pltpu.VMEM((BWD_NBUF, 8 * planes + SUB, CHUNK), jnp.float32),
                pltpu.VMEM((BWD_NBUF, planes * CHUNK, CHUNK), jnp.bfloat16),
                pltpu.VMEM((planes, tg, LANES), jnp.float32),
                pltpu.VMEM((planes, spill_pad, FEAT), jnp.float32),
                pltpu.SemaphoreType.DMA((BWD_NBUF,)),
                pltpu.SemaphoreType.DMA((BWD_NBUF,)),
            ],
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((r_pad, FEAT), jnp.float32)
            for _ in range(planes)
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=False,
    )(ts, meta, gcat)
    if planes == 1:
        outs = (outs,) if not isinstance(outs, (tuple, list)) else outs
    return [o[:r] for o in outs]


def main():
    rng = np.random.default_rng(0)
    M = 262_144
    h = w = 1024
    planes = 2
    tr, group = 2048, 1
    y = np.sort(rng.uniform(0, h - 1, M)).astype(np.float32)
    x = rng.uniform(0, w - 1, M).astype(np.float32)
    rowid = jnp.asarray(
        (y.astype(np.int32) * w + x.astype(np.int32)).astype(np.int32))
    tx = jnp.asarray((x - np.floor(x)).astype(np.float32))
    ty = jnp.asarray((y - np.floor(y)).astype(np.float32))
    gs = [jnp.asarray(rng.standard_normal((M, 32)).astype(np.float32))
          for _ in range(planes)]
    rowids = [rowid] * planes
    txs = [tx] * planes

    modes = [
        frozenset(),                      # full baseline
        frozenset({"nofold"}),            # remove the output fold stage
        frozenset({"ones"}),              # remove the one-hot build
        frozenset({"nospread"}),          # remove the g tiler matmuls
        frozenset({"noweights"}),         # remove wx*wy weighting
        frozenset({"nomm"}),              # remove the scatter matmul
        frozenset({"nobody"}),            # DMA + loop only
        frozenset({"trans"}),             # transposed one-hot + std matmul
        frozenset({"u2"}),                # 2 superchunks per loop iter
        frozenset({"u2", "nobody"}),      # unrolled DMA+loop floor
    ]
    which = sys.argv[1:] or None
    for mode in modes:
        name = "+".join(sorted(mode)) or "full"
        if which and name not in which:
            continue

        def step(c, args, mode=mode):
            gs_, rowids_, txs_, ty_ = args
            outs = diag_fold(
                [g + c for g in gs_], rowids_, txs_, ty_,
                h=h, w=w, tr=tr, group=group, mode=mode,
            )
            return c + outs[0][0, 0] * 1e-20

        bench(f"diag_fold[{name}] tr={tr} g={group} P={planes}",
              step, jnp.float32(0.0), (gs, rowids, txs, ty), n1=3, n2=13)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
