"""Stripe-bucketed bilinear plane sample/scatter kernels (TPU, Pallas).

The K-Planes hot loop is millions of random-row accesses into quad-packed
feature planes (ops/grid_sample.py).  XLA's gather costs ~2-11 ns/row and
its scatter-add ~6-18 ns/row on v5e — together >80% of a train step
(PERF.md).  These kernels exploit a per-axis sort of the sample points:

  * tiles are full ROW-STRIPES of the plane (TR % W == 0), so a point's
    tile depends only on its y coordinate; sorting by continuous y makes
    every scale's tile ids nondecreasing at once — one sort serves all
    multiscale copies of a plane, and only three sort keys (y, z, t) cover
    all six k-planes pairs;
  * each point stripe owns a CONTIGUOUS range of the sorted points (one
    searchsorted per stripe edge);
  * the grid walks GROUPS of stripes (grouping amortizes the ~1.5 us
    per-grid-step pipeline overhead); the group's table block is staged
    HBM->VMEM once by the Pallas pipeline while double-buffered point
    super-chunks (512 points) stream through VMEM scratch via manual DMA;
  * the in-stripe "gather" is a one-hot [512, TR] @ [TR, 128] matmul on
    the MXU — Mosaic's dynamic_gather lowering is broken on this
    toolchain, and the MXU beats it anyway;
  * the backward is the transposed matmul, accumulating the packed-table
    gradient stripe in fp32 VMEM — no scatter ever touches HBM.

Replaces the reference's cuDNN F.grid_sample fwd/bwd
(ref: nerfstudio/utils/interpolation.py:5-33) and the tcnn/CUDA
temporal_gridencoder fwd/bwd pair
(ref: field_components/cuda/csrc/temporal_gridencoder.cu:92,284).

Layout conventions (minor dims are 128 lanes — a Mosaic requirement for
HBM slices):
  * packed table [R, 4F] with 4F == 128 (F == 32); each row is the 2x2
    bilinear corner block (ops/grid_sample.quad_pack);
  * points SORTED so row ids are nondecreasing, padded with a sentinel
    id >= R (their one-hot rows vanish, so padding and foreign points
    are inert);
  * per super-chunk meta block [3*SUB, CHUNK] f32: rows 0:4 row ids
    (exact as floats), 4:8 tx, 8:12 ty; backward gradients ride a
    SEPARATE bf16 [P*CHUNK, CHUNK] block with its own DMA (half the
    bytes of folding them into the f32 meta buffer);
  * features as [Mp/512, CHUNK, 128] blocks: point p = s*512 + j*128 + c
    lives at [s, c, j*32 + f];
  * super-chunk reads are 512-aligned: boundary blocks shared by two
    stripes merge by read-modify-write (stripes run sequentially, so the
    earlier stripe's block is in HBM before the later one merges into it).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

CHUNK = 128          # points per chunk == sublanes of one meta row
SUB = 4              # chunks per super-chunk (lane-packed features)
SC = CHUNK * SUB     # 512 points per super-chunk
LANES = 128          # packed feature width (4F)
FEAT = LANES // 4    # features per plane sample
# forward-kernel prefetch depth (env-tunable for perf A/Bs)
NBUF = int(os.environ.get("SNT_FWD_NBUF", "2"))


def _onehot_block(meta, base, tr):
    """[SC, tr] bf16 one-hot of in-stripe offsets + [CHUNK, LANES] mask."""
    ohs, masks = [], []
    for j in range(SUB):
        d2 = meta[j].astype(jnp.int32)[:, None] - base        # [CHUNK, 1] i32
        ohs.append((d2 == jax.lax.broadcasted_iota(
            jnp.int32, (CHUNK, tr), 1)).astype(jnp.bfloat16))
        m = ((d2 >= 0) & (d2 < tr)).astype(jnp.float32)
        masks.append(jnp.broadcast_to(m, (CHUNK, FEAT)))
    return jnp.concatenate(ohs, axis=0), jnp.concatenate(masks, axis=1)


def _scatter_T(rows, gws, base, tr: int):
    """sum_j onehot_T(rows[j]) @ gws[j] -> [tr, LANES] f32.

    Per-sub-chunk TRANSPOSED one-hots [tr, CHUNK], built from the
    lane-resident [CHUNK] i32 row vectors as-is (no [CHUNK, 1] sublane
    relayout) and fed to STANDARD ((1,), (0,)) matmul contractions.
    The previous [SC, tr] build fed a ((0,), (0,)) contraction that
    relayouts the full one-hot every iteration (diag_fold 'trans'
    ablation, PERF.md); a single fused [tr, SC] one-hot would need a
    [1, SC] lane concat, which Mosaic rejects ("result/input offset
    mismatch on non-concat dimension")."""
    upd = None
    for r, gw_j in zip(rows, gws):
        ohT = (jax.lax.broadcasted_iota(jnp.int32, (tr, CHUNK), 0) + base
               == r[None, :]).astype(jnp.bfloat16)
        d = jnp.dot(ohT, gw_j, preferred_element_type=jnp.float32)
        upd = d if upd is None else upd + d
    return upd


def _fwd_kernel(ts_ref, meta_ref, *refs, tr: int, group: int, planes: int,
                grid_n: int):
    """Multi-plane gather: mirrors _bwd_kernel's stripe/group structure.

    The lerp runs in-kernel: each point's [CHUNK, LANES] one-hot matmul row
    holds the 2x2 corner block; the corner weights are lane-masked selects
    and the 4*FEAT block is reduced to FEAT lanes placed directly in the
    sub-chunk's lane group by a BLOCK-PLACED fold matmul
    (out += rows_weighted @ FOLD_j, FOLD_j[l, o] = (l % FEAT == o % FEAT)
    & (o // FEAT == j)) — full 128-lane MXU width, and the per-sub-chunk
    [CHUNK, FEAT] lane concat disappears (diag_fwd: the narrow fold
    matmuls were 1.06 ms of a 4.29 ms call).

    meta block rows: [0:4P) quad row ids, [4P:8P) tx, [8P:8P+4) shared ty.
    Outputs: one [S, CHUNK, LANES] feature array per plane, lane group j
    of block s holding chunk 4s+j (see pack_features).

    Output blocks shared between adjacent stripes are merged in a VMEM
    PENDING buffer instead of a read-modify-write round trip: sorted rows
    mean a shared block is always visited consecutively, so the kernel
    accumulates into s_pend until the block row changes, then flushes it
    with an ASYNC write (double-buffered; the wait for a slot's previous
    flush happens one flush later).  The pending state persists across
    (sequential) grid steps; the final drain runs at the last step.  At
    the finest scales a stripe holds ~1 super-chunk, so the old
    per-chunk synchronous RMW dominated the kernel.
    """
    table_refs = refs[:planes]
    out_refs = refs[planes:2 * planes]
    s_meta, s_pend, s_state, sems, osems = refs[2 * planes:]
    # s_state (SMEM i32): [0] pending row + 1 (0 = none)
    #                     [1] flush count (active slot = count % 2)
    #                     [2]/[3] last-flushed row + 1 per slot (0 = none,
    #                             cleared when its wait completes)
    b = pl.program_id(0)
    nbuf = s_meta.shape[0]

    lane_ii = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    lane_oo = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    folds = [
        ((lane_ii % FEAT == lane_oo % FEAT)
         & (lane_oo // FEAT == j)).astype(jnp.float32)        # [LANES, LANES]
        for j in range(SUB)
    ]
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
            # shared-ty corner weights: plane-independent, built once per
            # super-chunk instead of once per (plane, sub-chunk)
            wys = []
            for j in range(SUB):
                ty = blk[8 * planes + j][:, None]
                wys.append(jnp.where(y_hi, ty, 1.0 - ty))
            blocks = []
            for p in range(planes):
                tile = table_refs[p][g * tr:(g + 1) * tr]
                block = None
                for j in range(SUB):
                    idx = blk[SUB * p + j].astype(jnp.int32)[:, None]
                    d2 = idx - base
                    oh = (d2 == jax.lax.broadcasted_iota(
                        jnp.int32, (CHUNK, tr), 1)).astype(jnp.bfloat16)
                    rows = jnp.dot(oh, tile,
                                   preferred_element_type=jnp.float32)
                    tx = blk[SUB * (planes + p) + j][:, None]
                    wx = jnp.where(x_hi, tx, 1.0 - tx)
                    # weighted corner rows folded + block-placed on the MXU
                    # (f32: an extra bf16 round here visibly degrades the
                    # lerp vs the XLA reference).  Out-of-stripe and padded
                    # points have all-zero one-hot rows, so their slots are
                    # exactly zero — no validity mask is needed anywhere.
                    v = jnp.dot(rows * wx * wys[j], folds[j],
                                preferred_element_type=jnp.float32)
                    block = v if block is None else block + v
                blocks.append(block)                          # [CHUNK, LANES]

            rowk = r0 + k
            pend = s_state[0]

            @pl.when(pend == rowk + 1)
            def _():
                # same output block as the previous chunk: merge in VMEM.
                # Each point's slot is written by exactly one stripe and
                # foreign/padded slots are exactly zero, so ADDITION is the
                # masked select (kills the mask build + concat entirely)
                act = jax.lax.rem(s_state[1], 2)
                for p in range(planes):
                    s_pend[act, p] += blocks[p]

            @pl.when(pend != rowk + 1)
            def _():
                @pl.when(pend != 0)
                def _():
                    # flush the active slot asynchronously
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
                # the (possibly new) active slot: wait out its previous
                # flush before overwriting
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


def _fwd_kernel_unpacked(ts_ref, meta_ref, *refs, tr: int, group: int,
                         planes: int, grid_n: int, h: int, w: int,
                         n_lines: int):
    """Multi-plane gather from UNPACKED tables ([r/4, 128] lines — a FREE
    bitcast reshape of the [h*w, FEAT] grid, any float dtype) — neither a
    quad-packed nor a padded/bf16-staged table copy ever exists.

    Each bilinear corner is its own one-hot matmul over a quarter-width
    line range: corner (y0, x0) and (y0, x1) live in lines [0, tr/4] of
    the stripe's tile, corners (y1, *) in lines [w/4, tr/4 + w/4] — so the
    4 matmuls cost the same MACs as the packed kernel's single [SC, tr]
    contraction, while the XLA quad-pack pass (8 ms/step at 27% of
    streaming, PERF.md roofline) disappears entirely.  f32 tables convert
    to bf16 on-tile in VMEM (the conversion never touches HBM); bf16
    staged tables (render path) pass through and halve the tile DMA.

    Border replication (ref grid_sample padding_mode="border",
    nerfstudio utils/interpolation.py:5-33) is exact:
      * x border: rowids arrive with x0 <= w-2 unless the point clamps, in
        which case tx carries the clamp; the +dx neighbor select uses
        dx = (col < w-1) so the x1 corner re-reads the x0 cell;
      * y border: the y1 corners fold into the y0 weights via
        wy0 = 1 - ty*dy, wy1 = ty*dy with dy = (row < h-1) — no reads
        outside the table, so the halo needs no zero-fill.

    The tile window (win = tr/4 + 16 + w/4 lines) streams through a
    manually double-buffered VMEM scratch: tile t+1's DMA is issued
    before tile t is processed (BlockSpec pipelining can't express the
    halo overlap).  A tile whose window would read past the table's
    n_lines fetches from a per-plane TAIL buffer instead (the last win
    real lines + win zero lines, built by the wrapper for ~270 KB) at a
    dynamic offset — the main table needs no end padding, which is what
    lets the wrapper pass the raw parameter grid.  Output/pending-merge
    machinery is identical to _fwd_kernel.
    """
    table_refs = refs[:planes]                  # HBM [n_lines, 128]
    tail_refs = refs[planes:2 * planes]         # HBM [2*win, 128]
    out_refs = refs[2 * planes:3 * planes]
    s_meta, s_tile, s_pend, s_state, sems, tsems, osems = refs[3 * planes:]
    b = pl.program_id(0)
    nbuf = s_meta.shape[0]
    tr4 = tr // 4
    w4 = w // 4
    lt0 = s_tile.shape[2] - w4                  # tr4 + 16
    win = lt0 + w4
    tail_base = max(0, n_lines - win)
    n_tiles = grid_n * group

    lane_ii = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    lane_oo = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    folds = [
        ((lane_ii % FEAT == lane_oo % FEAT)
         & (lane_oo // FEAT == j)).astype(jnp.float32)
        for j in range(SUB)
    ]
    lanegrp = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) // FEAT
    w_pow2 = w & (w - 1) == 0
    hw_edge = (h - 1) * w

    def meta_cp(sc_row, slot):
        return pltpu.make_async_copy(meta_ref.at[sc_row], s_meta.at[slot],
                                     sems.at[slot])

    def tile_main_cp(t, slot, p):
        return pltpu.make_async_copy(
            table_refs[p].at[pl.ds(t * tr4, win)],
            s_tile.at[slot, p], tsems.at[slot, p],
        )

    # the tail is small enough that Mosaic may place it in VMEM, where a
    # dynamic slice offset must be PROVABLY 8-aligned — compute it in
    # units of 8 lines (q * 8 is provable) when the tiling allows, which
    # every production tiling does (w % 32 == 0 -> w4, win, tail_base all
    # multiples of 8; gated in grid_sample).  Unaligned tilings only run
    # in interpret mode (tests).
    tail_aligned = tr4 % 8 == 0 and win % 8 == 0 and tail_base % 8 == 0

    def tile_tail_cp(t, slot, p):
        if tail_aligned:
            q = jnp.clip(t * (tr4 // 8) - tail_base // 8, 0, win // 8)
            off = q * 8
        else:
            off = jnp.clip(t * tr4 - tail_base, 0, win)
        return pltpu.make_async_copy(
            tail_refs[p].at[pl.ds(off, win)],
            s_tile.at[slot, p], tsems.at[slot, p],
        )

    def flush_cp(slot, p, row):
        return pltpu.make_async_copy(s_pend.at[slot, p], out_refs[p].at[row],
                                     osems.at[slot, p])

    def tile_cp_do(t, slot, method):
        """Issue (or wait) the tile-window DMA for all planes: from the
        table when [t*tr4, t*tr4+win) fits, else from the tail buffer.
        Waits branch identically — both descriptors move the same bytes
        on the same semaphore, and exactly one matches the start."""
        if n_lines >= win:
            fits = jnp.asarray(t * tr4 + win <= n_lines)

            @pl.when(fits)
            def _():
                for p in range(planes):
                    getattr(tile_main_cp(t, slot, p), method)()

            @pl.when(jnp.logical_not(fits))
            def _():
                for p in range(planes):
                    getattr(tile_tail_cp(t, slot, p), method)()
        else:                                   # tiny table: all tiles tail
            for p in range(planes):
                getattr(tile_tail_cp(t, slot, p), method)()

    @pl.when(b == 0)
    def _():
        s_state[0] = 0
        s_state[1] = 0
        s_state[2] = 0
        s_state[3] = 0
        tile_cp_do(0, 0, "start")

    for g in range(group):
        t = b * group + g
        t_slot = jax.lax.rem(t, 2)

        @pl.when(t + 1 < n_tiles)
        def _():
            tile_cp_do(t + 1, jax.lax.rem(t + 1, 2), "start")

        tile_cp_do(t, t_slot, "wait")

        start = ts_ref[t]
        end = ts_ref[t + 1]
        r0 = start // SC
        n = jnp.maximum((end + SC - 1) // SC - r0, 0)
        base = t * tr

        for q in range(nbuf - 1):
            @pl.when(q < n)
            def _():
                meta_cp(r0 + q, q).start()

        def body(k, _):
            slot = jax.lax.rem(k, nbuf)

            @pl.when(k + nbuf - 1 < n)
            def _():
                meta_cp(r0 + k + nbuf - 1,
                        jax.lax.rem(k + nbuf - 1, nbuf)).start()

            meta_cp(r0 + k, slot).wait()
            blk = s_meta[slot]
            # y-border folded into the shared-ty weights (built once per
            # super-chunk): wy1 = ty*dy vanishes on the last table row so
            # the (y1, *) corners contribute nothing and never need reads
            # past the table
            wy0s, wy1s = [], []
            for j in range(SUB):
                ty = blk[8 * planes + j][:, None]
                wy1s.append(ty)                 # per-plane dy applied below
                wy0s.append(1.0 - ty)
            blocks = []
            for p in range(planes):
                tlo = s_tile[t_slot, p, 0:lt0]
                thi = s_tile[t_slot, p, w4:w4 + lt0]
                if tlo.dtype != jnp.bfloat16:
                    # f32 tables (training path): convert on-tile in VMEM —
                    # a VPU pass over win*128 elems per super-chunk, vs the
                    # old whole-table HBM staging copy (~4.5 ms/step)
                    tlo = tlo.astype(jnp.bfloat16)
                    thi = thi.astype(jnp.bfloat16)
                block = None
                for j in range(SUB):
                    idx = blk[SUB * p + j].astype(jnp.int32)[:, None]
                    d = idx - base
                    col = (idx & (w - 1)) if w_pow2 else jax.lax.rem(idx, w)
                    dxi = (col < w - 1).astype(jnp.int32)
                    dyf = (idx < hw_edge).astype(jnp.float32)
                    e01 = d + dxi
                    dw = d + w
                    ii = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, lt0), 1)
                    oh00 = ((d >> 2) == ii).astype(jnp.bfloat16)
                    oh01 = ((e01 >> 2) == ii).astype(jnp.bfloat16)
                    oh10 = (((dw >> 2) - w4) == ii).astype(jnp.bfloat16)
                    oh11 = ((((dw + dxi) >> 2) - w4) == ii).astype(jnp.bfloat16)
                    r00 = jnp.dot(oh00, tlo, preferred_element_type=jnp.float32)
                    r01 = jnp.dot(oh01, tlo, preferred_element_type=jnp.float32)
                    r10 = jnp.dot(oh10, thi, preferred_element_type=jnp.float32)
                    r11 = jnp.dot(oh11, thi, preferred_element_type=jnp.float32)
                    tx = blk[SUB * (planes + p) + j][:, None]
                    wy1 = wy1s[j] * dyf
                    wy0 = 1.0 - wy1
                    # lane-group masks select the corner's FEAT lanes within
                    # its line; (d+w) % 4 == d % 4 (w % 4 == 0), so the x0
                    # corners share one mask and the x1 corners the other.
                    # UNLIKE the packed kernel, out-of-stripe slots are NOT
                    # exactly zero here: a straddling super-chunk's next-tile
                    # points (d >= tr) land in the halo lines and would be
                    # double-counted by the pending merge — the in-stripe
                    # test rides the lane-group masks for free
                    ins = (d >= 0) & (d < tr)
                    m0 = ((lanegrp == (d & 3)) & ins).astype(jnp.float32)
                    m1 = ((lanegrp == (e01 & 3)) & ins).astype(jnp.float32)
                    v = ((r00 * ((1.0 - tx) * wy0) + r10 * ((1.0 - tx) * wy1))
                         * m0
                         + (r01 * (tx * wy0) + r11 * (tx * wy1)) * m1)
                    vb = jnp.dot(v, folds[j], preferred_element_type=jnp.float32)
                    block = vb if block is None else block + vb
                blocks.append(block)                          # [CHUNK, LANES]

            rowk = r0 + k
            pend = s_state[0]

            @pl.when(pend == rowk + 1)
            def _():
                act = jax.lax.rem(s_state[1], 2)
                for p in range(planes):
                    s_pend[act, p] += blocks[p]

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


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "tr", "group", "interpret"))
def unpacked_bilerp_fwd_group(tables, rowids, txs, ty, *, h: int, w: int,
                              tr: int = 2048, group: int = 1,
                              interpret: bool = False):
    """Forward bilinear sample of P same-shaped UNPACKED planes sharing one
    stripe axis, at stripe-sorted QUAD row ids (row = y0*w + x0); lerp and
    border replication fused in-kernel (_fwd_kernel_unpacked).

    Args:
        tables: P [h*w, FEAT] tables — the grid itself, no quad-pack.
            f32 tables stream straight into the kernel (reshape to quad
            lines is a free bitcast; bf16 conversion happens on-tile in
            VMEM); pre-staged bf16 tables (render) halve the tile DMA.
        rowids: P [M] int32 quad row ids, nondecreasing in stripes of tr.
        txs: P [M] f32 x fractions; ty: shared [M] f32 y fraction.
    Returns:
        list of P [M, FEAT] f32 features (in the sorted order).
    """
    planes = len(tables)
    r = h * w
    assert tables[0].shape == (r, FEAT)
    assert w % 4 == 0 and tr % 4 == 0 and tr % w == 0
    r_pad, grid = _grid_shape(r, tr, group)
    tr4, w4 = tr // 4, w // 4
    lt0 = tr4 + 16
    win = lt0 + w4
    n_lines = r // 4
    tail_base = max(0, n_lines - win)
    # one fused convert pass per table (no pad, no concat — the tail
    # buffer below covers window overrun); [h*w, FEAT] row-major ==
    # [r/4, 128] quad lines is a free bitcast reshape.  An f32-direct
    # variant (kernel DMAs the raw f32 grid, converts on-tile) measured
    # 138.2 vs 134.5 ms/step — the doubled tile DMA plus per-superchunk
    # VPU converts cost more than the one staging pass they replace.
    dtype = jnp.bfloat16
    tables_l = [t.astype(dtype).reshape(n_lines, LANES) for t in tables]
    # per-plane tail: last win real lines + win zeros — tiles whose window
    # overruns the table fetch from here, so the table needs no end pad
    tails = []
    for t2 in tables_l:
        real = t2[tail_base:]
        tails.append(jnp.concatenate(
            [real, jnp.zeros((2 * win - real.shape[0], LANES), dtype)], 0
        ))
    m = rowids[0].shape[0]
    pad = (-m) % SC + SC
    meta = jnp.concatenate(
        [_rows(idx, float(r_pad + 1), pad) for idx in rowids]
        + [_rows(tx, 0.0, pad) for tx in txs]
        + [_rows(ty, 0.0, pad)],
        axis=1,
    )  # [S, 8P+4, CHUNK]
    ts = tile_starts(rowids[0], r_pad, tr)
    s_rows = meta.shape[0]

    outs = pl.pallas_call(
        functools.partial(_fwd_kernel_unpacked, tr=tr, group=group,
                          planes=planes, grid_n=grid, h=h, w=w,
                          n_lines=n_lines),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)]      # meta blocks
            + [pl.BlockSpec(memory_space=pl.ANY)
               for _ in range(2 * planes)],                   # tables, tails
            out_specs=tuple(
                pl.BlockSpec(memory_space=pl.ANY) for _ in range(planes)
            ),
            scratch_shapes=[
                pltpu.VMEM((NBUF, 8 * planes + SUB, CHUNK), jnp.float32),
                pltpu.VMEM((2, planes, win, LANES), dtype),
                pltpu.VMEM((2, planes, CHUNK, LANES), jnp.float32),
                pltpu.SMEM((4,), jnp.int32),
                pltpu.SemaphoreType.DMA((NBUF,)),
                pltpu.SemaphoreType.DMA((2, planes)),
                pltpu.SemaphoreType.DMA((2, planes)),
            ],
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((s_rows, CHUNK, LANES), jnp.float32)
            for _ in range(planes)
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(ts, meta, *tables_l, *tails)
    if planes == 1:
        outs = (outs,) if not isinstance(outs, (tuple, list)) else outs
    return [unpack_features(o, m) for o in outs]


def _bwd_kernel(ts_ref, meta_ref, g_ref, *refs, tr: int, group: int,
                planes: int,
                feat: int = FEAT):
    """Multi-plane scatter: all ``planes`` share the stripe axis (their
    tile ranges are identical), so one pass over the sorted points feeds
    ``planes`` gradient tables and the per-iteration loop overhead is
    amortized across them.

    For narrow features (4*feat < 128, e.g. the proposal fields' feat=8)
    the table is ROW-PACKED: G = 128 // (4*feat) consecutive quad rows
    share one 128-lane line, the kernel's row index is rowid >> log2(G)
    and a per-point lane-group select places the gradient.

    mg block layout (rows of a [*, CHUNK] block):
      [0 : 4*P)            quad row ids per plane       (SUB rows each)
      [4*P : 8*P)          tx per plane
      [8*P : 8*P + 4)      shared ty (the stripe coordinate's fraction)
      [8*P + 4 : ... )     P gradient blocks of CHUNK rows each
    """
    grad_refs = refs[:planes]          # one grad-table output per plane
    s_meta, s_g, sems, gsems = refs[planes:]
    b = pl.program_id(0)
    nbuf = s_meta.shape[0]
    g_pack = LANES // (4 * feat)       # quad rows per 128-lane line
    shift = g_pack.bit_length() - 1
    assert 1 << shift == g_pack

    # T_j spreads sub-chunk j's feat lanes across all LANES (out % feat):
    # no lane concats — Mosaic relayouts dominate the iteration otherwise
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    lane_o = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    tilers = [
        (lane_i - j * feat == lane_o % feat).astype(jnp.bfloat16)
        for j in range(SUB)
    ]
    # corner-weight lane masks: [p00 p01 p10 p11] per 4*feat block
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    x_hi = (lane1 % (4 * feat)) // feat % 2 == 1              # p01, p11
    y_hi = (lane1 % (4 * feat)) // (2 * feat) == 1            # p10, p11
    lane_grp = lane1 // (4 * feat)                            # packed slot

    def meta_cp(sc_row, slot):
        return pltpu.make_async_copy(meta_ref.at[sc_row], s_meta.at[slot],
                                     sems.at[slot])

    def g_cp(sc_row, slot):
        return pltpu.make_async_copy(g_ref.at[sc_row], s_g.at[slot],
                                     gsems.at[slot])

    for g in range(group):
        t = b * group + g
        start = ts_ref[t]
        end = ts_ref[t + 1]
        r0 = start // SC
        n = jnp.maximum((end + SC - 1) // SC - r0, 0)
        base = t * tr

        for p in range(planes):
            grad_refs[p][g * tr:(g + 1) * tr] = jnp.zeros((tr, LANES), jnp.float32)

        for w in range(nbuf - 1):
            @pl.when(w < n)
            def _():
                meta_cp(r0 + w, w).start()
                g_cp(r0 + w, w).start()

        def body(k, _):
            slot = jax.lax.rem(k, nbuf)

            @pl.when(k + nbuf - 1 < n)
            def _():
                nslot = jax.lax.rem(k + nbuf - 1, nbuf)
                meta_cp(r0 + k + nbuf - 1, nslot).start()
                g_cp(r0 + k + nbuf - 1, nslot).start()

            meta_cp(r0 + k, slot).wait()
            g_cp(r0 + k, slot).wait()
            blk = s_meta[slot]
            # shared-ty corner weights: plane-independent, built once
            wys = []
            for j in range(SUB):
                ty = blk[8 * planes + j][:, None]
                wys.append(jnp.where(y_hi, ty, 1.0 - ty))
            for p in range(planes):
                g_blk = s_g[slot, p * CHUNK:(p + 1) * CHUNK]  # [CHUNK, LANES]
                rows, gws = [], []
                for j in range(SUB):
                    idxr = blk[SUB * p + j].astype(jnp.int32)  # [CHUNK] lanes
                    rows.append(idxr >> shift)
                    tx = blk[SUB * (planes + p) + j][:, None]
                    g_tile = jnp.dot(g_blk, tilers[j],
                                     preferred_element_type=jnp.float32)
                    wx = jnp.where(x_hi, tx, 1.0 - tx)        # [CHUNK, LANES]
                    gw_j = wx * wys[j] * g_tile
                    if g_pack > 1:
                        # place into the point's packed lane slot
                        gw_j = jnp.where(
                            lane_grp == (idxr[:, None] & (g_pack - 1)),
                            gw_j, 0.0)
                    gws.append(gw_j.astype(jnp.bfloat16))
                # per-sub-chunk transposed matmuls, ONE VMEM
                # read-modify-write of the grad block per plane
                grad_refs[p][g * tr:(g + 1) * tr] += _scatter_T(
                    rows, gws, base, tr)
            return 0

        jax.lax.fori_loop(0, n, body, 0)


def _bwd_kernel_fold(ts_ref, meta_ref, g_ref, *refs, tr: int, group: int,
                     planes: int, h: int, w: int, spill_pad: int):
    """Like _bwd_kernel (feat == FEAT, no row-packing) but the packed
    quadrant gradients are FOLDED into unpacked [*, FEAT] plane-grad rows
    before leaving VMEM, so the kernel emits 4x fewer gradient bytes and
    the XLA-side quad_pack transpose disappears.

    quad_pack stores row r=(y,x) as [P(y,x), P(y,xp), P(yp,x), P(yp,xp)]
    with xp=min(x+1,W-1), yp=min(y+1,H-1) (border replication).  The
    transpose, per destination row (a,b) with c0=(b==0), cw=(b==W-1),
    rh=(a==H-1), in flat row space (row = a*W + b):

      dP[row] = q0[row]
              + q1[row-1]*!c0 + q1[row]*cw
              + q2[row-W]     + q2[row]*rh
              + q3[row-W-1]*!c0 + q3[row-W]*cw + q3[row-1]*(rh&!c0)
              + q3[row]*(rh&cw)

    Rows are accumulated per grid step in a VMEM scratch; shifts that
    reach back past the block start are contributions OF THE PREVIOUS
    blocks, carried forward in a persistent [spill_pad, FEAT] scratch
    (grid steps run sequentially): block b adds the carry onto its first
    rows, then overwrites it with its own halo for block b+1.
    """
    out_main = refs[:planes]               # (tr*group, FEAT) blocks
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

        def body(k, _):
            slot = jax.lax.rem(k, nbuf)

            @pl.when(k + nbuf - 1 < n)
            def _():
                nslot = jax.lax.rem(k + nbuf - 1, nbuf)
                meta_cp(r0 + k + nbuf - 1, nslot).start()
                g_cp(r0 + k + nbuf - 1, nslot).start()

            meta_cp(r0 + k, slot).wait()
            g_cp(r0 + k, slot).wait()
            blk = s_meta[slot]
            # shared-ty corner weights: plane-independent, built once
            wys = []
            for j in range(SUB):
                ty = blk[8 * planes + j][:, None]
                wys.append(jnp.where(y_hi, ty, 1.0 - ty))
            for p in range(planes):
                g_blk = s_g[slot, p * CHUNK:(p + 1) * CHUNK]  # [CHUNK, LANES]
                rows, gws = [], []
                for j in range(SUB):
                    rows.append(blk[SUB * p + j].astype(jnp.int32))
                    tx = blk[SUB * (planes + p) + j][:, None]
                    g_tile = jnp.dot(g_blk, tilers[j],
                                     preferred_element_type=jnp.float32)
                    wx = jnp.where(x_hi, tx, 1.0 - tx)
                    gws.append((wx * wys[j] * g_tile).astype(jnp.bfloat16))
                s_acc[p, g * tr:(g + 1) * tr] += _scatter_T(
                    rows, gws, base, tr)
            return 0

        jax.lax.fori_loop(0, n, body, 0)

    # fold quadrants -> unpacked plane-grad rows (+ spill halo).  The fold
    # runs in 128-LANE space — four shifted copies of the packed
    # accumulator, each lane/row masked per the transpose expression, then
    # ONE (l % FEAT) fold matmul — and is CHUNKED in dest-row windows:
    # quadrant-extracted [*, 32] temps lane-pad to 128 in VMEM and a
    # whole-block fold blows the 16 MB scoped-VMEM limit at tg=2048.
    halo = w + 1
    fc_main = min(512, tg)
    lane_q = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) // feat
    efold = (
        jax.lax.broadcasted_iota(jnp.int32, (LANES, FEAT), 0) % feat
        == jax.lax.broadcasted_iota(jnp.int32, (LANES, FEAT), 1)
    ).astype(jnp.float32)
    w_pow2 = w & (w - 1) == 0

    def lmask(q):
        return (lane_q == q).astype(jnp.float32)          # [1, LANES]

    def win_masks(s0, fc):
        """Per-shift [fc, LANES] masks (rows select by dest column/row,
        lanes by quadrant) — plane-independent, built ONCE per window
        (the mask build dominated the fold stage when it ran per plane:
        diag_fold ablation, PERF.md)."""
        gi = jax.lax.broadcasted_iota(jnp.int32, (fc, 1), 0) + b * tg + s0
        col = (gi & (w - 1)) if w_pow2 else jax.lax.rem(gi, w)
        nc0 = jnp.where(col == 0, 0.0, 1.0)               # [fc, 1]
        cwm = jnp.where(col == w - 1, 1.0, 0.0)
        rh = jnp.where(gi >= (h - 1) * w, 1.0, 0.0)
        m0 = lmask(0) + cwm * lmask(1) + rh * lmask(2) + (rh * cwm) * lmask(3)
        m1 = nc0 * (lmask(1) + rh * lmask(3))
        mw = lmask(2) + cwm * lmask(3)
        mw1 = nc0 * lmask(3)
        return m0, m1, mw, mw1

    def fold_window(p, s0, fc, masks):
        """dP rows [s0, s0+fc) of this block from plane p's accumulator
        (windowed ref slices: never loads the whole [tg, LANES] block)."""
        m0, m1, mw, mw1 = masks
        # source rows [s0-halo, s0+fc), zero-padded outside [0, tg)
        parts = []
        lo = s0 - halo
        if lo < 0:
            parts.append(jnp.zeros((-lo, LANES), jnp.float32))
            lo = 0
        hi = min(s0 + fc, tg)
        if hi > lo:
            parts.append(s_acc[p, lo:hi])
        if s0 + fc > tg:
            parts.append(jnp.zeros((s0 + fc - tg, LANES), jnp.float32))
        src = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

        def sh(sft):  # dest-local: out[i] = src_at_row(s0 + i - sft)
            return src[halo - sft:halo - sft + fc]

        outv = sh(0) * m0 + sh(1) * m1 + sh(w) * mw + sh(w + 1) * mw1
        return jnp.dot(outv, efold, preferred_element_type=jnp.float32)

    for s0 in range(0, tg, fc_main):
        fc = min(fc_main, tg - s0)
        masks = win_masks(s0, fc)
        for p in range(planes):
            outv = fold_window(p, s0, fc, masks)
            if s0 < spill_pad:
                # earlier blocks' halo contributions to these rows
                ce = min(spill_pad, s0 + fc)
                cpart = s_carry[p, s0:ce]
                if ce - s0 < fc:
                    cpart = jnp.concatenate(
                        [cpart, jnp.zeros((fc - (ce - s0), feat),
                                          jnp.float32)], axis=0)
                outv = outv + cpart
            out_main[p][s0:s0 + fc] = outv
    # this block's halo (dest rows [tg, tg+spill_pad)); any carry rows
    # past tg haven't landed yet and roll forward another block
    masks_sp = win_masks(tg, spill_pad)
    for p in range(planes):
        sb = fold_window(p, tg, spill_pad, masks_sp)
        if spill_pad > tg:
            sb = sb + jnp.concatenate(
                [s_carry[p, tg:],
                 jnp.zeros((tg, feat), jnp.float32)], axis=0
            )
        s_carry[p] = sb


def _pad_rows(x, mult):
    pad = (-x.shape[0]) % mult
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)
    return x


def _prep_meta(idx_sorted, tx, ty, r_pad, mult=SC):
    """[S, 3*SUB, CHUNK] f32 meta blocks (ids exact as floats) + padding."""
    m = idx_sorted.shape[0]
    pad = (-m) % mult + mult

    def rows(v, fill):
        v = jnp.concatenate([v.astype(jnp.float32),
                             jnp.full((pad,), fill, jnp.float32)], 0)
        return v.reshape(-1, SUB, CHUNK)

    return jnp.concatenate(
        [rows(idx_sorted, float(r_pad + 1)), rows(tx, 0.0), rows(ty, 0.0)],
        axis=1,
    )  # [S, 3*SUB, CHUNK]


def _grid_shape(r: int, tr: int, group: int):
    r_pad = r + ((-r) % (tr * group))
    return r_pad, r_pad // (tr * group)


def tile_starts(idx_sorted, r_pad: int, tr: int):
    """Per-stripe first-point offsets: searchsorted over sorted row ids."""
    edges = jnp.arange(0, r_pad + tr, tr, dtype=jnp.int32)
    return jnp.searchsorted(idx_sorted, edges, side="left").astype(jnp.int32)


def unpack_features(out3, m: int, interleave: bool = False):
    """[S, CHUNK, LANES] kernel blocks -> [m, FEAT] point-major features.

    interleave=True uses the point mapping p = s*SC + c*SUB + j (sub-chunk
    round-robin within the super-chunk) so this is a PURE RESHAPE; the
    default block mapping p = s*SC + j*CHUNK + c needs a (j, c) transpose
    of the full feature stream.  MEASURED NET LOSS in-step (PERF.md
    negative results: the interleaved meta `_rows` transpose has a 4-lane
    minor dim and relayouts worse than the feature transposes it saves),
    so all call sites use the default False; the knob stays for A/Bs."""
    s = out3.shape[0]
    if interleave:
        return out3.reshape(s, CHUNK, SUB, FEAT).reshape(s * SC, FEAT)[:m]
    return (
        out3.reshape(s, CHUNK, SUB, FEAT)
        .transpose(0, 2, 1, 3)
        .reshape(s * SC, FEAT)[:m]
    )


def pack_features(g, s_rows: int, interleave: bool = False):
    """[m, feat] point-major -> [S, CHUNK, SUB*feat] kernel blocks.

    See unpack_features: interleave=True makes this a pure reshape (point
    p = s*SC + c*SUB + j lands at block row c, lane group j) — measured
    net loss in-step; default False is what call sites use."""
    m, feat = g.shape
    g = jnp.concatenate([g, jnp.zeros((s_rows * SC - m, feat), g.dtype)], 0)
    if interleave:
        return g.reshape(s_rows, CHUNK, SUB * feat)
    return (
        g.reshape(s_rows, SUB, CHUNK, feat)
        .transpose(0, 2, 1, 3)
        .reshape(s_rows, CHUNK, SUB * feat)
    )


def pick_tiling(r: int, w: int):
    """(tr, group): stripes of whole table rows, tr % w == 0, tr*group HBM
    blocks of ~1-4 MB, and at most ~2048 one-hot lanes per stripe."""
    k = max(1, 1024 // w)
    tr = k * w
    if tr > 4096:                      # very wide planes: cap the one-hot
        tr = w                         # (w <= 4096 in all supported configs)
    n_tiles = -(-r // tr)
    group = max(1, min(8, n_tiles))
    return tr, group


@functools.partial(jax.jit, static_argnames=("tr", "group", "interpret"))
def packed_bilerp_fwd_group(tables, rowids, txs, ty, *, tr: int = 1024,
                            group: int = 8, interpret: bool = False):
    """Forward bilinear sample of P same-shaped packed planes sharing one
    stripe axis, at stripe-sorted row ids; lerp fused in-kernel.

    Args:
        tables: P [R, 4F] (4F == 128) tables, any float dtype (cast bf16).
        rowids: P [M] int32 packed row ids, nondecreasing in stripes.
        txs: P [M] f32 x fractions; ty: shared [M] f32 y fraction.
    Returns:
        list of P [M, F] f32 features (in the sorted order).
    """
    planes = len(tables)
    r, lanes = tables[0].shape
    assert lanes == LANES, f"packed width must be {LANES}, got {lanes}"
    r_pad, grid = _grid_shape(r, tr, group)
    tables_p = [
        _pad_rows(t.astype(jnp.bfloat16), tr * group) for t in tables
    ]
    m = rowids[0].shape[0]
    pad = (-m) % SC + SC
    meta = jnp.concatenate(
        [_rows(idx, float(r_pad + 1), pad, interleave=False) for idx in rowids]
        + [_rows(tx, 0.0, pad, interleave=False) for tx in txs]
        + [_rows(ty, 0.0, pad, interleave=False)],
        axis=1,
    )  # [S, 8P+4, CHUNK]
    ts = tile_starts(rowids[0], r_pad, tr)
    s_rows = meta.shape[0]

    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, tr=tr, group=group, planes=planes,
                          grid_n=grid),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)]      # meta blocks
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
        interpret=interpret,
    )(ts, meta, *tables_p)
    if planes == 1:
        outs = (outs,) if not isinstance(outs, (tuple, list)) else outs
    return [unpack_features(o, m, interleave=False) for o in outs]


def packed_bilerp_fwd(table_packed, idx_sorted, tx, ty, *, tr: int = 1024,
                      group: int = 8, interpret: bool = False):
    """Single-plane convenience wrapper over packed_bilerp_fwd_group."""
    return packed_bilerp_fwd_group(
        [table_packed], [idx_sorted], [tx], ty, tr=tr, group=group,
        interpret=interpret,
    )[0]


BWD_NBUF = 4  # deeper prefetch: the per-chunk compute is often < DMA latency


def _rows(v, fill, pad, interleave: bool = False):
    """Per-point scalar -> [S, SUB, CHUNK] meta rows (sub-chunk j, col c).

    interleave=True assigns point p = s*SC + c*SUB + j (matching
    pack_features/unpack_features interleave): the (c, j) transpose runs
    HERE instead of on the feature streams — but its 4-lane-minor
    relayout measured SLOWER in-step (PERF.md), so call sites pass
    False."""
    v = jnp.concatenate(
        [v.astype(jnp.float32), jnp.full((pad,), fill, jnp.float32)], 0
    )
    if interleave:
        return v.reshape(-1, CHUNK, SUB).swapaxes(1, 2)
    return v.reshape(-1, SUB, CHUNK)


@functools.partial(jax.jit,
                   static_argnames=("r", "tr", "group", "interpret"))
def packed_bilerp_bwd_group(gs, rowids, txs, ty, *, r: int, tr: int = 1024,
                            group: int = 8, interpret: bool = False):
    """Gradients w.r.t. P packed tables sharing one stripe axis.

    All planes in a sort group (e.g. XZ and YZ, or XT/YT/ZT) have
    IDENTICAL table shapes and identical stripe ranges (stripe membership
    depends only on the shared sorted coordinate), so one kernel pass over
    the sorted points feeds all P gradient tables, amortizing the
    per-iteration loop overhead across the group.

    Narrow features (4F < 128, the proposal fields) are row-packed:
    G = 128 // 4F quad rows per 128-lane line; ``tr``/stripes are in
    PACKED rows and row ids stay in quad-row units.

    Args:
        gs: P upstream gradients [M, F], in the shared sorted order.
        rowids: P QUAD row-id arrays [M] (nondecreasing within stripes).
        txs: P x-fraction arrays [M].
        ty: shared stripe-coordinate fraction [M].
        r: quad-row count of each table.
    Returns:
        list of P fp32 [R, 4F] table gradients.
    """
    planes = len(gs)
    feat = gs[0].shape[-1]
    g_pack = LANES // (4 * feat)
    assert r % g_pack == 0
    r4 = r // g_pack
    r_pad, grid = _grid_shape(r4, tr, group)
    m = rowids[0].shape[0]
    pad = (-m) % SC + SC
    parts = (
        [_rows(idx, float((r_pad + 1) * g_pack), pad, interleave=False)
         for idx in rowids]
        + [_rows(tx, 0.0, pad, interleave=False) for tx in txs]
        + [_rows(ty, 0.0, pad, interleave=False)]
    )
    s_rows = parts[0].shape[0]
    meta = jnp.concatenate(parts, axis=1)           # [S, 8P+4, CHUNK] f32
    g_blocks = [
        pack_features(g.astype(jnp.bfloat16), s_rows, interleave=False)
        for g in gs
    ]
    if 4 * feat < LANES:  # pad the used lanes up to a full line
        g_blocks = [
            jnp.concatenate(
                [gb, jnp.zeros(gb.shape[:2] + (LANES - 4 * feat,), gb.dtype)],
                axis=-1,
            )
            for gb in g_blocks
        ]
    # gradients ride a SEPARATE bf16 input with their own DMA (see
    # bilerp_bwd_group_fold): no f32 convert/concat pass, half the bytes
    gcat = jnp.concatenate(g_blocks, axis=1)        # [S, P*CHUNK, CHUNK]
    ts = tile_starts(rowids[0] // g_pack, r_pad, tr)

    grads = pl.pallas_call(
        functools.partial(_bwd_kernel, tr=tr, group=group, planes=planes,
                          feat=feat),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),            # meta blocks
                pl.BlockSpec(memory_space=pl.ANY),            # g blocks
            ],
            # one grad table per plane: separate outputs avoid a [P, R, 4F]
            # split copy (~1 GB at the finest scale) after the kernel
            out_specs=tuple(
                pl.BlockSpec((tr * group, LANES), lambda b, ts: (b, 0))
                for _ in range(planes)
            ),
            scratch_shapes=[
                pltpu.VMEM((BWD_NBUF, 8 * planes + SUB, CHUNK), jnp.float32),
                pltpu.VMEM((BWD_NBUF, planes * CHUNK, CHUNK), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((BWD_NBUF,)),
                pltpu.SemaphoreType.DMA((BWD_NBUF,)),
            ],
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((r_pad, LANES), jnp.float32)
            for _ in range(planes)
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(ts, meta, gcat)
    if planes == 1:
        grads = (grads,) if not isinstance(grads, (tuple, list)) else grads
    return [g[:r4].reshape(r, 4 * feat) for g in grads]


def packed_bilerp_bwd(g_sorted, idx_sorted, tx, ty, *, r: int, tr: int = 1024,
                      group: int = 8, spi: int = 1, interpret: bool = False):
    """Single-plane convenience wrapper over packed_bilerp_bwd_group."""
    del spi
    return packed_bilerp_bwd_group(
        [g_sorted], [idx_sorted], [tx], ty, r=r, tr=tr, group=group,
        interpret=interpret,
    )[0]


def _scatter_kernel(ts_ref, meta_ref, g_ref, *refs, tr: int, group: int,
                    c: int):
    """Plain sorted scatter-add (no bilerp weights): one update of ``c``
    channels per point into a row-packed [lines, 128] accumulator
    (g_pack = 128 // c table rows per line; g_pack == 1 means each update
    row IS a full 128-lane line and needs no spread/placement).  Same
    stripe/one-hot-matmul structure as _bwd_kernel."""
    out_ref = refs[0]
    s_meta, s_g, sems, gsems = refs[1:]
    b = pl.program_id(0)
    nbuf = s_meta.shape[0]
    g_pack = LANES // c
    shift = g_pack.bit_length() - 1
    assert 1 << shift == g_pack

    if g_pack > 1:
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
        lane_o = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
        tilers = [
            (lane_i - j * c == lane_o % c).astype(jnp.bfloat16)
            for j in range(SUB)
        ]
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        lane_grp = lane1 // c

    def meta_cp(sc_row, slot):
        return pltpu.make_async_copy(meta_ref.at[sc_row], s_meta.at[slot],
                                     sems.at[slot])

    def g_cp(sc_row, slot):
        return pltpu.make_async_copy(g_ref.at[sc_row], s_g.at[slot],
                                     gsems.at[slot])

    for g in range(group):
        t = b * group + g
        start = ts_ref[t]
        end = ts_ref[t + 1]
        r0 = start // SC
        n = jnp.maximum((end + SC - 1) // SC - r0, 0)
        base = t * tr

        out_ref[g * tr:(g + 1) * tr] = jnp.zeros((tr, LANES), jnp.float32)

        for q in range(nbuf - 1):
            @pl.when(q < n)
            def _():
                meta_cp(r0 + q, q).start()
                g_cp(r0 + q, q).start()

        def body(k, _):
            slot = jax.lax.rem(k, nbuf)

            @pl.when(k + nbuf - 1 < n)
            def _():
                nslot = jax.lax.rem(k + nbuf - 1, nbuf)
                meta_cp(r0 + k + nbuf - 1, nslot).start()
                g_cp(r0 + k + nbuf - 1, nslot).start()

            meta_cp(r0 + k, slot).wait()
            g_cp(r0 + k, slot).wait()
            blk = s_meta[slot]
            g_blk = s_g[slot]
            rows, gws = [], []
            for j in range(SUB):
                idxr = blk[j].astype(jnp.int32)               # [CHUNK] lanes
                rows.append(idxr >> shift)
                if g_pack == 1:
                    # full-line updates: g rows are already in place
                    gws.append(g_blk[j * CHUNK:(j + 1) * CHUNK])
                else:
                    g_tile = jnp.dot(g_blk, tilers[j],
                                     preferred_element_type=jnp.float32)
                    gws.append(jnp.where(
                        lane_grp == (idxr[:, None] & (g_pack - 1)),
                        g_tile, 0.0
                    ).astype(jnp.bfloat16))
            out_ref[g * tr:(g + 1) * tr] += _scatter_T(
                rows, gws, base, tr)
            return 0

        jax.lax.fori_loop(0, n, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("r", "c", "tr", "group", "interpret"))
def sorted_scatter_add(g_sorted, idx_sorted, *, r: int, c: int,
                       tr: int = 1024, group: int = 4,
                       interpret: bool = False):
    """Scatter-add ``g_sorted`` [M, c] into a [r, c] table at SORTED
    row indices (nondecreasing) — the hash-table gradient primitive.

    XLA's scatter-add serializes colliding updates (~80 ns/update into a
    narrow [R, 2] table); here each stripe of table rows accumulates its
    contiguous run of sorted updates with one-hot matmuls in VMEM.
    ``c`` must divide 128; g_pack = 128 // c table rows share a 128-lane
    accumulator line and the result is a pure reshape.

    Args:
        g_sorted: [M, c] updates, any float dtype (accumulated f32).
        idx_sorted: [M] int32 row indices in [0, r), nondecreasing.
    Returns:
        [r, c] f32 accumulated table.
    """
    assert c == LANES or SUB * c <= LANES, (
        f"c={c}: channel counts in (32, 128) are not supported — pad to 128"
    )
    assert r < (1 << 24), "row indices ride f32 meta; r must stay < 2^24"
    m = idx_sorted.shape[0]
    g_pack = LANES // c
    lines = -(-r // g_pack)
    r_pad, grid = _grid_shape(lines, tr, group)
    tg = tr * group
    pad = (-m) % SC + SC
    meta = _rows(idx_sorted, float((r_pad + 1) * g_pack), pad)
    s_rows = meta.shape[0]
    if g_pack == 1:
        # full-line updates: [m, 128] rows are the accumulator layout
        # already — a pure reshape, no point-in-lane transpose
        gb = _pad_rows(g_sorted.astype(jnp.bfloat16), s_rows * SC)
        gb = gb.reshape(s_rows, SC, LANES)
    else:
        gb = pack_features(g_sorted.astype(jnp.bfloat16), s_rows)
        if SUB * c < LANES:
            gb = jnp.concatenate(
                [gb, jnp.zeros(gb.shape[:2] + (LANES - SUB * c,), gb.dtype)],
                axis=-1,
            )
    lines_sorted = jax.lax.shift_right_logical(
        idx_sorted, g_pack.bit_length() - 1
    )
    ts = tile_starts(lines_sorted, r_pad, tr)

    out = pl.pallas_call(
        functools.partial(_scatter_kernel, tr=tr, group=group, c=c),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),            # meta blocks
                pl.BlockSpec(memory_space=pl.ANY),            # g blocks
            ],
            out_specs=pl.BlockSpec((tg, LANES), lambda b, ts: (b, 0)),
            scratch_shapes=[
                pltpu.VMEM((BWD_NBUF, SUB, CHUNK), jnp.float32),
                pltpu.VMEM(
                    (BWD_NBUF, SC if c == LANES else CHUNK, CHUNK),
                    jnp.bfloat16,
                ),
                pltpu.SemaphoreType.DMA((BWD_NBUF,)),
                pltpu.SemaphoreType.DMA((BWD_NBUF,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((r_pad, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(ts, meta, gb)
    return out[:lines].reshape(lines * g_pack, c)[:r]


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "tr", "group", "interpret"))
def bilerp_bwd_group_fold(gs, rowids, txs, ty, *, h: int, w: int,
                          tr: int = 1024, group: int = 8,
                          interpret: bool = False):
    """Gradients w.r.t. P UNPACKED [h*w, FEAT] plane tables (one sort
    group, feat == FEAT == 32).

    Same stripe scatter as packed_bilerp_bwd_group, but the quadrant fold
    (the transpose of ops/grid_sample.quad_pack) runs inside the kernel on
    the VMEM accumulator, so the packed [R, 4F] fp32 gradient (4x the
    table) is never materialized in HBM.  Cross-block fold halos ride a
    persistent carry scratch between (sequential) grid steps — nothing to
    fix up on the XLA side.

    Args:
        gs: P upstream gradients [M, FEAT], in the shared sorted order.
        rowids: P row-id arrays [M] (row = y0*w + x0, nondecreasing in
            stripes of ``tr``).
        txs: P x-fraction arrays [M]; ty: shared y fraction [M].
        h, w: plane height/width (r == h*w rows).
    Returns:
        list of P fp32 [h*w, FEAT] unpacked table gradients.
    """
    planes = len(gs)
    feat = gs[0].shape[-1]
    assert feat == FEAT, f"fold kernel needs feat=={FEAT}, got {feat}"
    r = h * w
    r_pad, grid = _grid_shape(r, tr, group)
    tg = tr * group
    spill_pad = w + 1 + (-(w + 1)) % 8
    m = rowids[0].shape[0]
    pad = (-m) % SC + SC
    parts = (
        [_rows(idx, float(r_pad + 1), pad, interleave=False)
         for idx in rowids]
        + [_rows(tx, 0.0, pad, interleave=False) for tx in txs]
        + [_rows(ty, 0.0, pad, interleave=False)]
    )
    s_rows = parts[0].shape[0]
    meta = jnp.concatenate(parts, axis=1)           # [S, 8P+4, CHUNK] f32
    # gradients ride a SEPARATE bf16 input (their own per-superchunk DMA):
    # folding them into the f32 meta buffer forced a convert + concat pass
    # over the whole gradient stream and doubled its DMA bytes
    gcat = jnp.concatenate(
        [pack_features(g.astype(jnp.bfloat16), s_rows, interleave=False)
         for g in gs],
        axis=1,
    )                                               # [S, P*CHUNK, CHUNK]
    ts = tile_starts(rowids[0], r_pad, tr)

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel_fold, tr=tr, group=group,
                          planes=planes, h=h, w=w, spill_pad=spill_pad),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),            # meta blocks
                pl.BlockSpec(memory_space=pl.ANY),            # g blocks
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
        interpret=interpret,
    )(ts, meta, gcat)
    if planes == 1:
        outs = (outs,) if not isinstance(outs, (tuple, list)) else outs
    return [o[:r] for o in outs]
