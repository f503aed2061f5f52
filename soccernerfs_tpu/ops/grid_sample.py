"""Bilinear plane sampling — the K-Planes interpolation primitive.

TPU-native replacement for the reference's ``F.grid_sample`` wrapper
(ref: utils/interpolation.py:5-33; cuDNN kernel N5 in SURVEY §2.1).

Semantics match grid_sample(align_corners=True, padding_mode="border",
mode="bilinear") for 2D planes.  Planes are stored [H, W, F] — features
last so corner fetches are contiguous along the TPU lane dimension — where
the reference stores [1, F, H, W].  Coordinates are (x, y) in [-1, 1] with
x indexing W and y indexing H, exactly like grid_sample's grid argument.

This pure-XLA gather version is the semantic reference that the fused
Pallas kernels are validated against (ops/pallas/plane_kernels.py).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def sample_plane_bilinear(plane: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinearly sample a feature plane at normalized coordinates.

    Args:
        plane: [H, W, F] feature plane.
        coords: [..., 2] (x, y) in [-1, 1]; align_corners=True mapping,
            out-of-range coords clamp to the border.
    Returns:
        [..., F] interpolated features.
    """
    H, W, F = plane.shape
    x = (coords[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (coords[..., 1] + 1.0) * 0.5 * (H - 1)
    # border padding: clamp the continuous coordinate first so weights are
    # consistent with clamped indices
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, W - 1)
    y1i = jnp.minimum(y0i + 1, H - 1)

    flat = plane.reshape(H * W, F)
    idx00 = y0i * W + x0i
    idx01 = y0i * W + x1i
    idx10 = y1i * W + x0i
    idx11 = y1i * W + x1i

    # indices are clamped in-bounds above: skip jnp.take's default
    # out-of-range fill (a select over every gathered row block)
    p00 = jnp.take(flat, idx00, axis=0, mode="clip")
    p01 = jnp.take(flat, idx01, axis=0, mode="clip")
    p10 = jnp.take(flat, idx10, axis=0, mode="clip")
    p11 = jnp.take(flat, idx11, axis=0, mode="clip")

    tx = tx[..., None]
    ty = ty[..., None]
    top = p00 * (1.0 - tx) + p01 * tx
    bot = p10 * (1.0 - tx) + p11 * tx
    return top * (1.0 - ty) + bot * ty


def quad_pack(plane: jnp.ndarray) -> jnp.ndarray:
    """[H, W, F] -> [H*W, 4F] with each row holding the 2x2 corner block
    (P[h,w], P[h,w+1], P[h+1,w], P[h+1,w+1]); edge rows replicate the
    border (border padding).

    TPU gathers pay per row, not per byte, so fetching all four bilinear
    corners in ONE full-lane row quarters the dominant cost of plane
    sampling (see SURVEY §7.7a).  The pack itself is pure slicing —
    cheap, fused, and differentiable without scatters.
    """
    H, W, F = plane.shape
    right = jnp.concatenate([plane[:, 1:], plane[:, -1:]], axis=1)
    down = jnp.concatenate([plane[1:], plane[-1:]], axis=0)
    down_right = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
    packed = jnp.concatenate([plane, right, down, down_right], axis=-1)
    return packed.reshape(H * W, 4 * F)


def sample_plane_bilinear_packed(
    plane: jnp.ndarray, coords: jnp.ndarray, gather_dtype=jnp.bfloat16
) -> jnp.ndarray:
    """Bilinear plane sample via one quad-packed gather per point.

    Same clamping and align_corners=True mapping as
    ``sample_plane_bilinear``; 4x fewer gather rows.  The packed table is
    gathered in ``gather_dtype`` (bf16 by default: ~9% step-time win and
    the reference's tcnn path stored fp16 features anyway); interpolation
    weights and outputs stay fp32.
    """
    H, W, F = plane.shape
    x = (coords[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (coords[..., 1] + 1.0) * 0.5 * (H - 1)
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0)[..., None]
    ty = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    packed = quad_pack(plane)
    if gather_dtype is not None:
        packed = packed.astype(gather_dtype)
    # rows stay in gather_dtype: bf16 x f32 weights promote to f32 in the
    # lerp without materializing an f32 [M, 4F] copy of the gather output
    rows = jnp.take(packed, y0i * W + x0i, axis=0,
                    mode="clip")  # [..., 4F]
    p00, p01, p10, p11 = (
        rows[..., :F],
        rows[..., F : 2 * F],
        rows[..., 2 * F : 3 * F],
        rows[..., 3 * F :],
    )
    top = p00 * (1.0 - tx) + p01 * tx
    bot = p10 * (1.0 - tx) + p11 * tx
    return top * (1.0 - ty) + bot * ty


# flip to True in tests to run the Pallas backward in interpreter mode on CPU
PALLAS_INTERPRET = False
# perf A/B: force the XLA scatter backward even when pallas is requested
FORCE_XLA_BWD = False


def grid_coords(coords_1d: jnp.ndarray, size: int):
    """[-1, 1] -> (cell int32, frac f32) with align_corners/border clamping."""
    v = jnp.clip((coords_1d + 1.0) * 0.5 * (size - 1), 0.0, size - 1)
    c = jnp.floor(v)
    return c.astype(jnp.int32), v - c


def permute_rows(x: jnp.ndarray, inv: jnp.ndarray, perm: jnp.ndarray) -> jnp.ndarray:
    """``x[inv]`` with a gather (not scatter) backward.

    XLA transposes a gather into a scatter-add; for a PERMUTATION the
    cotangent is just the opposite gather, which is ~2x faster on TPU.

    Args:
        x: [M, D]; inv: [M] inverse permutation; perm: [M] with
            ``perm[inv] == iota`` (i.e. the forward sort's permutation).
    """

    @jax.custom_vjp
    def op(x, inv, perm):
        return jnp.take(x, inv, axis=0, mode="clip")

    def op_fwd(x, inv, perm):
        return jnp.take(x, inv, axis=0, mode="clip"), (inv, perm)

    def op_bwd(res, g):
        inv_, perm_ = res
        zero = np.zeros(inv_.shape, dtype=jax.dtypes.float0)
        return jnp.take(g, perm_, axis=0, mode="clip"), zero, zero

    op.defvjp(op_fwd, op_bwd)
    return op(x, inv, perm)


def _bilerp_rows(p, rowid, tx, ty, feat):
    # keep the gathered rows bf16 (halves the dominant [M, 4F] stream);
    # bf16 x f32 promotes, so the lerp still accumulates in f32
    rows = jnp.take(p.astype(jnp.bfloat16), rowid, axis=0,
                    mode="clip")
    p00 = rows[:, :feat]
    p01 = rows[:, feat : 2 * feat]
    p10 = rows[:, 2 * feat : 3 * feat]
    p11 = rows[:, 3 * feat :]
    txc = tx[:, None]
    tyc = ty[:, None]
    top = p00 * (1.0 - txc) + p01 * txc
    bot = p10 * (1.0 - txc) + p11 * txc
    return top * (1.0 - tyc) + bot * tyc


def plane_sample_fold_group(
    grids,
    rowids,
    txs,
    ty: jnp.ndarray,
    *,
    use_pallas_bwd: bool,
    interpret: bool | None = None,
):
    """Bilinear sample of P same-shaped UNPACKED planes sharing one stripe
    axis, at stripe-sorted row ids — the custom-VJP boundary sits at the
    [H, W, F] grid itself.

    Forward quad-packs each grid straight to bf16 (one fused pass; the f32
    packed table is never materialized) and samples via one bf16 gather +
    lerp (XLA) or the fused Pallas gather for big tables.  Backward uses
    the FOLDED Pallas scatter (ops/pallas/plane_kernels.bilerp_bwd_group_fold)
    which emits unpacked [H*W, F] gradients directly — no packed fp32
    gradient (4x the table) and no XLA quad_pack transpose.

    Args:
        grids: P same-shaped [H, W, F] f32 planes.
        rowids: P int32 row-id arrays [M] (row = y0*w + x0),
            NONDECREASING in stripes (all planes sorted by the shared y).
        txs: P [M] f32 x fractions; ty: shared [M] f32 y fraction.
    Returns:
        list of P [M, F] f32 features, in the given (sorted) order.
    """
    h, w, feat = grids[0].shape
    r = h * w
    if interpret is None:
        interpret = PALLAS_INTERPRET

    if not use_pallas_bwd or FORCE_XLA_BWD:
        return [
            _bilerp_rows(quad_pack(g), rowid, tx, ty, feat)
            for g, rowid, tx in zip(grids, rowids, txs)
        ]

    from soccernerfs_tpu.ops.pallas import plane_kernels as pk

    m = rowids[0].shape[0]
    planes = len(grids)
    tr, group = _fold_group_tiling(r, w, m, planes)
    tr_f, group_f = _fold_group_tiling(r, w, m, planes, fwd=True)
    # the unpacked forward needs 4 quad rows per 128-lane line plus
    # 8-line-provable tail offsets (Mosaic VMEM dynamic-slice rule):
    # w % 32 gives w4 % 8, tr % 32 gives tr4 % 8 — every production plane
    # width (64 * scale) qualifies
    fwd_kernel = r >= 65536 and w % 32 == 0 and tr_f % 32 == 0

    @jax.custom_vjp
    def op(grids, rowids, txs, ty):
        if fwd_kernel:
            # big tables: gather the UNPACKED grid directly — the 4 corner
            # one-hot matmuls cost the same MACs as the packed gather, the
            # table DMA halves, and the XLA quad-pack pass (27% of
            # streaming, ~8 ms/step at the reference workload) disappears
            return pk.unpacked_bilerp_fwd_group(
                [g.reshape(h * w, feat) for g in grids],
                rowids, txs, ty, h=h, w=w, tr=tr_f, group=group_f,
                interpret=interpret,
            )
        return [
            _bilerp_rows(quad_pack(g).astype(jnp.bfloat16), rowid, tx, ty,
                         feat)
            for g, rowid, tx in zip(grids, rowids, txs)
        ]

    def op_fwd(grids, rowids, txs, ty):
        return op(grids, rowids, txs, ty), (rowids, txs, ty)

    def op_bwd(res, gs):
        rowids_, txs_, ty_ = res
        grads = pk.bilerp_bwd_group_fold(
            gs, rowids_, txs_, ty_, h=h, w=w, tr=tr, group=group,
            interpret=interpret,
        )
        zero_i = [np.zeros(ri.shape, dtype=jax.dtypes.float0) for ri in rowids_]
        return (
            [g.reshape(h, w, feat).astype(grids[0].dtype) for g in grads],
            zero_i,
            [jnp.zeros_like(t) for t in txs_],
            jnp.zeros_like(ty_),
        )

    op.defvjp(op_fwd, op_bwd)
    return op(list(grids), list(rowids), list(txs), ty)


def _fold_group_tiling(r: int, w: int, m: int, planes: int,
                       fwd: bool = False):
    """(tr, group) policy shared by plane_sample_fold_group and the
    prepacked eval path — stripes sized so stripe count ~= superchunks.

    The FORWARD kernel prefers narrower stripes on wide planes (w=1024:
    tr=1024/g=2 beats tr=2048/g=1 by ~11%, microbench_r3 — the halved
    one-hot build outweighs the boundary-chunk refetches); the backward
    keeps the wider stripe (the same swap measured 5% SLOWER there: the
    gradient DMA is refetched along with the meta for boundary chunks).
    """
    from soccernerfs_tpu.ops.pallas import plane_kernels as pk

    span = max(1, (r * pk.SC) // max(m, 1))
    cap = 1024 if fwd else 2048
    tr = w * max(1, min(-(-span // w), max(1, cap // w), -(-r // w)))
    group = max(1, min(4096 // (tr * planes), -(-r // tr)))
    return tr, group


def plane_sample_packed_group(
    packeds,
    rowids,
    txs,
    ty: jnp.ndarray,
    *,
    w: int,
    interpret: bool | None = None,
):
    """No-grad forward sample of P same-shaped PREPACKED [R, 4F] bf16
    tables at stripe-sorted row ids — the eval/render fast path.

    Training packs the f32 grids to bf16 inside every step; a render packs
    ONCE per parameter snapshot (fields/kplanes.pack_* helpers) and each
    image chunk reuses the packed tables, removing the dominant per-chunk
    cost of whole-image eval (ref metric: TEST_RAYS_PER_SEC,
    nerfstudio pipelines/base_pipeline.py:343-352).

    Args:
        packeds: P [R, 4F] tables (bf16); rowids/txs/ty as
            plane_sample_fold_group (rows nondecreasing in stripes).
        w: plane width in quad rows (tiling policy needs it).
    Returns:
        list of P [M, F] f32 features in the given (sorted) order.
    """
    r, lanes = packeds[0].shape
    feat = lanes // 4
    if interpret is None:
        interpret = PALLAS_INTERPRET
    use_kernel = (
        lanes == 128
        and r >= 65536
        and (interpret or jax.default_backend() == "tpu")
    )
    if use_kernel:
        from soccernerfs_tpu.ops.pallas import plane_kernels as pk

        m = rowids[0].shape[0]
        tr, group = _fold_group_tiling(r, w, m, len(packeds), fwd=True)
        return pk.packed_bilerp_fwd_group(
            packeds, rowids, txs, ty, tr=tr, group=group, interpret=interpret
        )
    return [
        _bilerp_rows(p, rowid, tx, ty, feat)
        for p, rowid, tx in zip(packeds, rowids, txs)
    ]


def plane_sample_unpacked_group(
    tables,
    rowids,
    txs,
    ty: jnp.ndarray,
    *,
    h: int,
    w: int,
    interpret: bool | None = None,
):
    """No-grad forward sample of P big tables stored as bf16 UNPACKED
    [h*w, F] copies — the render fast path for kernel-eligible planes.

    pack_grids_for_render stores these instead of quad-packed copies (4x
    less snapshot memory, half the per-chunk table DMA); the unpacked
    forward kernel gathers them directly.  Callers guarantee kernel
    eligibility (r >= 65536, 4F == 128, w % 4 == 0, TPU/interpret).

    Args:
        tables: P [h*w, F] bf16 tables; rowids/txs/ty as
            plane_sample_fold_group (rows nondecreasing in stripes).
    Returns:
        list of P [M, F] f32 features in the given (sorted) order.
    """
    if interpret is None:
        interpret = PALLAS_INTERPRET
    from soccernerfs_tpu.ops.pallas import plane_kernels as pk

    m = rowids[0].shape[0]
    tr, group = _fold_group_tiling(h * w, w, m, len(tables), fwd=True)
    return pk.unpacked_bilerp_fwd_group(
        tables, rowids, txs, ty, h=h, w=w, tr=tr, group=group,
        interpret=interpret,
    )


def plane_sample_group_bwdsort(
    packeds,
    coords,
    ykey: jnp.ndarray,
    *,
    h: int,
    w: int,
    use_pallas_bwd: bool,
    interpret: bool | None = None,
):
    """Like plane_sample_fold_group but for NARROW packed planes whose
    points arrive UNSORTED — the sort happens inside the BACKWARD only.

    For the proposal fields the forward gather is already at the
    small-table floor, and sorting every step just to speed a backward
    that the host-static schedule prunes on ~6/7 steps would be a net
    loss; here the sort + gradient permute run only when the proposal
    backward actually executes.

    Args:
        coords: P [M] continuous x coordinates in [-1, 1] (one per
            plane); row ids / lerp fractions are derived via grid_coords
            INSIDE the op, so the backward sort carries only the P raw
            coordinates plus ykey and iota (P+2 operands) instead of
            (rowid, tx) per plane plus ty (2P+3) — sort time is linear
            in operand count (~1.3 ns/elem each, PERF.md).
        ykey: the shared stripe coordinate (continuous, [-1, 1]), both
            the sort key and the source of the y cell/fraction.
        packeds: P quad-packed planes [R, 4F] (4F <= 128), same shape.
    """
    r, lanes = packeds[0].shape
    feat = lanes // 4
    if interpret is None:
        interpret = PALLAS_INTERPRET

    def derive(cs, yk):
        yc, tyf = grid_coords(yk, h)
        rowids, txs = [], []
        for c in cs:
            xc, txf = grid_coords(c, w)
            rowids.append(yc * w + xc)
            txs.append(txf)
        return rowids, txs, tyf

    if not use_pallas_bwd or FORCE_XLA_BWD:
        rowids, txs, ty = derive(coords, ykey)
        return [
            _bilerp_rows(p, rowid, tx, ty, feat)
            for p, rowid, tx in zip(packeds, rowids, txs)
        ]

    from soccernerfs_tpu.ops.pallas import plane_kernels as pk

    planes = len(packeds)
    m = coords[0].shape[0]
    g_pack = 128 // lanes
    w4 = max(1, w // g_pack)
    r4 = r // g_pack
    span = max(1, (r4 * pk.SC) // max(m, 1))
    tr = w4 * max(1, min(-(-span // w4), max(1, 2048 // w4), -(-r4 // w4)))
    group = max(1, min(4096 // (tr * planes), -(-r4 // tr)))

    @jax.custom_vjp
    def op(packeds, coords, ykey):
        rowids, txs, ty = derive(coords, ykey)
        return [
            _bilerp_rows(p, rowid, tx, ty, feat)
            for p, rowid, tx in zip(packeds, rowids, txs)
        ]

    def op_fwd(packeds, coords, ykey):
        return op(packeds, coords, ykey), (coords, ykey)

    def op_bwd(res, gs):
        coords_, ykey_ = res
        iota = jnp.arange(m, dtype=jnp.int32)
        # only the raw coordinates ride the sort; rowids/txs/ty are
        # recomputed from the sorted coords (cheap elementwise, fused)
        sorted_ops = jax.lax.sort((ykey_, *coords_, iota), num_keys=1)
        s_rowids, s_txs, s_ty = derive(
            sorted_ops[1 : 1 + planes], sorted_ops[0]
        )
        perm = sorted_ops[-1]
        g_cat = jnp.take(
            jnp.concatenate([g.astype(jnp.bfloat16) for g in gs], axis=-1),
            perm, axis=0, mode="clip",
        )
        gs_sorted = [
            g_cat[:, p * feat : (p + 1) * feat] for p in range(planes)
        ]
        grads = pk.packed_bilerp_bwd_group(
            gs_sorted, s_rowids, s_txs, s_ty, r=r, tr=tr, group=group,
            interpret=interpret,
        )
        return (
            [g.astype(packeds[0].dtype) for g in grads],
            [jnp.zeros_like(c) for c in coords_],
            jnp.zeros_like(ykey_),
        )

    op.defvjp(op_fwd, op_bwd)
    return op(list(packeds), list(coords), ykey)
