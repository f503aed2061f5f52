"""Multi-level (temporal) hash-grid encoders.

TPU-native replacement for the reference's in-tree CUDA temporal grid
encoder (N1/N2 in SURVEY §2.1; ref: field_components/cuda/csrc/
temporal_gridencoder.cu + field_components/temporal_grid.py) and for
tiny-cuda-nn's HashGrid encoding (N3).  One implementation covers both:
the temporal variant stores ``level_dim + temporal_dim`` channels per
hash row and selects/interpolates output channels with a time-conditioned
sliding window; the static variant is the ``temporal_dim=0`` special case.

Design notes (vs the CUDA kernels):
  * per-level tables are one flat [rows, channels] array with offsets,
    like the reference (temporal_grid.py:203-224);
  * spatial hashing uses the torch-ngp prime XOR hash
    (temporal_gridencoder.cu:47-61) with modulo table size; levels whose
    dense grid fits use direct (tiled) indexing;
  * dense/tiled levels OCT-PACK: stride indexing is linear, so one
    gather of a corner-rolled [rows, 2^D * C] table fetches all corners;
  * XOR-hash levels (and every level of TEMPORAL grids) gather per
    corner with a custom VJP whose table gradient sorts updates by hash
    row and runs the Pallas sorted_scatter_add kernel — replacing both
    the CUDA atomicAdd backward (temporal_gridencoder.cu:284) and XLA's
    serializing scatter-add (~80 ns/update, PERF.md);
  * on CPU (and for unsupported channel widths) gradients flow through
    jnp.take's transpose, which is also the tests' oracle.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)


@dataclass(frozen=True)
class HashGridConfig:
    """(ref: temporal_grid.py:160-230 constructor; tcnn HashGrid params)."""

    temporal_dim: int = 0  # 0 => plain InstantNGP grid
    input_dim: int = 3
    num_levels: int = 16
    level_dim: int = 2
    per_level_scale: float = 2.0
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    desired_resolution: Optional[int] = None
    gridtype: str = "hash"  # hash | tiled
    align_corners: bool = False
    # "xor": the CUDA prime-XOR hash (temporal_gridencoder.cu fast_hash) —
    # bit-exact parity with the reference's kernels (golden-tested).
    # "zline": the LAST input dim enters the hash ADDITIVELY
    # (idx = xor_hash(leading dims) + z mod rows), so a cell's two
    # z-corners occupy ADJACENT table rows.  A roll-packed [rows, 2C]
    # copy then fetches BOTH corners in one gather — hashed-level gather
    # rows, backward sort keys and scatter updates all HALVE (measured
    # 2x on the level pipeline, scripts/microbench_pairgather.py).
    # Collision quality matches xor in spirit: torch-ngp itself maps its
    # first dim with prime 1 (linear); zline moves the linear dim to z
    # and keeps primes on the rest.  Checkpoints are scheme-specific.
    hash_scheme: str = "xor"  # xor | zline

    @property
    def scale(self) -> float:
        if self.desired_resolution is not None:
            return float(
                np.exp2(
                    np.log2(self.desired_resolution / self.base_resolution)
                    / max(self.num_levels - 1, 1)
                )
            )
        return self.per_level_scale

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    @property
    def row_channels(self) -> int:
        return self.level_dim + self.temporal_dim


@functools.lru_cache(maxsize=None)
def level_layout(cfg: HashGridConfig) -> Tuple[Tuple[int, ...], Tuple[float, ...], Tuple[int, ...]]:
    """(offsets, scales, resolutions) per level.

    Follows the CUDA kernel's convention (temporal_gridencoder.cu:
    kernel_grid setup, matching torch-ngp): per-level ``scale`` =
    2^(l * log2(per_level_scale)) * H - 1 and ``resolution`` =
    ceil(scale) + 1; rows = min(2^log2_hashmap_size, resolution^D)
    rounded up to a multiple of 8 (ref: temporal_grid.py:203-224).
    """
    offsets = []
    scales = []
    resolutions = []
    offset = 0
    max_params = 2**cfg.log2_hashmap_size
    for i in range(cfg.num_levels):
        scale = cfg.scale**i * cfg.base_resolution - 1.0
        resolution = int(np.ceil(scale)) + 1
        rows = min(max_params, resolution**cfg.input_dim)
        rows = int(np.ceil(rows / 8) * 8)
        offsets.append(offset)
        scales.append(scale)
        resolutions.append(resolution)
        offset += rows
    offsets.append(offset)
    return tuple(offsets), tuple(scales), tuple(resolutions)


def init_hash_grid(rng: jax.Array, cfg: HashGridConfig, std: float = 1e-4) -> dict:
    """U(-1e-4, 1e-4) embedding table (ref: temporal_grid.py:233-234)."""
    offsets, _, _ = level_layout(cfg)
    table = jax.random.uniform(
        rng, (offsets[-1], cfg.row_channels), jnp.float32, -std, std
    )
    return {"embeddings": table}


# ---------------------------------------------------------------------------
# Temporal channel-combination tables (ref: temporal_grid.py:231-301)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def temporal_tables(cfg: HashGridConfig):
    """Build the per-temporal-row channel tables.

    Consecutive temporal rows differ in exactly one channel so the window
    slides smoothly.  Returns numpy arrays:
      sampling_index [T-1, C*4] — per output channel (w_a, ch_a, w_b, ch_b)
      mask_a/mask_b  [T-1, C*4] — where the time-interpolation weights go
      index_list     [T-1, C+1] — [new_ch, next_ch, shared...] rows used by
                                  the temporal TV loss.
    """
    assert cfg.temporal_dim >= 2
    level_dim = cfg.level_dim
    index_init = [0, level_dim] + list(range(1, level_dim))
    permute_base = list(range(2, level_dim + 1))
    last_entry = 0
    index_list = [np.asarray(index_init, np.int64)]
    permute_list = [np.asarray(permute_base[:0] + [0] + permute_base[0:], np.int64)]

    def to_sampling_index(index, permute, last_entry):
        row = index[permute]
        row = np.stack(
            [np.ones_like(row), row, np.zeros_like(row), np.zeros_like(row)], 1
        ).reshape(-1)
        mask_a = np.zeros_like(row, bool)
        mask_b = np.zeros_like(row, bool)
        row = row.astype(np.float32)
        row[last_entry * 4 + 3] = index[1]
        mask_a[last_entry * 4] = True
        mask_b[last_entry * 4 + 2] = True
        return row, mask_a, mask_b

    row, ma, mb = to_sampling_index(index_list[0], permute_list[0], last_entry)
    sampling_index, mask_a_list, mask_b_list = [row], [ma], [mb]
    for _ in range(1, cfg.temporal_dim - 1):
        last_entry += 1
        if last_entry >= level_dim:
            last_entry = 0
        last_max = int(index_list[-1].max())
        last_min = int(index_list[-1].min())
        tem_permute = permute_list[-1].copy()
        tem_permute[tem_permute == 0] += 1
        prev = index_list[-1][1:][tem_permute - 1].tolist()
        prev.pop(last_entry)
        new_index = np.asarray([last_min + 1, last_max + 1] + prev, np.int64)
        new_permute = np.asarray(
            permute_base[:last_entry] + [0] + permute_base[last_entry:], np.int64
        )
        index_list.append(new_index)
        permute_list.append(new_permute)
        row, ma, mb = to_sampling_index(new_index, new_permute, last_entry)
        sampling_index.append(row)
        mask_a_list.append(ma)
        mask_b_list.append(mb)

    return (
        np.stack(sampling_index),
        np.stack(mask_a_list),
        np.stack(mask_b_list),
        np.stack(index_list),
    )


def get_temporal_index(cfg: HashGridConfig, time: jnp.ndarray) -> jnp.ndarray:
    """time [B] in [0,1] -> [B, C*4] (w_a, ch_a, w_b, ch_b) rows
    (ref: temporal_grid.py:320-334)."""
    sampling_index, mask_a, mask_b, _ = temporal_tables(cfg)
    n_rows = sampling_index.shape[0]
    row_val = time * (n_rows - 1)
    row_idx = jnp.clip(jnp.floor(row_val).astype(jnp.int32), 0, n_rows - 1)
    rows = jnp.take(jnp.asarray(sampling_index), row_idx, axis=0)  # [B, C*4]
    ma = jnp.take(jnp.asarray(mask_a), row_idx, axis=0)
    mb = jnp.take(jnp.asarray(mask_b), row_idx, axis=0)
    w_a = (row_idx + 1 - row_val)[:, None]
    w_b = (row_val - row_idx)[:, None]
    rows = jnp.where(ma, w_a, rows)
    rows = jnp.where(mb, w_b, rows)
    return rows


def get_temporal_row(cfg: HashGridConfig, time: jnp.ndarray) -> jnp.ndarray:
    """time [B] -> temporal-table row index [B] int32 (the same
    ``row_idx`` get_temporal_index gathers the pick table with)."""
    n_rows = cfg.temporal_dim - 1
    row_val = time * (n_rows - 1)
    return jnp.clip(jnp.floor(row_val).astype(jnp.int32), 0, n_rows - 1)


@functools.lru_cache(maxsize=None)
def temporal_fold_matrix(cfg: HashGridConfig) -> np.ndarray:
    """Static [(T-1) * 2L, c_row] one-hot fold for the temporal-row-keyed
    backward: payload slot j of temporal row t lands in channel
    ch_a(t, j) for j < L, ch_b(t, j - L) for j >= L.  The pick CHANNELS
    are a static function of the temporal row (only the interpolation
    weights vary per sample — see temporal_tables), which is what lets
    the table gradient ride ``idx * (T-1) + t_row`` keys with a compact
    2L-value payload and fold back densely with one MXU matmul."""
    sampling_index, _, _, _ = temporal_tables(cfg)
    n_rows = sampling_index.shape[0]
    L = cfg.level_dim
    c_row = cfg.level_dim + cfg.temporal_dim
    m = np.zeros((n_rows * 2 * L, c_row), np.float32)
    for t in range(n_rows):
        for l in range(L):
            m[t * 2 * L + l, int(sampling_index[t, 4 * l + 1])] += 1.0
            m[t * 2 * L + L + l, int(sampling_index[t, 4 * l + 3])] += 1.0
    return m


# ---------------------------------------------------------------------------
# Encoding
# ---------------------------------------------------------------------------

def _hash_index(coords: jnp.ndarray, resolution: int, rows: int, cfg, dense: bool) -> jnp.ndarray:
    """Integer lattice coords [..., D] -> table row indices
    (ref: temporal_gridencoder.cu:47-90 fast_hash/get_grid_index).

    Dense levels (grid fits in the table) and ``tiled`` mode use direct
    stride indexing; oversubscribed hash levels use the prime XOR hash.
    """
    if (dense and cfg.gridtype == "hash") or cfg.gridtype == "tiled":
        idx = coords[..., 0]
        for d in range(1, cfg.input_dim):
            idx = idx * resolution + coords[..., d]
        return idx % rows
    if cfg.hash_scheme == "zline":
        # last dim additive: idx(z+1) == idx(z) + 1 (mod rows), which is
        # what lets the paired forward fetch both z-corners in one row
        # (see _hash_level_apply_paired)
        last = cfg.input_dim - 1
        h = jnp.zeros(coords.shape[:-1], jnp.uint32)
        for d in range(last):
            h = h ^ (coords[..., d].astype(jnp.uint32)
                     * np.uint32(_PRIMES[(d + 1) % 3]))
        hr = (h % np.uint32(rows)).astype(jnp.int32)
        return jax.lax.rem(hr + coords[..., last], np.int32(rows))
    h = coords[..., 0].astype(jnp.uint32) * np.uint32(_PRIMES[0])
    for d in range(1, cfg.input_dim):
        h = h ^ (coords[..., d].astype(jnp.uint32) * np.uint32(_PRIMES[d % 3]))
    return (h % np.uint32(rows)).astype(jnp.int32)


# flip in tests to run the Pallas scatter in interpreter mode on CPU
SCATTER_INTERPRET = False
# per-level corner-feature residual budget: below this, the backward
# reuses saved features; above it, it re-gathers (see _hash_level_apply)
_RESIDUAL_BYTES_CAP = 64 * 1024 * 1024
# larger allowance for the temporal backward's merged bf16 update stream
# when the input-cotangent transients (f32 acc / corner feats) are skipped.
# Sized against the LANE-PADDED HBM footprint (row-major bf16 tiles to
# T(8,128)(2,1): 66 cols occupy 128 lanes) and the fact that the sort
# gather keeps gw + gw_s live together per level — 512M here OOM'd
# nerfplayer (8 x 384M padded buffers at K*B=1.57M rows, c_row=66).
_MERGED_GW_BYTES_CAP = 128 * 1024 * 1024
# dense-gw source size above which the temporal backward's per-corner
# permute switches to the compact sort-operand payload (see op_bwd)
_COMPACT_STREAM_BYTES = 128 * 1024 * 1024
# temporal-row-keyed backward: total keys at/below this sort in ONE
# merged pass; above it, per-corner sorts win (76.0 vs 61.7 ms/level at
# prop1 4.2M keys; 9.2 vs 11.8 at main 1.6M — scripts/diag_temporal.py)
_TROWKEY_MERGE_KEYS = 2_000_000
# tests flip this off to exercise the dense/compact fallback branches
_TROWKEY_ENABLE = True
# NOTE on layouts: pinning the per-level table cotangent column-major
# here was measured COUNTERPRODUCTIVE (one extra padded {1,0} copy of
# every d_table at constraint points, +2.9 GB HLO temps at
# nerfplayer-nerfacto scale) — the {1,0} pressure comes from the grad
# assembly/adam side, so the anchor lives in the Trainer's update step
# (engine/trainer.py _pin_big_table_layouts), not in this backward.


def _temporal_row_pad(c_row: int) -> int:
    """Channel padding for the temporal kernel's row-packing: next power
    of two, bumped to a full 128-lane line when in (32, 128) — the scatter
    kernel packs c <= 32 or c == 128 rows only.  Single source of truth
    for the gate (hash_grid_encode) and the kernel call
    (_hash_level_apply_temporal)."""
    c_pad = 1 << (c_row - 1).bit_length()
    if 32 < c_pad < 128:
        c_pad = 128
    return c_pad


def _use_scatter_kernel(C: int, rows: int) -> bool:
    """XOR-hash levels route their table gradient through the sorted
    Pallas scatter kernel on TPU: XLA's scatter-add serializes colliding
    updates (~80 ns/update into the narrow [R, 2] tables — 5 of the 6
    hash levels cost ~256 ms EACH at nerfacto scale, PERF.md).

    Tables with >= 2^24 rows (log2_hashmap_size >= 24, valid in the
    reference) fall back to the XLA path: the kernel's row meta rides f32
    and cannot address them."""
    return (
        (C == 128 or (C <= 32 and 128 % C == 0))
        and rows < (1 << 24)
        and (SCATTER_INTERPRET or jax.default_backend() == "tpu")
    )


def _hash_level_apply(lvl_table, idxs, ws, input_grads: bool = True):
    """sum_k ws[k][:, None] * lvl_table[idxs[k]] with a sorted-scatter
    backward for the table gradient.

    Args:
        lvl_table: [rows, C] f32 one level's embedding rows.
        idxs: [K, B] int32 LOCAL row indices (corners stacked).
        ws: [K, B] f32 interpolation weights (carry gradient to
            positions via the frac products).
        input_grads: static; False when the caller's positions are
            detached (no camera optimizer / deformation) — the backward
            then skips the d_ws corner re-gathers and reductions
            entirely instead of relying on XLA DCE (which does not fire
            across the custom-VJP boundary in the full step).
    Returns:
        [B, C] f32.
    """
    rows = lvl_table.shape[0]

    @jax.custom_vjp
    def op(lvl_table, idxs, ws):
        out = 0.0
        for k in range(idxs.shape[0]):
            out = out + ws[k][:, None] * jnp.take(
                lvl_table, idxs[k], axis=0, mode="clip"
            )
        return out

    # residual policy (static at trace time): saving the [K, B, C]
    # corner-feature stack makes the ws cotangent free, but at NGP
    # sample counts the stacks for all levels together blow HBM — large
    # levels RE-GATHER per corner in the backward instead
    K, B = idxs.shape
    save_feats = (input_grads
                  and K * B * lvl_table.shape[-1] * 4 <= _RESIDUAL_BYTES_CAP)

    def op_fwd(lvl_table, idxs, ws):
        if save_feats:
            feats = jnp.stack([
                jnp.take(lvl_table, idxs[k], axis=0, mode="clip")
                for k in range(idxs.shape[0])
            ])
            out = jnp.einsum("kb,kbc->bc", ws, feats)
        else:
            out = op(lvl_table, idxs, ws)
            feats = None
        return out, (lvl_table, idxs, ws, feats)

    def op_bwd(res, g):
        from soccernerfs_tpu.ops.pallas import plane_kernels as pk

        lvl_table, idxs, ws, feats = res
        C = lvl_table.shape[-1]
        zero_i = np.zeros(idxs.shape, dtype=jax.dtypes.float0)
        merged = K * B * C * 4 <= _RESIDUAL_BYTES_CAP
        if feats is not None or (not input_grads and merged):
            # small level: ONE merged sort (gradients ride sort operands)
            # and one kernel pass over all corners
            d_ws = (jnp.einsum("bc,kbc->kb", g, feats) if input_grads
                    else jnp.zeros(ws.shape, ws.dtype))
            gw = (ws[:, :, None] * g[None]).reshape(K * B, C)
            srt = jax.lax.sort(
                (idxs.reshape(K * B), *(gw[:, ch] for ch in range(C))),
                num_keys=1,
            )
            d_table = pk.sorted_scatter_add(
                jnp.stack(srt[1:], axis=-1), srt[0], r=rows, c=C,
                interpret=SCATTER_INTERPRET,
            )
            return d_table.astype(lvl_table.dtype), zero_i, d_ws
        # big level: bound peak memory — re-gather and scatter per corner
        d_table = jnp.zeros((rows, C), jnp.float32)
        d_ws = []
        iota = jnp.arange(B, dtype=jnp.int32)
        for k in range(K):
            if input_grads:
                feats_k = jnp.take(lvl_table, idxs[k], axis=0, mode="clip")
                d_ws.append(jnp.einsum("bc,bc->b", g, feats_k))
            gw_k = ws[k][:, None] * g                         # [B, C]
            idx_s, perm = jax.lax.sort((idxs[k], iota), num_keys=1)
            gw_s = jnp.take(gw_k, perm, axis=0, mode="clip")
            d_table = d_table + pk.sorted_scatter_add(
                gw_s, idx_s, r=rows, c=C, interpret=SCATTER_INTERPRET,
            )
        d_ws_out = (jnp.stack(d_ws) if input_grads
                    else jnp.zeros(ws.shape, ws.dtype))
        return (d_table.astype(lvl_table.dtype), zero_i, d_ws_out)

    op.defvjp(op_fwd, op_bwd)
    return op(lvl_table, idxs, ws)


def _hash_level_apply_paired(lvl_table, idxs, wxy, fz,
                             input_grads: bool = True):
    """zline-hash level forward: each of the 2^(D-1) leading-corner rows
    fetches BOTH z-corners from a roll-packed [rows, 2C] bf16 copy —
    half the gather rows of _hash_level_apply, with a sorted-scatter
    backward whose sort keys and kernel updates also halve (the pair's
    two updates ride one key as a 2C payload into a virtual [rows, 2C]
    table, folded back by one roll-add).

    Args:
        lvl_table: [rows, C] f32 one level's embedding rows.
        idxs: [K2, B] int32 zline row indices of the dz=0 corners
            (idx+1 mod rows is the dz=1 corner by construction).
        wxy: [K2, B] f32 leading-dims interpolation weights.
        fz: [B] f32 last-dim fraction (dz=1 weight; 1-fz for dz=0).
    Returns:
        [B, C] f32.
    """
    rows, C = lvl_table.shape
    K2, B = idxs.shape

    def pack2(t):
        # row r -> [t[r], t[(r+1) % rows]]; bf16 halves the gathered
        # stream (weights stay f32, the combine promotes)
        tb = t.astype(jnp.bfloat16)
        return jnp.concatenate([tb, jnp.roll(tb, -1, axis=0)], axis=-1)

    @jax.custom_vjp
    def op(lvl_table, idxs, wxy, fz):
        p2 = pack2(lvl_table)
        out = 0.0
        wz1 = fz[:, None]
        wz0 = 1.0 - wz1
        for k in range(K2):
            f = jnp.take(p2, idxs[k], axis=0, mode="clip")
            out = out + wxy[k][:, None] * (
                wz0 * f[:, :C] + wz1 * f[:, C:]
            )
        return out

    save_feats = (input_grads
                  and K2 * B * 2 * C * 2 <= _RESIDUAL_BYTES_CAP)  # bf16

    def op_fwd(lvl_table, idxs, wxy, fz):
        p2 = pack2(lvl_table)
        wz1 = fz[:, None]
        wz0 = 1.0 - wz1
        if save_feats:
            feats = jnp.stack([
                jnp.take(p2, idxs[k], axis=0, mode="clip")
                for k in range(K2)
            ])  # [K2, B, 2C] bf16
            fcomb = (wz0[None] * feats[..., :C].astype(jnp.float32)
                     + wz1[None] * feats[..., C:].astype(jnp.float32))
            out = jnp.einsum("kb,kbc->bc", wxy, fcomb)
        else:
            out = op(lvl_table, idxs, wxy, fz)
            feats = None
        return out, (lvl_table, idxs, wxy, fz, feats)

    def op_bwd(res, g):
        from soccernerfs_tpu.ops.pallas import plane_kernels as pk

        lvl_table, idxs, wxy, fz, feats = res
        zero_i = np.zeros(idxs.shape, dtype=jax.dtypes.float0)
        wz1 = fz[:, None]
        wz0 = 1.0 - wz1
        # the pair update: one key (idx), payload [wz0*g, wz1*g] * wxy_k
        g2 = jnp.concatenate([wz0 * g, wz1 * g], axis=-1)    # [B, 2C]
        merged = K2 * B * 2 * C * 4 <= _RESIDUAL_BYTES_CAP
        if feats is not None or (not input_grads and merged):
            if input_grads:
                f32 = feats.astype(jnp.float32)
                fcomb = wz0[None] * f32[..., :C] + wz1[None] * f32[..., C:]
                d_wxy = jnp.einsum("bc,kbc->kb", g, fcomb)
                d_fz = jnp.einsum(
                    "bc,kbc->b", g,
                    wxy[:, :, None] * (f32[..., C:] - f32[..., :C]),
                )
            else:
                d_wxy = jnp.zeros(wxy.shape, wxy.dtype)
                d_fz = jnp.zeros(fz.shape, fz.dtype)
            gw = (wxy[:, :, None] * g2[None]).reshape(K2 * B, 2 * C)
            srt = jax.lax.sort(
                (idxs.reshape(K2 * B), *(gw[:, ch] for ch in range(2 * C))),
                num_keys=1,
            )
            virt = pk.sorted_scatter_add(
                jnp.stack(srt[1:], axis=-1), srt[0], r=rows, c=2 * C,
                interpret=SCATTER_INTERPRET,
            )
            d_table = virt[:, :C] + jnp.roll(virt[:, C:], 1, axis=0)
            return (d_table.astype(lvl_table.dtype), zero_i, d_wxy,
                    d_fz)
        # big level: bound peak memory — re-gather and scatter per corner
        p2 = pack2(lvl_table) if input_grads else None
        d_table = jnp.zeros((rows, 2 * C), jnp.float32)
        d_wxy = []
        d_fz = 0.0
        iota = jnp.arange(B, dtype=jnp.int32)
        for k in range(K2):
            if input_grads:
                f = jnp.take(p2, idxs[k], axis=0, mode="clip").astype(
                    jnp.float32
                )
                fcomb_k = wz0 * f[:, :C] + wz1 * f[:, C:]
                d_wxy.append(jnp.einsum("bc,bc->b", g, fcomb_k))
                d_fz = d_fz + wxy[k] * jnp.einsum(
                    "bc,bc->b", g, f[:, C:] - f[:, :C]
                )
            gw_k = wxy[k][:, None] * g2                      # [B, 2C]
            idx_s, perm = jax.lax.sort((idxs[k], iota), num_keys=1)
            gw_s = jnp.take(gw_k, perm, axis=0, mode="clip")
            d_table = d_table + pk.sorted_scatter_add(
                gw_s, idx_s, r=rows, c=2 * C, interpret=SCATTER_INTERPRET,
            )
        d_table = d_table[:, :C] + jnp.roll(d_table[:, C:], 1, axis=0)
        d_wxy_out = (jnp.stack(d_wxy) if input_grads
                     else jnp.zeros(wxy.shape, wxy.dtype))
        d_fz_out = d_fz if input_grads else jnp.zeros(fz.shape, fz.dtype)
        return (d_table.astype(lvl_table.dtype), zero_i, d_wxy_out,
                d_fz_out)

    op.defvjp(op_fwd, op_bwd)
    return op(lvl_table, idxs, wxy, fz)


def _scatter_sorted_wide(gw_s, idx_s, rows, interpret):
    """sorted_scatter_add for payloads of ANY width: columns split into
    kernel-legal segments (128-lane chunks, then a padded tail), one
    kernel call per segment over the SAME sorted index stream.  For
    widths <= 128 this is exactly one padded call; for paired 2*c_row
    payloads above 128 lanes (66-channel temporal rows -> 132) it costs
    one full-width call plus a cheap row-packed tail call — still half
    the full-width scatter calls of the unpaired stream."""
    from soccernerfs_tpu.ops.pallas import plane_kernels as pk

    c_total = gw_s.shape[-1]
    out = []
    c0 = 0
    while c0 < c_total:
        w = min(128, c_total - c0)
        w_pad = _temporal_row_pad(w)
        seg = gw_s[:, c0:c0 + w]
        if w_pad > w:
            seg = jnp.pad(seg, ((0, 0), (0, w_pad - w)))
        out.append(pk.sorted_scatter_add(
            seg, idx_s, r=rows, c=w_pad, interpret=interpret,
        )[:, :w])
        c0 += w
    return jnp.concatenate(out, axis=-1) if len(out) > 1 else out[0]


def _window_pick(acc, ch_a, w_a, ch_b, w_b):
    """w_a * acc[:, ch_a] + w_b * acc[:, ch_b] per output channel, as one
    fused compare-select REDUCTION per channel over the [B, C_row] rows.

    jnp.take_along_axis lowers to per-row gathers on TPU — it was 5.06 s
    of a 7.5 s nerfplayer step (scripts/profile_method.py); the
    compare-select form streams ``acc`` through the VPU instead."""
    C = acc.shape[-1]
    ch_i = jnp.arange(C, dtype=ch_a.dtype)[None, :]
    cols = []
    for l in range(ch_a.shape[-1]):
        sel = (w_a[:, l:l + 1] * (ch_a[:, l:l + 1] == ch_i)
               + w_b[:, l:l + 1] * (ch_b[:, l:l + 1] == ch_i))
        cols.append(jnp.sum(sel * acc, axis=-1))
    return jnp.stack(cols, axis=-1)


def _hash_level_apply_temporal(lvl_table, idxs, ws, ch_a, w_a, ch_b, w_b,
                               t_row=None, fold_m=None,
                               input_grads: bool = True,
                               paired: bool = False):
    """Temporal sliding-window variant of _hash_level_apply.

    The window interpolation is LINEAR in the gathered rows and its
    picks (ch_a/w_a/ch_b/w_b) do not depend on the corner, so the
    corner-weighted row sum accumulates FIRST in row space
    ([B, row_channels]) and the channel pick runs ONCE per level instead
    of once per corner (and never via take_along_axis — see
    _window_pick).  The per-corner table gradient is ws[k] * u for one
    shared u = d(out)/d(acc), so when the transient fits the residual
    cap all corners merge into a single sort + sorted-scatter pass.

    Args:
        lvl_table: [rows, C_row] f32; idxs: [K, B] int32 local rows.
        ws: [K, B] f32 corner weights (grad -> positions).
        ch_a/ch_b: [B, L] int32 channel picks; w_a/w_b: [B, L] f32
            temporal weights (grad -> time).
        paired: static; True when consecutive corners sit in
            adjacent table rows (dense stride or zline hash:
            idxs[2k+1] == idxs[2k] + 1 mod rows) AND 2*c_row <= 128
            bf16 lanes.  The forward then gathers a roll-packed
            [rows, 2*c_row] copy with the even-corner indices only —
            same math, HALF the gather rows (the temporal forward is
            gather-bound: 109 of 121 ms at nerfplayer prop scale,
            scripts/diag_temporal.py fwd ablation).  The backward
            pairs the same way (mirroring _hash_level_apply_paired):
            a pair's two table updates ride ONE sort key as a
            [2*c_row]-lane payload into a virtual [rows, 2*c_row]
            scatter folded back by one roll-add, and the input-grad
            corner re-gathers fetch both corners per row — sorts,
            permute rows, scatter-kernel calls and re-gathers all
            halve.
    Returns:
        [B, L] f32.
    """
    rows, c_row = lvl_table.shape
    if t_row is None:
        # no temporal-row stream (oversized table fallback): the keyed
        # branch gates off on fold_m, the op still needs a traced arg
        t_row = jnp.zeros((idxs.shape[1],), jnp.int32)
        fold_m = None
    # pairing halves the BACKWARD's sorts/permute-rows/scatter calls at
    # any row width (the >128-lane payload splits into kernel-legal
    # segments, _scatter_sorted_wide); the FORWARD pairs only while the
    # packed pair row fits one bf16 lane-tile — at 2*c_row > 128 a
    # paired gather fetches 2 tiles/row and the row-fetch count is a
    # wash (PERF.md r3 arithmetic)
    paired_fwd = paired and 2 * c_row <= 128

    def _corner_terms(t16, idxs, ws):
        # yields ws-weighted [B, c_row] bf16-sourced terms, one per
        # GATHER (2 corners/gather when paired); args must be the
        # custom-vjp-traced values, never the enclosing scope's
        if paired_fwd:
            p2 = jnp.concatenate([t16, jnp.roll(t16, -1, axis=0)],
                                 axis=-1)
            for k2 in range(idxs.shape[0] // 2):
                f = jnp.take(p2, idxs[2 * k2], axis=0, mode="clip")
                yield (ws[2 * k2][:, None] * f[:, :c_row]
                       + ws[2 * k2 + 1][:, None] * f[:, c_row:])
        else:
            for k in range(idxs.shape[0]):
                yield ws[k][:, None] * jnp.take(
                    t16, idxs[k], axis=0, mode="clip")

    # the [B, row_channels] f32 corner accumulator costs B*C_row*4 bytes
    # (528 MB at nerfplayer-ngp-complete scale — it alone pushed the step
    # over HBM); big levels pick per corner instead (the pick is linear,
    # both orders are exact)
    _acc_small = idxs.shape[1] * c_row * 4 <= _RESIDUAL_BYTES_CAP

    @jax.custom_vjp
    def op(lvl_table, idxs, ws, ch_a, w_a, ch_b, w_b, t_row):
        # bf16 row gathers (f32 weights promote the sum back to f32):
        # halves the dominant [B, row_channels] streams — at NGP sample
        # counts (2M points) these are the step's biggest buffers
        t16 = lvl_table.astype(jnp.bfloat16)
        if _acc_small:
            acc = 0.0
            for term in _corner_terms(t16, idxs, ws):
                acc = acc + term
            return _window_pick(acc, ch_a, w_a, ch_b, w_b)
        out = 0.0
        # the pick is linear, so it distributes over the (already
        # ws-weighted) per-gather terms
        for term in _corner_terms(t16, idxs, ws):
            out = out + _window_pick(term, ch_a, w_a, ch_b, w_b)
        return out

    def op_fwd(lvl_table, idxs, ws, ch_a, w_a, ch_b, w_b, t_row):
        # O(inputs) residuals only — corner features are re-gathered per
        # corner in the backward (see _hash_level_apply)
        return (op(lvl_table, idxs, ws, ch_a, w_a, ch_b, w_b, t_row),
                (lvl_table, idxs, ws, ch_a, w_a, ch_b, w_b, t_row))

    def op_bwd(res, g):
        from soccernerfs_tpu.ops.pallas import plane_kernels as pk

        lvl_table, idxs, ws, ch_a, w_a, ch_b, w_b, t_row = res
        K, B = idxs.shape
        ch_i = jnp.arange(c_row, dtype=ch_a.dtype)[None, :]
        # u[b, c] = sum_l g[b, l] (w_a 1[ch_a==c] + w_b 1[ch_b==c]):
        # d(out)/d(acc), shared by every corner
        u = 0.0
        for l in range(g.shape[-1]):
            gl = g[:, l:l + 1]
            u = u + gl * (
                w_a[:, l:l + 1] * (ch_a[:, l:l + 1] == ch_i)
                + w_b[:, l:l + 1] * (ch_b[:, l:l + 1] == ch_i)
            )
        if input_grads:
            t16 = lvl_table.astype(jnp.bfloat16)

            def _corner_feats(t16):
                # per-CORNER [B, c_row] features, half the gathers when
                # paired (both z-corners ride one roll-packed row)
                if paired_fwd:
                    p2 = jnp.concatenate(
                        [t16, jnp.roll(t16, -1, axis=0)], axis=-1)
                    for k2 in range(K // 2):
                        f = jnp.take(p2, idxs[2 * k2], axis=0,
                                     mode="clip")
                        yield f[:, :c_row]
                        yield f[:, c_row:]
                else:
                    for k in range(K):
                        yield jnp.take(t16, idxs[k], axis=0,
                                       mode="clip")

            # d_w{a,b}[b, l] = g[b, l] * acc[b, ch_{a,b}[b, l]]; at big B
            # the [B, C_row] f32 acc is not materialized — per-corner
            # picks are summed instead (linear in the corner sum)
            d_ws = []
            if _acc_small:
                acc = 0.0
                for k, feats_k in enumerate(_corner_feats(t16)):
                    acc = acc + ws[k][:, None] * feats_k
                    d_ws.append(jnp.sum(feats_k.astype(u.dtype) * u,
                                        axis=-1))
                da, db = [], []
                for l in range(g.shape[-1]):
                    am = ch_a[:, l:l + 1] == ch_i
                    bm = ch_b[:, l:l + 1] == ch_i
                    da.append(g[:, l] * jnp.sum(jnp.where(am, acc, 0.0),
                                                -1))
                    db.append(g[:, l] * jnp.sum(jnp.where(bm, acc, 0.0),
                                                -1))
            else:
                da = [0.0] * g.shape[-1]
                db = [0.0] * g.shape[-1]
                for k, feats_k in enumerate(_corner_feats(t16)):
                    d_ws.append(jnp.sum(feats_k.astype(u.dtype) * u,
                                        axis=-1))
                    for l in range(g.shape[-1]):
                        am = ch_a[:, l:l + 1] == ch_i
                        bm = ch_b[:, l:l + 1] == ch_i
                        gk = g[:, l] * ws[k]
                        da[l] = da[l] + gk * jnp.sum(
                            jnp.where(am, feats_k, 0.0), -1)
                        db[l] = db[l] + gk * jnp.sum(
                            jnp.where(bm, feats_k, 0.0), -1)
            d_wa = jnp.stack(da, axis=-1)
            d_wb = jnp.stack(db, axis=-1)
            d_ws_out = jnp.stack(d_ws)
        else:
            # positions/times detached: skip the corner re-gathers and
            # pick reductions — only the table gradient survives
            d_wa = jnp.zeros(w_a.shape, w_a.dtype)
            d_wb = jnp.zeros(w_b.shape, w_b.dtype)
            d_ws_out = jnp.zeros(ws.shape, ws.dtype)
        # per-corner splitting exists to bound transients; with the
        # input-cotangent work skipped the only big transient left is the
        # bf16 gw stream, so a larger cap applies — merging saves the
        # K-1 extra [rows, c_row] f32 d_table accumulations and kernel
        # launches (slice_add was ~38 ms/step at nerfplayer-nerfacto
        # scale, PERF.md r4)
        #
        # paired: one update STREAM per corner pair — the dz=1 corner's
        # update rides the dz=0 key as the high half of a [2*c_row]
        # payload into a virtual [rows, 2*c_row] table folded back by
        # one roll-add (idxs[2k+1] == idxs[2k] + 1 mod rows by
        # construction; jnp.roll wraps the last row the same way), so
        # sorts, permute rows and scatter-kernel calls all halve
        Keff = K // 2 if paired else K
        c_eff = 2 * c_row if paired else c_row
        gw_cap = (_MERGED_GW_BYTES_CAP if not input_grads
                  else _RESIDUAL_BYTES_CAP)
        lanes = -(-c_eff // 128) * 128  # row-major T(8,128) lane pad
        merged = Keff * B * lanes * 2 <= gw_cap
        compact = (not merged
                   and B * lanes * 2 >= _COMPACT_STREAM_BYTES)
        L = g.shape[-1]
        p_z = 2 if paired else 1
        n_trows = (fold_m.shape[0] // (2 * L)
                   if fold_m is not None else 0)
        trowkey = (_TROWKEY_ENABLE and fold_m is not None
                   and _use_scatter_kernel(p_z * 2 * L, rows * n_trows))

        def _unfold(v):
            # virtual [rows, c_eff] table -> [rows, c_row]
            if paired:
                return v[:, :c_row] + jnp.roll(v[:, c_row:c_eff], 1,
                                               axis=0)
            return v[:, :c_row]

        if trowkey:
            # TEMPORAL-ROW-KEYED scatter: an update touches at most 2L
            # of the c_row channels, and the pick CHANNELS are a static
            # function of the temporal-table row (temporal_tables) — so
            # the stream rides ``idx * (T-1) + t_row`` keys with a
            # compact [2L * p_z]-value payload into a virtual
            # [rows * (T-1), 2L * p_z] table, ONE sort over all corner
            # streams, and folds back densely with one static one-hot
            # MXU matmul.  Replaces the dense c_pad(=128)-lane one-hot
            # expansion + scatter: 16-32x less kernel I/O, no lane
            # padding, no per-corner u broadcast (measured
            # scripts/diag_temporal.py trowkey vs the dense stages).
            vals = jnp.concatenate([g * w_a, g * w_b], -1)  # [B, 2L]
            pl_ = p_z * 2 * L

            def _stream(k):
                kk = 2 * k if paired else k
                key_k = idxs[kk] * n_trows + t_row
                if paired:
                    pay_k = jnp.concatenate(
                        [ws[kk][:, None] * vals,
                         ws[kk + 1][:, None] * vals], -1)
                else:
                    pay_k = ws[kk][:, None] * vals
                return key_k, pay_k.astype(jnp.bfloat16)

            # one merged sort at small B; per-corner sorts at prop scale
            # (sorting Keff*B=4M keys in one pass measured SLOWER than
            # Keff sorts of B — 76.0 vs 61.7 ms/level at prop1,
            # scripts/diag_temporal.py trowkey)
            # accumulate/fold on the lane-friendly 2D [rows, n_trows*pl_]
            # view — [rows*n_trows, pl_]-shaped f32 intermediates pad
            # pl_ (4/8) lanes to 128 when XLA assigns them row-major
            if Keff * B <= _TROWKEY_MERGE_KEYS:
                streams = [_stream(k) for k in range(Keff)]
                keys = jnp.concatenate([s[0] for s in streams])
                pay = jnp.concatenate([s[1] for s in streams], 0)
                srt = jax.lax.sort(
                    (keys, *(pay[:, j] for j in range(pl_))), num_keys=1)
                virt = pk.sorted_scatter_add(
                    jnp.stack(srt[1:], -1), srt[0], r=rows * n_trows,
                    c=pl_, interpret=SCATTER_INTERPRET,
                ).reshape(rows, n_trows * pl_)
            else:
                virt = jnp.zeros((rows, n_trows * pl_), jnp.float32)
                for k in range(Keff):
                    key_k, pay_k = _stream(k)
                    srt = jax.lax.sort(
                        (key_k, *(pay_k[:, j] for j in range(pl_))),
                        num_keys=1)
                    virt = virt + pk.sorted_scatter_add(
                        jnp.stack(srt[1:], -1), srt[0],
                        r=rows * n_trows, c=pl_,
                        interpret=SCATTER_INTERPRET,
                    ).reshape(rows, n_trows * pl_)
            if paired:
                # Fold both z-corners straight off the 2D view with two
                # zero-interleaved fold matrices.  The 4D
                # [rows, n_trows, 2, 2L] reshape + z-slices this replaces
                # forced a row-major T(2,128) layout in the full train
                # step — 4->128 lane padding, a 15.75 GB HLO temp at the
                # nerfplayer main level (rows=2^18, T-1=63).
                fm3 = np.asarray(fold_m).reshape(n_trows, 2 * L, c_row)
                z = np.zeros_like(fm3)
                fm0 = jnp.asarray(np.concatenate([fm3, z], 1)
                                  .reshape(n_trows * pl_, c_row))
                fm1 = jnp.asarray(np.concatenate([z, fm3], 1)
                                  .reshape(n_trows * pl_, c_row))
                d_table = virt @ fm0 + jnp.roll(virt @ fm1, 1, axis=0)
            else:
                d_table = virt @ jnp.asarray(fold_m)
        elif compact:
            # LARGE-B levels (nerfplayer prop fields: B = 1M samples):
            # permuting the dense [B, c_pad] bf16 gw stream reads a
            # >=128 MB source at the large-source gather rate
            # (~14 ns/row; 113 of 154 ms/level at prop1 scale) — but the
            # gw row is a ws-scaled sum of 2L one-hot channel picks, so
            # the 4L-lane COMPACT payload rides the sort as extra
            # operands and expands to dense rows AFTER the permute
            # (82.7 vs 153.6 ms/level measured, scripts/diag_temporal).
            # At small B the dense source is small and per-corner dense
            # wins (10.5 vs 17.0 at B=196k) — hence the byte gate.
            L = g.shape[-1]
            vals = jnp.concatenate([g * w_a, g * w_b], axis=-1)  # [B,2L]
            chs = jnp.concatenate([ch_a, ch_b], axis=-1)         # [B,2L]
            n_ws = 2 if paired else 1
            d_virt = jnp.zeros((rows, c_eff), jnp.float32)
            for k in range(Keff):
                kk = 2 * k if paired else k
                w_ops = (ws[kk], ws[kk + 1]) if paired else (ws[kk],)
                srt = jax.lax.sort(
                    (idxs[kk], *w_ops,
                     *(vals[:, j] for j in range(2 * L)),
                     *(chs[:, j] for j in range(2 * L))),
                    num_keys=1,
                )
                idx_s = srt[0]
                gw_base = 0.0
                for j in range(2 * L):
                    gw_base = gw_base + srt[1 + n_ws + j][:, None] * (
                        srt[1 + n_ws + 2 * L + j][:, None] == ch_i)
                if paired:
                    gw_s = jnp.concatenate(
                        [srt[1][:, None] * gw_base,
                         srt[2][:, None] * gw_base], axis=-1)
                else:
                    gw_s = srt[1][:, None] * gw_base
                d_virt = d_virt + _scatter_sorted_wide(
                    gw_s.astype(jnp.bfloat16), idx_s, rows,
                    SCATTER_INTERPRET)
            d_table = _unfold(d_virt)
        elif merged:
            # one sort + one kernel pass over all update streams
            if paired:
                gw = jnp.concatenate([ws[0::2][:, :, None] * u[None],
                                      ws[1::2][:, :, None] * u[None]],
                                     axis=-1)
                eff_idx = idxs[0::2]
            else:
                gw = ws[:, :, None] * u[None]
                eff_idx = idxs
            gw = gw.astype(jnp.bfloat16).reshape(Keff * B, c_eff)
            iota = jnp.arange(Keff * B, dtype=jnp.int32)
            idx_s, perm = jax.lax.sort((eff_idx.reshape(Keff * B), iota),
                                       num_keys=1)
            gw_s = jnp.take(gw, perm, axis=0, mode="clip")
            d_table = _unfold(_scatter_sorted_wide(
                gw_s, idx_s, rows, SCATTER_INTERPRET))
        else:
            # bound peak memory: scatter per update stream
            d_virt = jnp.zeros((rows, c_eff), jnp.float32)
            iota = jnp.arange(B, dtype=jnp.int32)
            for k in range(Keff):
                if paired:
                    gw_k = jnp.concatenate([ws[2 * k][:, None] * u,
                                            ws[2 * k + 1][:, None] * u],
                                           axis=-1)
                    eidx = idxs[2 * k]
                else:
                    gw_k = ws[k][:, None] * u
                    eidx = idxs[k]
                idx_s, perm = jax.lax.sort((eidx, iota), num_keys=1)
                gw_s = jnp.take(gw_k.astype(jnp.bfloat16), perm, axis=0,
                                mode="clip")
                d_virt = d_virt + _scatter_sorted_wide(
                    gw_s, idx_s, rows, SCATTER_INTERPRET)
            d_table = _unfold(d_virt)
        zi = np.zeros(idxs.shape, dtype=jax.dtypes.float0)
        zc = np.zeros(ch_a.shape, dtype=jax.dtypes.float0)
        zt = np.zeros(t_row.shape, dtype=jax.dtypes.float0)
        return (d_table.astype(lvl_table.dtype), zi, d_ws_out,
                zc, d_wa, zc, d_wb, zt)

    op.defvjp(op_fwd, op_bwd)
    return op(lvl_table, idxs, ws, ch_a, w_a, ch_b, w_b, t_row)


def hash_grid_encode(
    cfg: HashGridConfig,
    params: dict,
    xyz: jnp.ndarray,
    time: Optional[jnp.ndarray] = None,
    *,
    input_grads: bool = True,
) -> jnp.ndarray:
    """Encode points (optionally with time) -> [B, num_levels * level_dim].

    Args:
        xyz: [B, input_dim] in [0, 1].
        time: [B] in [0, 1]; required when cfg.temporal_dim > 0.
        input_grads: pass False when xyz/time are constants w.r.t. the
            loss (detached PDF samples, no camera optimizer, no
            deformation upstream): the inputs are stop-gradient'ed and
            the level backward skips the position/time cotangent work —
            per-corner feature RE-GATHERS plus the window-pick
            reductions, which otherwise dominate the temporal backward
            (nerfplayer family, PERF.md r4).  The custom-VJP boundary
            hides that work from XLA's DCE, so the skip must be explicit.
    """
    if not input_grads:
        xyz = jax.lax.stop_gradient(xyz)
        time = jax.lax.stop_gradient(time) if time is not None else None
    offsets, scales, resolutions = level_layout(cfg)
    table = params["embeddings"]
    B = xyz.shape[0]
    D = cfg.input_dim
    n_corners = 2**D

    if cfg.temporal_dim > 0:
        assert time is not None
        tri = get_temporal_index(cfg, time)  # [B, C*4]
        tri = tri.reshape(B, cfg.level_dim, 4)
        w_a, ch_a = tri[..., 0], tri[..., 1].astype(jnp.int32)
        w_b, ch_b = tri[..., 2], tri[..., 3].astype(jnp.int32)
        t_row = get_temporal_row(cfg, time)
        fold_m = temporal_fold_matrix(cfg)

    corner_offsets = np.stack(
        np.meshgrid(*([np.arange(2)] * D), indexing="ij"), axis=-1
    ).reshape(-1, D)  # [2^D, D]

    outputs = []
    for lvl in range(cfg.num_levels):
        res = resolutions[lvl]
        rows = offsets[lvl + 1] - offsets[lvl]
        dense = res**D <= rows
        strided = (dense and cfg.gridtype == "hash") or cfg.gridtype == "tiled"

        # CUDA convention: pos = x * scale + (align_corners ? 0 : 0.5),
        # corners in [0, resolution-1] (temporal_gridencoder.cu kernel_grid)
        pos = xyz * scales[lvl] + (0.0 if cfg.align_corners else 0.5)
        pos0 = jnp.floor(pos)
        frac = pos - pos0
        pos0 = pos0.astype(jnp.int32)

        C = table.shape[-1]
        # temporal rows pad channels for the kernel's row-packing (same
        # rule the kernel call applies); plain rows must divide 128 as-is
        c_eff = _temporal_row_pad(C) if cfg.temporal_dim > 0 else C
        temporal_kernel = cfg.temporal_dim > 0 and _use_scatter_kernel(c_eff, rows)

        feats_all = None
        if strided and not temporal_kernel:
            # OCT-PACK: stride indexing is linear in the lattice coords, so
            # corner c's row is (base + delta_c) % rows — pre-rolling the
            # level table by each delta lets ONE gather fetch all 2^D
            # corners (TPU gathers pay per row; 8x fewer rows).  jnp.roll
            # reproduces the CUDA wrap-through-modulo exactly
            # (get_grid_index has no clip), and its transpose keeps the
            # backward scatter at B rows instead of 2^D * B.
            lvl_table = jax.lax.dynamic_slice_in_dim(
                table, offsets[lvl], rows, axis=0
            )
            deltas = []
            for c in range(n_corners):
                off = corner_offsets[c]
                d_val = 0
                for dd in range(D):
                    d_val = d_val * res + int(off[dd])
                deltas.append(d_val % rows)
            packed = jnp.concatenate(
                [jnp.roll(lvl_table, -d, axis=0) for d in deltas], axis=-1
            )  # [rows, 2^D * row_channels]
            base = _hash_index(pos0, res, rows, cfg, dense)
            feats_all = jnp.take(packed, base, axis=0, mode="clip")

        if (
            cfg.hash_scheme == "zline"
            and not strided
            and not dense
            and cfg.temporal_dim == 0
            and _use_scatter_kernel(2 * c_eff, rows)
        ):
            # PAIRED zline path: the dz=0 corners' rows carry both
            # z-corners (additive hash + roll-packed table) — gather
            # rows, sort keys and scatter updates all halve vs the
            # 2^D-corner path below
            lvl_table = jax.lax.dynamic_slice_in_dim(
                table, offsets[lvl], rows, axis=0
            )
            lead = corner_offsets[::2]                  # last-dim == 0
            idxs = jnp.stack([
                _hash_index(pos0 + off, res, rows, cfg, dense)
                for off in lead
            ])
            wxy = jnp.stack([
                jnp.prod(
                    jnp.where(off[None, :-1] == 1,
                              frac[:, :-1], 1.0 - frac[:, :-1]), axis=-1
                )
                for off in lead
            ])
            outputs.append(_hash_level_apply_paired(
                lvl_table, idxs, wxy, frac[:, -1],
                input_grads=input_grads,
            ))
            continue

        if temporal_kernel or (not strided and _use_scatter_kernel(c_eff, rows)):
            # TPU: fused corner gather with a sorted Pallas scatter
            # backward for the table gradient.  TEMPORAL grids route ALL
            # levels here: oct-packing their wide rows materializes a
            # [B, 2^D * row_channels] monster (5 GB at NGP sample counts)
            # and the per-corner XLA fallback scatter-add serializes
            lvl_table = jax.lax.dynamic_slice_in_dim(
                table, offsets[lvl], rows, axis=0
            )
            idxs = jnp.stack([
                _hash_index(pos0 + corner_offsets[c], res, rows, cfg, dense)
                for c in range(n_corners)
            ])
            ws = jnp.stack([
                jnp.prod(
                    jnp.where(corner_offsets[c][None, :] == 1,
                              frac, 1.0 - frac), axis=-1
                )
                for c in range(n_corners)
            ])
            if cfg.temporal_dim > 0:
                # consecutive corners (dz=0/dz=1) sit in adjacent rows
                # when the index is linear in z — dense stride, or the
                # additive zline hash.  The backward pairs at ANY row
                # width (>128-lane pair payloads split into kernel-
                # legal scatter segments); the forward additionally
                # requires the packed pair row to fit one bf16
                # lane-tile (prop fields: c_row=34, pair=68 lanes; the
                # 66-channel mains pair backward-only)
                paired = (
                    (strided or cfg.hash_scheme == "zline")
                    and n_corners % 2 == 0
                )
                outputs.append(_hash_level_apply_temporal(
                    lvl_table, idxs, ws, ch_a, w_a, ch_b, w_b,
                    t_row=t_row, fold_m=fold_m,
                    input_grads=input_grads, paired=paired,
                ))
            else:
                outputs.append(_hash_level_apply(
                    lvl_table, idxs, ws, input_grads=input_grads))
            continue


        level_out = 0.0
        for c in range(n_corners):
            off = corner_offsets[c]
            if strided:
                feats = feats_all[:, c * C:(c + 1) * C]
            else:
                # no clamp: the CUDA kernel wraps out-of-grid corners
                # through the hash modulo (get_grid_index has no clip)
                corner = pos0 + off
                idx = _hash_index(corner, res, rows, cfg, dense) + offsets[lvl]
                feats = jnp.take(table, idx, axis=0)  # [B, row_channels]
            w = jnp.prod(
                jnp.where(off[None, :] == 1, frac, 1.0 - frac), axis=-1, keepdims=True
            )
            level_out = level_out + w * feats         # [B, row_channels]
        if cfg.temporal_dim > 0:
            # the window pick is linear: accumulate corners in row space,
            # pick once per level (and never via take_along_axis — see
            # _window_pick)
            level_out = _window_pick(level_out, ch_a, w_a, ch_b, w_b)
        outputs.append(level_out)
    return jnp.concatenate(outputs, axis=-1)


def temporal_tv_loss(cfg: HashGridConfig, params: dict, rng: jax.Array) -> jnp.ndarray:
    """TV between a random pair of adjacent temporal channels
    (ref: temporal_grid.py:352-377).

    The channel pair is extracted with an ELEMENTWISE broadcast-multiply
    and an axis-1 reduce against a one-hot difference vector — NOT
    ``jnp.take(..., axis=1)`` (a column gather and its scatter transpose
    make XLA layout-assign channel-major copies of the whole table:
    three ~1.6 GB transposed copies at nerfplayer-nerfacto scale) and
    NOT ``table @ sel`` (a dot contracting dim 1 asks layout assignment
    for a row-major {1,0:T(8,128)} operand; with the detached-input
    backward's gathers gone that request flips params, mu AND nu of the
    [5.7M, 66] field to the 128-lane-padded layout — three 2.72 GB
    relayout copies, 1.9x expansion, HBM OOM).  A mul+reduce fusion
    adapts to whatever layout the params already have."""
    _, _, _, index_list = temporal_tables(cfg)
    row_idx = jax.random.randint(rng, (), 0, index_list.shape[0])
    feat_idx = jnp.take(jnp.asarray(index_list), row_idx, axis=0)
    table = params["embeddings"]
    ch = jnp.arange(table.shape[1], dtype=feat_idx.dtype)
    sel = ((ch == feat_idx[0]).astype(table.dtype)
           - (ch == feat_idx[1]).astype(table.dtype))
    return jnp.mean(jnp.abs(jnp.sum(table * sel[None, :], axis=1)))
