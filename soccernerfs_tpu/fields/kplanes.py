"""K-Planes field — functional, TPU-first.

Re-design of the reference's ``fields/kplanes_field.py``.  The torch
nn.Module pair (KPlanesField / KPlanesDensityField) becomes pure
init/apply functions over a param pytree; tcnn MLPs become bf16 matmul
MLPs (ops/mlp.py); F.grid_sample becomes ops/grid_sample.py.

Plane inventory per scale (ref: kplanes_field.py:61-65): k-choose-2 planes
over the input coords — for 4D video (XY, XZ, XT, YZ, YT, ZT), for 3D
static (XY, XZ, YZ).  Time planes init to 1 (multiplicative identity),
space planes U(a, b) (ref: kplanes_field.py:66-72).  Plane layout here is
[res_c2, res_c1, F] (features last).

Known reference defects intentionally fixed (SURVEY §7.5):
  * kplanes_field.py:422 references Frustums without importing it — here
    the proposal density query is a plain positions+times function.
  * KPlanesDensityField.get_density leaves bounded positions in [0, 1]
    (kplanes_field.py:440) where the main field maps to [-1, 1]
    (kplanes_field.py:283-284); we use [-1, 1] in both (intended behavior —
    grid_sample coords are defined on [-1, 1]).
  * ``times`` is optional everywhere (static scenes), fixing the static
    density_fn crash (models/kplanes.py:350-352).
"""
from __future__ import annotations

import itertools
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from soccernerfs_tpu.core.math import (
    components_from_spherical_harmonics,
    scene_contraction,
    trunc_exp,
)
from soccernerfs_tpu.core.scene_box import SceneBox
from soccernerfs_tpu.ops.grid_sample import (
    grid_coords,
    permute_rows,
    plane_sample_fold_group,
    plane_sample_group_bwdsort,
    plane_sample_packed_group,
    plane_sample_unpacked_group,
    quad_pack,
    sample_plane_bilinear,
    sample_plane_bilinear_packed,
)
from soccernerfs_tpu.ops.mlp import init_mlp, mlp_apply


def plane_combinations(in_dim: int):
    """(c1, c2) index pairs defining each plane (ref: kplanes_field.py:61-65)."""
    return list(itertools.combinations(range(in_dim), 2))


def init_plane_grids(
    rng: jax.Array,
    out_dim: int,
    reso: Sequence[int],
    a: float = 0.1,
    b: float = 0.5,
):
    """Initialize one scale's k-choose-2 feature planes.

    Mirrors init_kplanes_field (ref: kplanes_field.py:47-74): time planes
    (those touching coord 3) init to ones, space planes to U(a, b).
    Returns a list of [res_c2, res_c1, out_dim] arrays.
    """
    in_dim = len(reso)
    has_time = in_dim == 4
    grids = []
    for c1, c2 in plane_combinations(in_dim):
        shape = (reso[c2], reso[c1], out_dim)
        if has_time and 3 in (c1, c2):
            grids.append(jnp.ones(shape, jnp.float32))
        else:
            rng, key = jax.random.split(rng)
            grids.append(jax.random.uniform(key, shape, jnp.float32, a, b))
    return grids


def _sampled_planes(pts_dim: int, n_planes: int):
    """(grid_index, (c1, c2)) pairs to sample for ``pts_dim`` coordinates.

    When a 4D (time) model is queried WITHOUT times (static datasets), only
    the spatial planes are sampled — and their grid indices must be looked
    up in the 4D combination order (XY=0, XZ=1, XT=2, YZ=3, ...): naive
    enumeration would silently sample XT in place of YZ.
    """
    grid_dim = 4 if n_planes == 6 else 3
    grid_combs = plane_combinations(grid_dim)
    return [
        (grid_combs.index(pair), pair) for pair in plane_combinations(pts_dim)
    ]


def _use_sorted_sampler(ms_grids, allowed: bool = True) -> bool:
    """The stripe-sorted Pallas-backward path needs 4F == 128, a TPU, and
    position gradients to be unnecessary (PDF bins are detached and the
    camera optimizer is off — callers pass ``cfg.sorted_sampler``)."""
    feat = ms_grids[0][0].shape[-1]
    return (
        allowed
        and feat * 4 == 128
        and jax.default_backend() == "tpu"
    )


def pack_grids_for_render(params: dict) -> dict:
    """Stage every plane table as a bf16 gather copy ONCE per parameter
    snapshot.

    Training restages inside each step, but whole-image rendering calls
    the forward once PER CHUNK — restaging ~GBs of tables per chunk
    dominated eval throughput.  Kernel-eligible big tables are stored
    UNPACKED ([H*W, F] bf16 — the unpacked forward kernel gathers them
    directly, 4x less snapshot memory than a quad-packed copy); small
    tables and narrow proposal planes are quad-packed for the XLA gather
    path.  The copies ride the params dict under ``grids_packed`` and the
    samplers dispatch on their width
    (ref metric: TEST_RAYS_PER_SEC, pipelines/base_pipeline.py:343-352).
    """
    from soccernerfs_tpu.ops.grid_sample import PALLAS_INTERPRET

    def stage(g):
        h, w, f = g.shape
        if (
            4 * f == 128
            and h * w >= 65536
            and w % 32 == 0
            and (PALLAS_INTERPRET or jax.default_backend() == "tpu")
        ):
            return g.reshape(h * w, f).astype(jnp.bfloat16)
        return quad_pack(g).astype(jnp.bfloat16)

    packed = [[stage(g) for g in grids] for grids in params["grids"]]
    return {**params, "grids_packed": packed}


def canonical_sorted_features(
    pts: jnp.ndarray,
    ms_grids,
    concat_features: bool,
    freeze_time_planes: bool = False,
    freeze_space_planes: bool = False,
    ms_packed=None,
):
    """TPU path: per-axis sorted sampling with Pallas scatter backward,
    returning features in a CANONICAL sorted order.

    Pairs sharing the plane's y axis (c2) share one sort: sorting by the
    CONTINUOUS coordinate makes every scale's row-stripe ids nondecreasing
    at once (stripe membership depends only on y), so 6 planes x S scales
    need just 3 sorts (y, z, t).  Rather than permuting every group's
    [M, S*F] partial back to ray order (3 wide permutes fwd+bwd), the two
    smaller groups sort FROM the largest group's order — their sort
    permutations then directly align them to that canonical order — and
    the cross-group Hadamard + downstream MLPs run there; only the final
    narrow outputs pay the permute back to ray order
    (see kplanes_field_forward).

    Returns:
        (features [M, S*F or F] f32 in canonical order, perm, inv) where
        ``x_ray = x_canon[inv]`` and ``x_canon = x_ray[perm]``.
    """
    dim = pts.shape[-1]
    has_time = dim == 4
    m = pts.shape[0]
    iota = jnp.arange(m, dtype=jnp.int32)
    # positions carry no gradient on this path (PDF bins detached, camera
    # optimizer off — _use_sorted_sampler) — cut the chain so the sorts and
    # coordinate math never enter the backward graph
    pts = jax.lax.stop_gradient(pts)

    groups: dict = {}
    for ci, (c1, c2) in _sampled_planes(dim, len(ms_grids[0])):
        if freeze_time_planes and has_time and 3 in (c1, c2):
            continue
        # group kernels need identical table shapes: split non-cubic
        # resolutions by the plane width (reso[c1])
        key = (c2, ms_grids[0][ci].shape[1])
        groups.setdefault(key, []).append((ci, c1))

    n_scales = len(ms_grids)
    f = ms_grids[0][0].shape[-1]
    # one group's order is the canonical frame the pipeline runs in; the
    # largest group (most planes) is the one whose alignment gather would
    # cost the most, so IT gets to stay put
    group_items = list(groups.items())
    canon_gi = max(range(len(group_items)), key=lambda i: len(group_items[i][1]))

    # canonical sort first; every other group's sort CARRIES the canonical
    # position (inv_c) as an extra operand, so the alignment permutation
    # falls out of the sort itself.  Everything per-point rides sort
    # operands, never narrow gathers: a [M, k<=128] row gather pays the
    # full ~3 ms per 262k rows (rows are lane-tile-padded) while an extra
    # sort operand costs ~0.35 ms.
    c2_c = group_items[canon_gi][0][0]
    sorted_c = jax.lax.sort(
        (pts[:, c2_c], *(pts[:, d] for d in range(dim)), iota), num_keys=1
    )
    pts_c = sorted_c[1 : 1 + dim]
    perm_c = sorted_c[-1]
    inv_c = jax.lax.sort((perm_c, iota), num_keys=1)[1]

    group_partials = []  # per group: [M, S*F] bf16 in CANONICAL order
    for gi, ((c2, _w0), members) in enumerate(group_items):
        if gi == canon_gi:
            s_pts = pts_c
            comp = comp_inv = None
        else:
            sorted_g = jax.lax.sort(
                (pts[:, c2], *(pts[:, d] for d in range(dim)), inv_c),
                num_keys=1,
            )
            s_pts = sorted_g[1 : 1 + dim]
            # canonical position of each g-sorted point = the backward
            # permute index; its inverse is the forward alignment map
            comp_inv = sorted_g[-1]
            comp = jax.lax.sort((comp_inv, iota), num_keys=1)[1]

        # Hadamard within the group BEFORE leaving sorted order: only the
        # group's [M, S*F] partial product pays the alignment gather
        partial = [1.0] * n_scales
        for s, grids in enumerate(ms_grids):
            sel_grids, sel_packed, rowids, txs = [], [], [], []
            tyf = None
            w = None
            for ci, c1 in members:
                is_time_plane = has_time and 3 in (c1, c2)
                grid = grids[ci]
                if freeze_space_planes and not is_time_plane:
                    grid = jax.lax.stop_gradient(grid)
                h, w, _f = grid.shape
                xc, txf = grid_coords(s_pts[c1], w)
                yc, tyf = grid_coords(s_pts[c2], h)
                sel_grids.append(grid)
                if ms_packed is not None:
                    sel_packed.append(ms_packed[s][ci])
                rowids.append(yc * w + xc)
                txs.append(txf)
            if ms_packed is not None:
                # render path: tables were staged once per snapshot
                # (pack_grids_for_render); no backward, no per-call pack.
                # Width says which staging: [R, F] unpacked (big tables,
                # kernel gather) vs [R, 4F] quad-packed (XLA gather)
                if sel_packed[0].shape[-1] == grids[members[0][0]].shape[-1]:
                    feats = plane_sample_unpacked_group(
                        sel_packed, rowids, txs, tyf,
                        h=grids[members[0][0]].shape[0], w=w,
                    )
                else:
                    feats = plane_sample_packed_group(
                        sel_packed, rowids, txs, tyf, w=w
                    )
            else:
                # one group kernel per scale: members share shape + stripe
                # axis; the custom-VJP boundary sits at the [H, W, F] grids
                # (bf16 pack forward, folded unpacked-gradient scatter back)
                feats = plane_sample_fold_group(
                    sel_grids, rowids, txs, tyf, use_pallas_bwd=True
                )
            for fo in feats:
                partial[s] = partial[s] * fo
        stacked = jnp.concatenate(partial, axis=-1)          # [M, S*F]
        # bf16 halves the alignment-gather bytes and matches the downstream
        # MLPs' compute precision
        stacked = stacked.astype(jnp.bfloat16)
        if gi != canon_gi:
            stacked = permute_rows(stacked, comp, comp_inv)
        group_partials.append(stacked)

    per_scale = []
    for s in range(n_scales):
        interp_space = group_partials[0][:, s * f : (s + 1) * f].astype(
            jnp.float32
        )
        for gp in group_partials[1:]:
            interp_space = interp_space * gp[:, s * f : (s + 1) * f].astype(
                jnp.float32
            )
        per_scale.append(interp_space)
    if concat_features:
        return jnp.concatenate(per_scale, axis=-1), perm_c, inv_c
    out = per_scale[0]
    for p in per_scale[1:]:
        out = out + p
    return out, perm_c, inv_c


def interpolate_kplanes_sorted(
    pts: jnp.ndarray,
    ms_grids,
    concat_features: bool,
    freeze_time_planes: bool = False,
    freeze_space_planes: bool = False,
) -> jnp.ndarray:
    """Sorted-sampler features in ORIGINAL point order (one wide permute).

    Density-only callers (proposal fields, exporters) use this; the fused
    field pipeline (kplanes_field_forward) keeps the canonical order all
    the way through the MLPs and permutes only [density, rgb] back.
    """
    feats, perm, inv = canonical_sorted_features(
        pts, ms_grids, concat_features,
        freeze_time_planes=freeze_time_planes,
        freeze_space_planes=freeze_space_planes,
    )
    return permute_rows(feats.astype(jnp.bfloat16), inv, perm).astype(
        jnp.float32
    )


def interpolate_kplanes_bwdsorted(
    pts: jnp.ndarray,
    ms_grids,
    concat_features: bool,
    freeze_time_planes: bool = False,
    freeze_space_planes: bool = False,
    ms_packed=None,
) -> jnp.ndarray:
    """TPU path for NARROW features (proposal fields, 4F < 128): forward
    stays the unsorted XLA gather (already at the small-table floor); the
    sort + Pallas scatter run only inside the backward — which the
    host-static proposal schedule prunes on most steps anyway."""
    dim = pts.shape[-1]
    has_time = dim == 4
    pts = jax.lax.stop_gradient(pts)

    groups: dict = {}
    for ci, (c1, c2) in _sampled_planes(dim, len(ms_grids[0])):
        if freeze_time_planes and has_time and 3 in (c1, c2):
            continue
        key = (c2, ms_grids[0][ci].shape[1])
        groups.setdefault(key, []).append((ci, c1))

    n_scales = len(ms_grids)
    f = ms_grids[0][0].shape[-1]
    per_scale = [1.0] * n_scales
    for (c2, _w0), members in groups.items():
        for s, grids in enumerate(ms_grids):
            packeds, coords = [], []
            h = w = None
            for ci, c1 in members:
                is_time_plane = has_time and 3 in (c1, c2)
                grid = grids[ci]
                if freeze_space_planes and not is_time_plane:
                    grid = jax.lax.stop_gradient(grid)
                h, w, _f = grid.shape
                packeds.append(
                    quad_pack(grid) if ms_packed is None else ms_packed[s][ci]
                )
                coords.append(pts[:, c1])
            feats = plane_sample_group_bwdsort(
                packeds, coords, pts[:, c2],
                h=h, w=w, use_pallas_bwd=True,
            )
            for fo in feats:
                per_scale[s] = per_scale[s] * fo
    if concat_features:
        return jnp.concatenate(per_scale, axis=-1)
    out = per_scale[0]
    for p in per_scale[1:]:
        out = out + p
    return out


def interpolate_kplanes(
    pts: jnp.ndarray,
    ms_grids,
    concat_features: bool,
    freeze_time_planes: bool = False,
    freeze_space_planes: bool = False,
    packed: bool = True,
    sorted_ok: bool = True,
    ms_packed=None,
) -> jnp.ndarray:
    """Query multiscale planes: per-plane bilinear sample, Hadamard product
    over planes, concat/sum over scales (ref: kplanes_field.py:77-126).

    On TPU with 32-wide features this routes to the stripe-sorted sampler
    (Pallas scatter backward); otherwise the pure-XLA gather path.

    Args:
        pts: [M, 3] or [M, 4] normalized coordinates in [-1, 1].
        ms_grids: list (scales) of lists (planes) of [H, W, F] arrays.
        sorted_ok: position gradients are NOT needed (no camera optimizer)
            so the sorted paths — which stop-gradient positions — are sound.
    Returns:
        [M, F * num_scales] if concat else [M, F].
    """
    if packed and _use_sorted_sampler(ms_grids, sorted_ok):
        return interpolate_kplanes_sorted(
            pts, ms_grids, concat_features,
            freeze_time_planes=freeze_time_planes,
            freeze_space_planes=freeze_space_planes,
        )
    feat = ms_grids[0][0].shape[-1]
    if (
        packed
        and sorted_ok
        and feat * 4 == 32
        and jax.default_backend() == "tpu"
        and all(g.shape[1] % 4 == 0 for g in ms_grids[0])
    ):
        return interpolate_kplanes_bwdsorted(
            pts, ms_grids, concat_features,
            freeze_time_planes=freeze_time_planes,
            freeze_space_planes=freeze_space_planes,
            ms_packed=ms_packed,
        )
    has_time = pts.shape[-1] == 4
    sampler = sample_plane_bilinear_packed if packed else sample_plane_bilinear
    per_scale = []
    for grids in ms_grids:
        interp_space = 1.0
        for ci, (c1, c2) in _sampled_planes(pts.shape[-1], len(grids)):
            is_time_plane = has_time and 3 in (c1, c2)
            if freeze_time_planes and is_time_plane:
                continue
            grid = grids[ci]
            if freeze_space_planes and not is_time_plane:
                grid = jax.lax.stop_gradient(grid)
            coords = pts[..., (c1, c2)]  # (x indexes W=res_c1, y indexes H=res_c2)
            interp_space = interp_space * sampler(grid, coords)
        per_scale.append(interp_space)
    if concat_features:
        return jnp.concatenate(per_scale, axis=-1)
    out = per_scale[0]
    for p in per_scale[1:]:
        out = out + p
    return out


@dataclass(frozen=True)
class KPlanesFieldConfig:
    """Static config for the main K-Planes field
    (ref: kplanes_field.py:129-167 constructor args)."""

    spacetime_resolution: Tuple[int, ...] = (256, 256, 256, 150)
    feat_dim: int = 16
    multiscale_res: Tuple[int, ...] = (1,)
    concat_features_across_scales: bool = False
    linear_decoder: bool = True
    linear_decoder_layers: int = 1
    use_appearance_embedding: bool = False
    appearance_dim: int = 27
    num_images: int = 0
    disable_viewing_dependent: bool = False
    sigma_net_layers: int = 1
    sigma_net_hidden_dim: int = 64
    rgb_net_layers: int = 2
    rgb_net_hidden_dim: int = 64
    bounded: bool = True
    freeze_time_planes: bool = False
    freeze_space_planes: bool = False
    geo_feat_dim: int = 15
    sh_degree: int = 4
    # The sorted sampler detaches sample POSITIONS — sound only when no
    # position gradients are needed.  The Trainer sets this False when the
    # camera optimizer is on (pose grads flow through plane coordinates).
    sorted_sampler: bool = True

    @property
    def has_time_planes(self) -> bool:
        return len(self.spacetime_resolution) == 4

    @property
    def feature_dim(self) -> int:
        if self.concat_features_across_scales:
            return self.feat_dim * len(self.multiscale_res)
        return self.feat_dim

    @property
    def appearance_embedding_dim(self) -> int:
        return self.appearance_dim if self.use_appearance_embedding else 0


def init_kplanes_field(rng: jax.Array, cfg: KPlanesFieldConfig) -> dict:
    """Build the param pytree for the main field.

    Layout mirrors the reference module tree (ref: kplanes_field.py:182-273):
      grids           list[scale][plane] of [H, W, F]
      sigma_net       MLP feature_dim -> geo_feat_dim+1 (or -> 1 linear)
      color_net       MLP -> 3 (non-linear decoder path)
      color_basis     MLP dirs(+app) -> 3*feature_dim (linear decoder path)
      appearance_embedding  [num_images, appearance_dim]
    """
    params: dict = {}
    grid_rng, mlp_rng = jax.random.split(rng)
    keys = jax.random.split(mlp_rng, 4)

    grids = []
    for res_mult in cfg.multiscale_res:
        resolution = [r * res_mult for r in cfg.spacetime_resolution[:3]]
        if cfg.has_time_planes:
            resolution.append(cfg.spacetime_resolution[3])
        grid_rng, key_g = jax.random.split(grid_rng)
        grids.append(init_plane_grids(key_g, cfg.feat_dim, resolution))
    params["grids"] = grids

    if cfg.linear_decoder:
        params["color_basis"] = init_mlp(
            keys[0],
            3 + cfg.appearance_embedding_dim,
            128,
            cfg.linear_decoder_layers,
            3 * cfg.feature_dim,
        )
        params["sigma_net"] = init_mlp(keys[1], cfg.feature_dim, 128, 0, 1)
    else:
        params["sigma_net"] = init_mlp(
            keys[1],
            cfg.feature_dim,
            cfg.sigma_net_hidden_dim,
            cfg.sigma_net_layers,
            cfg.geo_feat_dim + 1,
        )
        in_dim_color = cfg.geo_feat_dim + cfg.appearance_embedding_dim
        if not cfg.disable_viewing_dependent:
            in_dim_color += cfg.sh_degree**2
        params["color_net"] = init_mlp(
            keys[2], in_dim_color, cfg.rgb_net_hidden_dim, cfg.rgb_net_layers, 3
        )

    if cfg.use_appearance_embedding:
        params["appearance_embedding"] = jax.random.normal(
            keys[3], (cfg.num_images, cfg.appearance_dim), jnp.float32
        )
    return params


def normalize_positions(
    positions: jnp.ndarray, aabb: jnp.ndarray, bounded: bool
) -> jnp.ndarray:
    """World positions -> [-1, 1] plane coordinates.

    bounded: aabb-normalize then affine to [-1, 1]
    (ref: kplanes_field.py:282-284); unbounded: MipNeRF-360 L_inf
    contraction to [-2, 2] then halve (ref: kplanes_field.py:279-280).
    """
    if bounded:
        positions = SceneBox.get_normalized_positions(positions, aabb)
        return positions * 2.0 - 1.0
    return scene_contraction(positions, order=jnp.inf) / 2.0


def _spacetime_coords(cfg_has_time, positions, times):
    if cfg_has_time and times is not None:
        t = times * 2.0 - 1.0  # [0,1] -> [-1,1] (ref: kplanes_field.py:288-291)
        return jnp.concatenate([positions, t[..., None]], axis=-1)
    return positions


def kplanes_density(
    cfg: KPlanesFieldConfig,
    params: dict,
    aabb: jnp.ndarray,
    positions: jnp.ndarray,
    times: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Density + geometric features at world positions.

    Mirrors KPlanesField.get_density (ref: kplanes_field.py:275-312).

    Args:
        positions: [M, 3] world positions; times: [M] in [0, 1] or None.
    Returns:
        (density [M], features [M, geo_feat_dim or feature_dim]).
    """
    pts = normalize_positions(positions, aabb, cfg.bounded)
    pts = _spacetime_coords(cfg.has_time_planes, pts, times)

    features = interpolate_kplanes(
        pts,
        params["grids"],
        concat_features=cfg.concat_features_across_scales,
        freeze_time_planes=cfg.freeze_time_planes,
        freeze_space_planes=cfg.freeze_space_planes,
        sorted_ok=cfg.sorted_sampler,
    )
    if cfg.linear_decoder:
        density_before = mlp_apply(
            params["sigma_net"], features, activation="none", output_activation="none"
        )[..., 0]
    else:
        out = mlp_apply(
            params["sigma_net"], features, activation="relu", output_activation="none"
        )
        features, density_before = out[..., : cfg.geo_feat_dim], out[..., -1]
    return trunc_exp(density_before), features


def kplanes_rgb(
    cfg: KPlanesFieldConfig,
    params: dict,
    features: jnp.ndarray,
    directions: jnp.ndarray,
    camera_indices: Optional[jnp.ndarray] = None,
    train: bool = True,
) -> jnp.ndarray:
    """Color from geometric features + view directions.

    Mirrors KPlanesField.get_outputs (ref: kplanes_field.py:314-358):
    non-linear path concatenates SH-encoded dirs (unless view-independence)
    and optional appearance embeddings into the color MLP; linear path
    predicts a per-point color basis from raw dirs and dots it with the
    features.  At eval, appearance embeddings use their mean
    (ref: kplanes_field.py:329-335).

    Args:
        features: [M, D]; directions: [M, 3] unit; camera_indices: [M] int.
    Returns:
        rgb [M, 3] in [0, 1].
    """
    if cfg.linear_decoder or cfg.disable_viewing_dependent:
        color_features = [features]
    else:
        encoded_dirs = components_from_spherical_harmonics(cfg.sh_degree, directions)
        color_features = [encoded_dirs, features]

    dirs_input = directions
    if cfg.use_appearance_embedding:
        emb = params["appearance_embedding"]
        if train:
            assert camera_indices is not None
            embedded = jnp.take(emb, camera_indices, axis=0)
        else:
            embedded = jnp.broadcast_to(
                jnp.mean(emb, axis=0), (directions.shape[0], emb.shape[-1])
            )
        if cfg.linear_decoder:
            dirs_input = jnp.concatenate([dirs_input, embedded], axis=-1)
        else:
            color_features.append(embedded)

    color_features = jnp.concatenate(color_features, axis=-1)

    if cfg.linear_decoder:
        basis = mlp_apply(
            params["color_basis"], dirs_input, activation="relu", output_activation="none"
        )
        basis = basis.reshape(*color_features.shape[:-1], 3, cfg.feature_dim)
        rgb = jnp.sum(color_features[..., None, :] * basis, axis=-1)
        return jax.nn.sigmoid(rgb)
    return mlp_apply(
        params["color_net"], color_features, activation="relu", output_activation="sigmoid"
    )


def kplanes_field_forward(
    cfg: KPlanesFieldConfig,
    params: dict,
    aabb: jnp.ndarray,
    positions: jnp.ndarray,
    directions: jnp.ndarray,
    times: Optional[jnp.ndarray] = None,
    camera_indices: Optional[jnp.ndarray] = None,
    train: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused density+rgb field evaluation (= kplanes_density + kplanes_rgb).

    On the TPU sorted-sampler path the whole pipeline — cross-group
    Hadamard, sigma net, color net — runs in the CANONICAL sorted order
    (canonical_sorted_features) and only the final pre-activation
    [density, rgb] block ([M, 4]: one lane-tile) is permuted back to ray
    order, instead of three [M, S*F] group partials.  Values equal the
    separate-call path's up to bf16 rounding: permutation commutes with
    row-wise ops, but this path skips the bf16 feature-permute round that
    interpolate_kplanes_sorted applies (tests compare at bf16 atol).

    Args:
        positions: [M, 3] world; directions: [M, 3] unit (per sample);
        times: [M] in [0, 1] or None; camera_indices: [M] int or None.
    Returns:
        (density [M], rgb [M, 3]).
    """
    if not _use_sorted_sampler(params["grids"], cfg.sorted_sampler):
        density, features = kplanes_density(cfg, params, aabb, positions, times)
        return density, kplanes_rgb(
            cfg, params, features, directions, camera_indices, train=train
        )

    pts = normalize_positions(positions, aabb, cfg.bounded)
    pts = _spacetime_coords(cfg.has_time_planes, pts, times)
    features, perm, inv = canonical_sorted_features(
        pts,
        params["grids"],
        concat_features=cfg.concat_features_across_scales,
        freeze_time_planes=cfg.freeze_time_planes,
        freeze_space_planes=cfg.freeze_space_planes,
        ms_packed=params.get("grids_packed") if not train else None,
    )

    if cfg.linear_decoder:
        density_before = mlp_apply(
            params["sigma_net"], features, activation="none",
            output_activation="none",
        )[..., 0]
        color_in = features
    else:
        out = mlp_apply(
            params["sigma_net"], features, activation="relu",
            output_activation="none",
        )
        color_in, density_before = out[..., : cfg.geo_feat_dim], out[..., -1]

    # per-sample side inputs follow the features into canonical order; the
    # sorted path guarantees they carry no gradient (camera optimizer off)
    need_dirs = cfg.linear_decoder or not cfg.disable_viewing_dependent
    dirs_c = (
        permute_rows(directions, perm, inv) if need_dirs else directions
    )
    cam_c = (
        jnp.take(camera_indices, perm, axis=0, mode="clip")
        if (camera_indices is not None and cfg.use_appearance_embedding)
        else None
    )

    if cfg.linear_decoder or cfg.disable_viewing_dependent:
        color_features = [color_in]
    else:
        color_features = [
            components_from_spherical_harmonics(cfg.sh_degree, dirs_c),
            color_in,
        ]
    dirs_input = dirs_c
    if cfg.use_appearance_embedding:
        emb = params["appearance_embedding"]
        if train:
            assert cam_c is not None
            embedded = jnp.take(emb, cam_c, axis=0)
        else:
            embedded = jnp.broadcast_to(
                jnp.mean(emb, axis=0), (positions.shape[0], emb.shape[-1])
            )
        if cfg.linear_decoder:
            dirs_input = jnp.concatenate([dirs_input, embedded], axis=-1)
        else:
            color_features.append(embedded)
    color_features = jnp.concatenate(color_features, axis=-1)

    if cfg.linear_decoder:
        basis = mlp_apply(
            params["color_basis"], dirs_input, activation="relu",
            output_activation="none",
        )
        basis = basis.reshape(*color_features.shape[:-1], 3, cfg.feature_dim)
        rgb_pre = jnp.sum(color_features[..., None, :] * basis, axis=-1)
    else:
        rgb_pre = mlp_apply(
            params["color_net"], color_features, activation="relu",
            output_activation="none",
        )

    out_c = jnp.concatenate([density_before[:, None], rgb_pre], axis=-1)
    out_ray = permute_rows(out_c, inv, perm)                 # [M, 4]
    return trunc_exp(out_ray[:, 0]), jax.nn.sigmoid(out_ray[:, 1:])


# ---------------------------------------------------------------------------
# Proposal density field — ref: kplanes_field.py:373-463
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class KPlanesDensityFieldConfig:
    """Static config for one proposal density field
    (ref: kplanes_field.py:376-407)."""

    resolution: Tuple[int, ...] = (128, 128, 128)
    feature_dim: int = 8
    linear_decoder: bool = True
    bounded: bool = True
    freeze_time_planes: bool = False
    freeze_space_planes: bool = False
    # see KPlanesFieldConfig.sorted_sampler
    sorted_sampler: bool = True

    @property
    def has_time_planes(self) -> bool:
        return len(self.resolution) == 4


def init_kplanes_density_field(
    rng: jax.Array, cfg: KPlanesDensityFieldConfig
) -> dict:
    """Single-scale planes (init U(0.1, 0.15), ref: kplanes_field.py:396)
    plus a 64-wide 1-hidden-layer sigma net."""
    k1, k2 = jax.random.split(rng)
    return {
        "grids": [init_plane_grids(k1, cfg.feature_dim, cfg.resolution, a=0.1, b=0.15)],
        "sigma_net": init_mlp(k2, cfg.feature_dim, 64, 1, 1),
    }


def kplanes_density_field_density(
    cfg: KPlanesDensityFieldConfig,
    params: dict,
    aabb: jnp.ndarray,
    positions: jnp.ndarray,
    times: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Density-only query for proposal sampling
    (ref: kplanes_field.py:410-460; defects fixed per module docstring).

    Args:
        positions: [M, 3]; times: [M] or None.
    Returns:
        density [M].
    """
    pts = normalize_positions(positions, aabb, cfg.bounded)
    pts = _spacetime_coords(cfg.has_time_planes, pts, times)
    features = interpolate_kplanes(
        pts,
        params["grids"],
        concat_features=False,
        freeze_time_planes=cfg.freeze_time_planes,
        freeze_space_planes=cfg.freeze_space_planes,
        sorted_ok=cfg.sorted_sampler,
        ms_packed=params.get("grids_packed"),
    )
    activation = "none" if cfg.linear_decoder else "relu"
    density_before = mlp_apply(
        params["sigma_net"], features, activation=activation, output_activation="none"
    )[..., 0]
    return trunc_exp(density_before)
