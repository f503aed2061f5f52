"""Stage ablations of the TEMPORAL hash-grid encode on TPU (nerfplayer
family roofline).  profile_method.py attributes ~63% of nerfplayer's
1,982 ms step to the temporal custom-VJP call line; this pins WHICH
stage (index prep / corner gathers / window pick / u build / gw stream /
sort / perm gather / scatter kernel) carries the time, at the step's two
dominant scales:

  prop1:  B = 4096 rays x 256 samples = 1,048,576; 5 levels, rows 2^17,
          c_row = 2 + 32 = 34
  main:   B = 4096 x 48 = 196,608; 16 levels, rows 2^17, c_row = 66
          (newness + decomposition: x2)

Uses the marginal-cost harness (microbench_r2.bench) — axon tunnel adds
~30 ms/call and closures become baked constants.

Run (TPU): python scripts/diag_temporal.py [prop1|main|encode|all]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from scripts.microbench_r2 import bench  # noqa: E402

from soccernerfs_tpu.ops import hash_grid as hg  # noqa: E402
from soccernerfs_tpu.ops.pallas import plane_kernels as pk  # noqa: E402

rng = np.random.default_rng(0)


def make_level(B, rows, c_row, res=64, temporal_dim=32, level_dim=2):
    """One hashed temporal level's inputs: table, idxs, ws, window picks."""
    table = jnp.asarray(
        rng.standard_normal((rows, c_row)).astype(np.float32))
    pos0 = rng.integers(0, res - 1, (B, 3)).astype(np.int32)
    frac = rng.uniform(0, 1, (B, 3)).astype(np.float32)
    corner_offsets = np.stack(
        np.meshgrid(*([np.arange(2)] * 3), indexing="ij"), axis=-1
    ).reshape(-1, 3)
    primes = np.array([1958374283, 2654435761, 805459861], np.uint32)
    idxs = []
    ws = []
    for c in range(8):
        corner = (pos0 + corner_offsets[c]).astype(np.uint32)
        h = (corner * primes[None, :]).astype(np.uint32)
        idx = (h[:, 0] ^ h[:, 1] ^ h[:, 2]) % rows
        idxs.append(idx.astype(np.int32))
        w = np.prod(
            np.where(corner_offsets[c][None, :] == 1, frac, 1 - frac),
            axis=-1,
        )
        ws.append(w.astype(np.float32))
    idxs = jnp.asarray(np.stack(idxs))
    ws = jnp.asarray(np.stack(ws))
    # temporal window: level_dim output channels, each picks 2 adjacent
    # columns of the c_row row
    ch_a = jnp.asarray(
        rng.integers(0, c_row - 1, (B, level_dim)).astype(np.int32))
    ch_b = ch_a + 1
    w_a = jnp.asarray(rng.uniform(0, 1, (B, level_dim)).astype(np.float32))
    w_b = 1.0 - w_a
    g = jnp.asarray(rng.standard_normal((B, level_dim)).astype(np.float32))
    return dict(table=table, idxs=idxs, ws=ws, ch_a=ch_a, w_a=w_a,
                ch_b=ch_b, w_b=w_b, g=g)


def stage_ablation(name, B, rows, c_row, n1=3, n2=9):
    lv = make_level(B, rows, c_row)
    c_pad = hg._temporal_row_pad(c_row)
    K = 8
    print(f"== {name}: B={B} rows={rows} c_row={c_row} c_pad={c_pad} ==")

    def st_gather(c, a):
        t16 = (a["table"] + c).astype(jnp.bfloat16)
        acc = 0.0
        for k in range(K):
            acc = acc + a["ws"][k][:, None] * jnp.take(
                t16, a["idxs"][k], axis=0, mode="clip")
        return c + jnp.sum(acc.astype(jnp.float32)) * 1e-20

    bench(f"{name} fwd corner gathers+acc (K=8)", st_gather,
          jnp.float32(0.0), lv, n1=n1, n2=n2)

    def st_pick(c, a):
        acc = jnp.broadcast_to(
            (a["w_a"][:, :1] + c), (B, c_row)).astype(jnp.float32)
        out = hg._window_pick(acc, a["ch_a"], a["w_a"], a["ch_b"], a["w_b"])
        return c + jnp.sum(out) * 1e-20

    bench(f"{name} window pick", st_pick, jnp.float32(0.0), lv,
          n1=n1, n2=n2)

    def st_u(c, a):
        g = a["g"] + c
        ch_i = jnp.arange(c_row, dtype=jnp.int32)[None, :]
        u = 0.0
        for l in range(g.shape[-1]):
            u = u + g[:, l:l + 1] * (
                a["w_a"][:, l:l + 1] * (a["ch_a"][:, l:l + 1] == ch_i)
                + a["w_b"][:, l:l + 1] * (a["ch_b"][:, l:l + 1] == ch_i)
            )
        return c + jnp.sum(u) * 1e-20

    bench(f"{name} u build", st_u, jnp.float32(0.0), lv, n1=n1, n2=n2)

    def st_gw(c, a):
        u = jnp.broadcast_to(a["g"][:, :1] + c, (B, c_row))
        tot = jnp.float32(0.0)
        for k in range(K):
            gw_k = (a["ws"][k][:, None] * u).astype(jnp.bfloat16)
            if c_pad > c_row:
                gw_k = jnp.pad(gw_k, ((0, 0), (0, c_pad - c_row)))
            tot = tot + jnp.sum(gw_k.astype(jnp.float32)) * 1e-20
        return c + tot

    bench(f"{name} gw stream+pad (K=8)", st_gw, jnp.float32(0.0), lv,
          n1=n1, n2=n2)

    def st_sort(c, a):
        iota = jnp.arange(B, dtype=jnp.int32)
        tot = jnp.float32(0.0)
        for k in range(K):
            idx_s, perm = jax.lax.sort(
                (a["idxs"][k] + c.astype(jnp.int32) * 0, iota), num_keys=1)
            tot = tot + idx_s[0].astype(jnp.float32) + perm[-1].astype(
                jnp.float32)
        return c + tot * 1e-20

    bench(f"{name} per-corner sorts (K=8)", st_sort, jnp.float32(0.0),
          lv, n1=n1, n2=n2)

    def st_permgather(c, a):
        u = jnp.broadcast_to(a["g"][:, :1] + c, (B, c_row))
        iota = jnp.arange(B, dtype=jnp.int32)
        tot = jnp.float32(0.0)
        for k in range(K):
            gw_k = (a["ws"][k][:, None] * u).astype(jnp.bfloat16)
            if c_pad > c_row:
                gw_k = jnp.pad(gw_k, ((0, 0), (0, c_pad - c_row)))
            idx_s, perm = jax.lax.sort(
                (a["idxs"][k], iota), num_keys=1)
            gw_s = jnp.take(gw_k, perm, axis=0, mode="clip")
            tot = tot + jnp.sum(gw_s.astype(jnp.float32)) * 1e-20
        return c + tot

    bench(f"{name} sorts+perm gathers (K=8)", st_permgather,
          jnp.float32(0.0), lv, n1=n1, n2=n2)

    def st_full_bwd(c, a):
        u = jnp.broadcast_to(a["g"][:, :1] + c, (B, c_row))
        iota = jnp.arange(B, dtype=jnp.int32)
        d_table = jnp.zeros((rows, c_row), jnp.float32)
        for k in range(K):
            gw_k = (a["ws"][k][:, None] * u).astype(jnp.bfloat16)
            if c_pad > c_row:
                gw_k = jnp.pad(gw_k, ((0, 0), (0, c_pad - c_row)))
            idx_s, perm = jax.lax.sort((a["idxs"][k], iota), num_keys=1)
            gw_s = jnp.take(gw_k, perm, axis=0, mode="clip")
            d_table = d_table + pk.sorted_scatter_add(
                gw_s, idx_s, r=rows, c=c_pad)[:, :c_row]
        return c + jnp.sum(d_table) * 1e-20

    bench(f"{name} FULL bwd per-corner (sort+perm+scatter+acc)",
          st_full_bwd, jnp.float32(0.0), lv, n1=n1, n2=n2)

    def st_merged_bwd(c, a):
        u = jnp.broadcast_to(a["g"][:, :1] + c, (B, c_row))
        gw = (a["ws"][:, :, None] * u[None]).astype(jnp.bfloat16)
        gw = gw.reshape(K * B, c_row)
        if c_pad > c_row:
            gw = jnp.pad(gw, ((0, 0), (0, c_pad - c_row)))
        iota = jnp.arange(K * B, dtype=jnp.int32)
        idx_s, perm = jax.lax.sort(
            (a["idxs"].reshape(K * B), iota), num_keys=1)
        gw_s = jnp.take(gw, perm, axis=0, mode="clip")
        d_table = pk.sorted_scatter_add(
            gw_s, idx_s, r=rows, c=c_pad)[:, :c_row]
        return c + jnp.sum(d_table) * 1e-20

    bench(f"{name} FULL bwd MERGED (1 sort over K*B)", st_merged_bwd,
          jnp.float32(0.0), lv, n1=n1, n2=n2)


def compact_ablation(name, B, rows, c_row, L=2, n1=3, n2=9):
    """Candidate bwd restructures: the dense gw perm gather reads a
    [B, c_pad] bf16 source (256 MB at prop1) at the LARGE-source gather
    rate (~14 ns/row); the gw row is a ws-scaled sum of 2L one-hot
    channel picks, so a compact [B, 4L] payload (16 MB source) can ride
    the permute instead and expand AFTER the sort."""
    lv = make_level(B, rows, c_row, level_dim=L)
    c_pad = hg._temporal_row_pad(c_row)
    K = 8
    print(f"== {name} compact: B={B} rows={rows} c_row={c_row} "
          f"c_pad={c_pad} 2L={2 * L} ==")
    # pay: [B, 4L] f32 = (2L vals, 2L channel ids as f32)
    ch_i = jnp.arange(c_row, dtype=jnp.int32)[None, :]

    def build_pay(a, c):
        g = a["g"] + c
        vals = jnp.concatenate(
            [g * a["w_a"], g * a["w_b"]], axis=-1)          # [B, 2L]
        chs = jnp.concatenate(
            [a["ch_a"], a["ch_b"]], axis=-1).astype(jnp.float32)
        return jnp.concatenate([vals, chs], axis=-1)        # [B, 4L]

    def expand(pay_s, ws_s):
        vals = pay_s[:, :2 * L]
        chs = pay_s[:, 2 * L:].astype(jnp.int32)
        gw = 0.0
        for j in range(2 * L):
            gw = gw + vals[:, j:j + 1] * (chs[:, j:j + 1] == ch_i)
        gw = (ws_s[:, None] * gw).astype(jnp.bfloat16)
        if c_pad > c_row:
            gw = jnp.pad(gw, ((0, 0), (0, c_pad - c_row)))
        return gw

    def st_compact(c, a):
        pay = build_pay(a, c)
        iota = jnp.arange(B, dtype=jnp.int32)
        d_table = jnp.zeros((rows, c_row), jnp.float32)
        for k in range(K):
            idx_s, ws_s, perm = jax.lax.sort(
                (a["idxs"][k], a["ws"][k], iota), num_keys=1)
            pay_s = jnp.take(pay, perm, axis=0, mode="clip")
            gw_s = expand(pay_s, ws_s)
            d_table = d_table + pk.sorted_scatter_add(
                gw_s, idx_s, r=rows, c=c_pad)[:, :c_row]
        return c + jnp.sum(d_table) * 1e-20

    bench(f"{name} bwd COMPACT perm-gather+expand", st_compact,
          jnp.float32(0.0), lv, n1=n1, n2=n2)

    def st_operands(c, a):
        pay = build_pay(a, c)
        d_table = jnp.zeros((rows, c_row), jnp.float32)
        for k in range(K):
            srt = jax.lax.sort(
                (a["idxs"][k], a["ws"][k],
                 *(pay[:, j] for j in range(4 * L))), num_keys=1)
            idx_s, ws_s = srt[0], srt[1]
            pay_s = jnp.stack(srt[2:], axis=-1)
            gw_s = expand(pay_s, ws_s)
            d_table = d_table + pk.sorted_scatter_add(
                gw_s, idx_s, r=rows, c=c_pad)[:, :c_row]
        return c + jnp.sum(d_table) * 1e-20

    bench(f"{name} bwd COMPACT payload-on-sort-operands", st_operands,
          jnp.float32(0.0), lv, n1=n1, n2=n2)

    def st_compact_merged(c, a):
        pay = build_pay(a, c)
        iota = jnp.arange(K * B, dtype=jnp.int32)
        idx_s, ws_s, perm = jax.lax.sort(
            (a["idxs"].reshape(K * B), a["ws"].reshape(K * B), iota),
            num_keys=1)
        pay_s = jnp.take(pay, perm % B, axis=0, mode="clip")
        gw_s = expand(pay_s, ws_s)
        d_table = pk.sorted_scatter_add(
            gw_s, idx_s, r=rows, c=c_pad)[:, :c_row]
        return c + jnp.sum(d_table) * 1e-20

    bench(f"{name} bwd COMPACT MERGED (1 sort, mod-B gather)",
          st_compact_merged, jnp.float32(0.0), lv, n1=n1, n2=n2)


def chankey_ablation(name, B, rows, c_row, L=2, paired=True, n1=3, n2=9):
    """CHANNEL-KEYED backward candidate: a temporal update touches at
    most 2L of the c_row channels (the window picks), yet the current
    backward scatters DENSE c_pad-lane rows (34 -> 128, 66 -> 128: most
    lanes are zero).  Making the channel part of the scatter key
    (key = idx * c_row + ch) turns the stream into [2L*B, p] rows of a
    virtual [rows * c_row, p] table (p = 2 z-paired corners or 1), which
    the kernel row-packs 128/p rows per lane-line — the dense one-hot
    expansion, the lane padding AND the 128-lane scatter all disappear.
    Needs rows * c_row < 2^24 (f32 meta): true for the whole nerfplayer
    family (log2_hashmap_size 17/18, c_row 34/66)."""
    lv = make_level(B, rows, c_row, level_dim=L)
    c_pad = hg._temporal_row_pad(c_row)
    K = 8
    Keff = K // 2 if paired else K
    p = 2 if paired else 1
    r_virt = rows * c_row
    print(f"== {name} chankey: B={B} rows={rows} c_row={c_row} "
          f"c_pad={c_pad} 2L={2 * L} paired={paired} r_virt={r_virt} ==")

    def build_valch(a, c):
        g = a["g"] + c
        vals = jnp.concatenate([g * a["w_a"], g * a["w_b"]], -1)  # [B,2L]
        chs = jnp.concatenate([a["ch_a"], a["ch_b"]], -1)         # [B,2L]
        return vals, chs

    def fold(virt):
        if paired:
            return (virt[:, 0].reshape(rows, c_row)
                    + jnp.roll(virt[:, 1].reshape(rows, c_row), 1, 0))
        return virt[:, 0].reshape(rows, c_row)

    def st_chankey(c, a):
        vals, chs = build_valch(a, c)
        d_virt = jnp.zeros((r_virt, p), jnp.float32)
        for k in range(Keff):
            kk = 2 * k if paired else k
            keys = (a["idxs"][kk][:, None] * c_row + chs).T.reshape(
                2 * L * B)
            pay0 = (a["ws"][kk][:, None] * vals).T.reshape(2 * L * B)
            if paired:
                pay1 = (a["ws"][kk + 1][:, None] * vals).T.reshape(
                    2 * L * B)
                keys_s, p0, p1 = jax.lax.sort((keys, pay0, pay1),
                                              num_keys=1)
                pay_s = jnp.stack([p0, p1], -1)
            else:
                keys_s, p0 = jax.lax.sort((keys, pay0), num_keys=1)
                pay_s = p0[:, None]
            d_virt = d_virt + pk.sorted_scatter_add(
                pay_s, keys_s, r=r_virt, c=p)
        return c + jnp.sum(fold(d_virt)) * 1e-20

    bench(f"{name} bwd CHANKEY per-corner{'-pair' if paired else ''} "
          f"({Keff} sorts of {2 * L}B)", st_chankey, jnp.float32(0.0),
          lv, n1=n1, n2=n2)

    def st_chankey_merged(c, a):
        vals, chs = build_valch(a, c)
        keys_all, p0_all, p1_all = [], [], []
        for k in range(Keff):
            kk = 2 * k if paired else k
            keys_all.append(
                (a["idxs"][kk][:, None] * c_row + chs).T.reshape(
                    2 * L * B))
            p0_all.append(
                (a["ws"][kk][:, None] * vals).T.reshape(2 * L * B))
            if paired:
                p1_all.append(
                    (a["ws"][kk + 1][:, None] * vals).T.reshape(
                        2 * L * B))
        keys = jnp.concatenate(keys_all)
        ops = (keys, jnp.concatenate(p0_all))
        if paired:
            ops = ops + (jnp.concatenate(p1_all),)
        srt = jax.lax.sort(ops, num_keys=1)
        pay_s = (jnp.stack([srt[1], srt[2]], -1) if paired
                 else srt[1][:, None])
        d_virt = pk.sorted_scatter_add(pay_s, srt[0], r=r_virt, c=p)
        return c + jnp.sum(fold(d_virt)) * 1e-20

    bench(f"{name} bwd CHANKEY MERGED (1 sort of {Keff * 2 * L}B)",
          st_chankey_merged, jnp.float32(0.0), lv, n1=n1, n2=n2)

    def st_chankey_perj(c, a):
        vals, chs = build_valch(a, c)
        d_virt = jnp.zeros((r_virt, p), jnp.float32)
        for k in range(Keff):
            kk = 2 * k if paired else k
            for j in range(2 * L):
                keys = a["idxs"][kk] * c_row + chs[:, j]
                pay0 = a["ws"][kk] * vals[:, j]
                if paired:
                    keys_s, p0, p1 = jax.lax.sort(
                        (keys, pay0, a["ws"][kk + 1] * vals[:, j]),
                        num_keys=1)
                    pay_s = jnp.stack([p0, p1], -1)
                else:
                    keys_s, p0 = jax.lax.sort((keys, pay0), num_keys=1)
                    pay_s = p0[:, None]
                d_virt = d_virt + pk.sorted_scatter_add(
                    pay_s, keys_s, r=r_virt, c=p)
        return c + jnp.sum(fold(d_virt)) * 1e-20

    bench(f"{name} bwd CHANKEY per-j ({Keff * 2 * L} sorts of B)",
          st_chankey_perj, jnp.float32(0.0), lv, n1=n1, n2=n2)


def trowkey_ablation(name, B, rows, c_row, T, L=2, paired=True,
                     n1=3, n2=9):
    """TEMPORAL-ROW-KEYED backward candidate: all 2L channel picks of a
    sample derive from ONE temporal-table row t_row in [0, T-1), and the
    pick CHANNELS are a static function of t_row — only the interp
    weights vary per sample.  So key = idx * (T-1) + t_row (ONE key
    stream per corner, all corners merged into ONE sort), payload =
    the 2L pre-scaled values (x2 z-corners when paired), scatter into a
    virtual [rows*(T-1), 2L*p] table, and fold with a STATIC
    [(T-1)*2L*p, c_row] one-hot matmul (MXU, ~2G MACs).  vs chankey:
    1 sort of Keff*B keys instead of Keff sorts of 2L*B keys; vs the
    dense path: the scatter consumes 2L*p lanes instead of c_pad=128.
    Needs rows * (T-1) < 2^24: true for ALL family grids incl. the
    -nerfacto main (262144 * 63 = 16.5M)."""
    lv = make_level(B, rows, c_row, level_dim=L)
    K = 8
    Keff = K // 2 if paired else K
    p = 2 if paired else 1
    pl_ = 2 * L * p
    r_virt = rows * (T - 1)
    print(f"== {name} trowkey: B={B} rows={rows} c_row={c_row} T={T} "
          f"paired={paired} r_virt={r_virt} pay={pl_} ==")
    t_row = jnp.asarray(rng.integers(0, T - 1, (B,)).astype(np.int32))
    # static fold matrix [(T-1)*2L*p ... p folds separately]: random
    # one-hot columns stand in for the real ch(t_row) tables (timing)
    fold_cols = rng.integers(0, c_row, (T - 1, 2 * L)).astype(np.int32)
    Mfold = np.zeros(((T - 1) * 2 * L, c_row), np.float32)
    for t in range(T - 1):
        for j in range(2 * L):
            Mfold[t * 2 * L + j, fold_cols[t, j]] = 1.0
    Mfold = jnp.asarray(Mfold)

    def st_trowkey(c, a):
        g = a["g"] + c
        vals = jnp.concatenate([g * a["w_a"], g * a["w_b"]], -1)  # [B,2L]
        keys_all, pays = [], []
        for k in range(Keff):
            kk = 2 * k if paired else k
            keys_all.append(a["idxs"][kk] * (T - 1) + t_row)
            if paired:
                pays.append(jnp.concatenate(
                    [a["ws"][kk][:, None] * vals,
                     a["ws"][kk + 1][:, None] * vals], -1))  # [B, 4L]
            else:
                pays.append(a["ws"][kk][:, None] * vals)
        keys = jnp.concatenate(keys_all)
        pay = jnp.concatenate(pays, 0)                    # [Keff*B, pl_]
        srt = jax.lax.sort(
            (keys, *(pay[:, j] for j in range(pl_))), num_keys=1)
        pay_s = jnp.stack(srt[1:], -1)
        virt = pk.sorted_scatter_add(pay_s, srt[0], r=r_virt, c=pl_)
        v = virt.reshape(rows, (T - 1), p, 2 * L)
        d0 = v[:, :, 0].reshape(rows, (T - 1) * 2 * L) @ Mfold
        if paired:
            d1 = v[:, :, 1].reshape(rows, (T - 1) * 2 * L) @ Mfold
            d0 = d0 + jnp.roll(d1, 1, 0)
        return c + jnp.sum(d0) * 1e-20

    bench(f"{name} bwd TROWKEY MERGED (1 sort of {Keff}B, "
          f"{pl_}-lane pay)", st_trowkey, jnp.float32(0.0), lv,
          n1=n1, n2=n2)

    def st_trowkey_percorner(c, a):
        g = a["g"] + c
        vals = jnp.concatenate([g * a["w_a"], g * a["w_b"]], -1)
        d_virt = jnp.zeros((r_virt, pl_), jnp.float32)
        for k in range(Keff):
            kk = 2 * k if paired else k
            keys = a["idxs"][kk] * (T - 1) + t_row
            if paired:
                pay = jnp.concatenate(
                    [a["ws"][kk][:, None] * vals,
                     a["ws"][kk + 1][:, None] * vals], -1)
            else:
                pay = a["ws"][kk][:, None] * vals
            srt = jax.lax.sort(
                (keys, *(pay[:, j] for j in range(pl_))), num_keys=1)
            d_virt = d_virt + pk.sorted_scatter_add(
                jnp.stack(srt[1:], -1), srt[0], r=r_virt, c=pl_)
        v = d_virt.reshape(rows, (T - 1), p, 2 * L)
        d0 = v[:, :, 0].reshape(rows, (T - 1) * 2 * L) @ Mfold
        if paired:
            d1 = v[:, :, 1].reshape(rows, (T - 1) * 2 * L) @ Mfold
            d0 = d0 + jnp.roll(d1, 1, 0)
        return c + jnp.sum(d0) * 1e-20

    bench(f"{name} bwd TROWKEY per-corner ({Keff} sorts of B)",
          st_trowkey_percorner, jnp.float32(0.0), lv, n1=n1, n2=n2)


def pick_ablation(name, B, c_row, T, L=2, n1=3, n2=9):
    """Window-pick + u-build reformulations (r5).

    The pick channels are a STATIC function of the temporal-table row and
    the interpolation weights are per-sample scalars, so both the forward
    pick and the backward's u = d(out)/d(acc) admit an MXU form:

        pick:  Y = acc @ P            (P [c_row, (T-1)*2L] static one-hot)
               out_j = sum_t (t_row == t) * Y[:, t*2L + j]   (block select)
        u:     G[b, t*2L+j] = (t_row[b]==t) * wv[b,j] * g[b, j%L]
               u = G @ fold_m         (the SAME static fold matrix the
                                       trowkey backward already uses)

    vs the current compare-select VPU reductions (_window_pick / op_bwd's
    u loop).  Floors: the pick's irreducible work is 2L lane-reduces of
    [B, c_row] (pick_floor) and u's is one [B, c_row] broadcast-mult
    (u_floor)."""
    n_trows = T - 1
    lv = make_level(B, 1 << 17, c_row, temporal_dim=c_row - L,
                    level_dim=L)
    t_row = jnp.asarray(rng.integers(0, n_trows, B).astype(np.int32))
    # static pick tables (channel picks per temporal row)
    cha_tab = rng.integers(0, c_row - 1, (n_trows, L)).astype(np.int32)
    chb_tab = cha_tab + 1
    P = np.zeros((c_row, n_trows * 2 * L), np.float32)
    for t in range(n_trows):
        for l in range(L):
            P[cha_tab[t, l], t * 2 * L + l] = 1.0
            P[chb_tab[t, l], t * 2 * L + L + l] = 1.0
    fold_m = jnp.asarray(P.T.copy())  # [(T-1)*2L, c_row]
    Pj = jnp.asarray(P)
    ch_a = jnp.asarray(cha_tab)[t_row]  # [B, L] per-sample picks
    ch_b = jnp.asarray(chb_tab)[t_row]
    lv = dict(lv, ch_a=ch_a, ch_b=ch_b, t_row=t_row)
    print(f"== {name} pick: B={B} c_row={c_row} T={T} L={L} ==")

    def mk_acc(a, c):
        return jnp.broadcast_to(
            (a["w_a"][:, :1] + c), (B, c_row)).astype(jnp.float32)

    def st_pick_cur(c, a):
        out = hg._window_pick(mk_acc(a, c), a["ch_a"], a["w_a"],
                              a["ch_b"], a["w_b"])
        return c + jnp.sum(out) * 1e-20

    bench(f"{name} pick CURRENT (compare-select)", st_pick_cur,
          jnp.float32(0.0), lv, n1=n1, n2=n2)

    def st_pick_floor(c, a):
        acc = mk_acc(a, c)
        outs = [jnp.sum(acc * (j + 1.0), -1) for j in range(2 * L)]
        return c + jnp.sum(jnp.stack(outs, -1)) * 1e-20

    bench(f"{name} pick FLOOR (2L lane reduces)", st_pick_floor,
          jnp.float32(0.0), lv, n1=n1, n2=n2)

    def st_pick_mxu(c, a, f32=False):
        acc = mk_acc(a, c)
        if f32:
            Y = acc @ Pj
        else:
            Y = (acc.astype(jnp.bfloat16)
                 @ Pj.astype(jnp.bfloat16)).astype(jnp.float32)
        tmask = (a["t_row"][:, None]
                 == jnp.arange(n_trows, dtype=jnp.int32)[None, :])
        sel = [jnp.sum(jnp.where(tmask, Y[:, j::2 * L], 0.0), -1)
               for j in range(2 * L)]
        out = jnp.stack(
            [a["w_a"][:, l] * sel[l] + a["w_b"][:, l] * sel[L + l]
             for l in range(L)], -1)
        return c + jnp.sum(out) * 1e-20

    bench(f"{name} pick MXU bf16 (matmul+block select)", st_pick_mxu,
          jnp.float32(0.0), lv, n1=n1, n2=n2)
    bench(f"{name} pick MXU f32", lambda c, a: st_pick_mxu(c, a, True),
          jnp.float32(0.0), lv, n1=n1, n2=n2)

    def st_u_cur(c, a):
        g = a["g"] + c
        ch_i = jnp.arange(c_row, dtype=jnp.int32)[None, :]
        u = 0.0
        for l in range(L):
            u = u + g[:, l:l + 1] * (
                a["w_a"][:, l:l + 1] * (a["ch_a"][:, l:l + 1] == ch_i)
                + a["w_b"][:, l:l + 1] * (a["ch_b"][:, l:l + 1] == ch_i))
        return c + jnp.sum(u) * 1e-20

    bench(f"{name} u CURRENT (compare-select)", st_u_cur,
          jnp.float32(0.0), lv, n1=n1, n2=n2)

    def st_u_mxu(c, a):
        g = a["g"] + c
        gv = jnp.concatenate([a["w_a"] * g, a["w_b"] * g], -1)  # [B, 2L]
        tmask = (a["t_row"][:, None]
                 == jnp.arange(n_trows, dtype=jnp.int32)[None, :])
        # G [B, n_trows*2L]: gv tiled into the t_row block
        G = (tmask[:, :, None] * gv[:, None, :]).reshape(
            B, n_trows * 2 * L)
        u = G @ fold_m
        return c + jnp.sum(u) * 1e-20

    bench(f"{name} u MXU (block expand+matmul)", st_u_mxu,
          jnp.float32(0.0), lv, n1=n1, n2=n2)

    def st_u_floor(c, a):
        g = a["g"] + c
        u = jnp.broadcast_to(g[:, :1], (B, c_row)) * a["w_a"][:, :1]
        return c + jnp.sum(u) * 1e-20

    bench(f"{name} u FLOOR (1 broadcast-mult)", st_u_floor,
          jnp.float32(0.0), lv, n1=n1, n2=n2)


def encode_ab():
    """Whole-encode A/B at the nerfplayer field scales."""
    from soccernerfs_tpu.ops.hash_grid import HashGridConfig, hash_grid_encode

    for name, B, levels, t_dim, max_res in (
        ("prop1", 1_048_576, 5, 32, 64),
        ("prop2", 393_216, 5, 32, 256),
        ("main-temporal", 196_608, 16, 64, 1024),
    ):
        cfg = HashGridConfig(
            num_levels=levels, level_dim=2, base_resolution=16,
            per_level_scale=(max_res / 16) ** (1 / max(levels - 1, 1)),
            log2_hashmap_size=17, temporal_dim=t_dim,
        )
        key = jax.random.PRNGKey(0)
        params = hg.init_hash_grid(key, cfg)
        xyz = jnp.asarray(rng.uniform(0, 1, (B, 3)).astype(np.float32))
        tm = jnp.asarray(rng.uniform(0, 1, (B,)).astype(np.float32))

        def fwd(c, a):
            p, xyz_, tm_ = a
            out = hash_grid_encode(
                cfg, {"embeddings": p["embeddings"] + c}, xyz_, tm_,
                input_grads=False)
            return c + jnp.sum(out) * 1e-20

        bench(f"{name} encode FWD only", fwd, jnp.float32(0.0),
              (params, xyz, tm), n1=3, n2=9)

        def fwdbwd(c, a, ig=False):
            p, xyz_, tm_ = a

            def loss(emb):
                out = hash_grid_encode(
                    cfg, {"embeddings": emb}, xyz_, tm_, input_grads=ig)
                return jnp.sum(out * (1.0 + c))

            gr = jax.grad(loss)(p["embeddings"])
            return c + jnp.sum(gr) * 1e-20

        bench(f"{name} encode FWD+BWD detached", fwdbwd,
              jnp.float32(0.0), (params, xyz, tm), n1=3, n2=9)
        bench(f"{name} encode FWD+BWD full input grads",
              lambda c, a: fwdbwd(c, a, ig=True), jnp.float32(0.0),
              (params, xyz, tm), n1=3, n2=9)


def fwd_ablation(name, B, levels, t_dim, max_res, n1=3, n2=9):
    """Attribute the whole-encode forward: prep (hash/ws/tri) vs gathers
    vs window pick, by substituting each stage with a same-shape
    broadcast."""
    from soccernerfs_tpu.ops.hash_grid import HashGridConfig

    cfg = HashGridConfig(
        num_levels=levels, level_dim=2, base_resolution=16,
        per_level_scale=(max_res / 16) ** (1 / max(levels - 1, 1)),
        log2_hashmap_size=17, temporal_dim=t_dim,
    )
    params = hg.init_hash_grid(jax.random.PRNGKey(0), cfg)
    xyz = jnp.asarray(rng.uniform(0, 1, (B, 3)).astype(np.float32))
    tm = jnp.asarray(rng.uniform(0, 1, (B,)).astype(np.float32))
    offsets, scales, resolutions = hg.level_layout(cfg)
    corner_offsets = np.stack(
        np.meshgrid(*([np.arange(2)] * 3), indexing="ij"), axis=-1
    ).reshape(-1, 3)
    print(f"== {name} fwd ablation: B={B} levels={levels} ==")

    def run(c, a, do_gather=True, do_pick=True, do_prep=True):
        p, xyz_, tm_ = a
        table = p["embeddings"] + c
        tri = hg.get_temporal_index(cfg, tm_).reshape(B, cfg.level_dim, 4)
        w_a, ch_a = tri[..., 0], tri[..., 1].astype(jnp.int32)
        w_b, ch_b = tri[..., 2], tri[..., 3].astype(jnp.int32)
        outs = []
        for lvl in range(cfg.num_levels):
            res = resolutions[lvl]
            rows = offsets[lvl + 1] - offsets[lvl]
            pos = xyz_ * scales[lvl] + 0.5
            pos0 = jnp.floor(pos)
            frac = pos - pos0
            pos0 = pos0.astype(jnp.int32)
            lvl_table = jax.lax.dynamic_slice_in_dim(
                table, offsets[lvl], rows, axis=0)
            t16 = lvl_table.astype(jnp.bfloat16)
            if do_prep:
                idxs = [hg._hash_index(pos0 + corner_offsets[k], res,
                                       rows, cfg, False)
                        for k in range(8)]
                ws = [jnp.prod(
                    jnp.where(corner_offsets[k][None, :] == 1, frac,
                              1.0 - frac), axis=-1) for k in range(8)]
            else:
                idxs = [pos0[:, 0] for _ in range(8)]
                ws = [frac[:, 0] for _ in range(8)]
            acc = 0.0
            for k in range(8):
                if do_gather:
                    f = jnp.take(t16, idxs[k], axis=0, mode="clip")
                else:
                    f = (t16[:1] * idxs[k][:1, None].astype(jnp.bfloat16)
                         ).astype(jnp.bfloat16) + jnp.zeros(
                        (B, t16.shape[1]), jnp.bfloat16)
                acc = acc + ws[k][:, None] * f
            if do_pick:
                outs.append(hg._window_pick(acc, ch_a, w_a, ch_b, w_b))
            else:
                outs.append(acc[:, :cfg.level_dim])
        return c + jnp.sum(jnp.concatenate(outs, -1)) * 1e-20

    args = (params, xyz, tm)
    bench(f"{name} fwd FULL", run, jnp.float32(0.0), args, n1=n1, n2=n2)
    bench(f"{name} fwd NO gathers",
          lambda c, a: run(c, a, do_gather=False), jnp.float32(0.0),
          args, n1=n1, n2=n2)
    bench(f"{name} fwd NO pick",
          lambda c, a: run(c, a, do_pick=False), jnp.float32(0.0),
          args, n1=n1, n2=n2)
    bench(f"{name} fwd NO prep (degenerate idx)",
          lambda c, a: run(c, a, do_prep=False), jnp.float32(0.0),
          args, n1=n1, n2=n2)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("devices:", jax.devices())
    if which in ("prop1", "all"):
        stage_ablation("prop1", 1_048_576, 1 << 17, 34)
    if which in ("main", "all"):
        stage_ablation("main", 196_608, 1 << 17, 66)
    if which in ("compact", "all"):
        compact_ablation("prop1", 1_048_576, 1 << 17, 34)
        compact_ablation("main", 196_608, 1 << 17, 66)
    if which in ("chankey", "all"):
        chankey_ablation("prop1", 1_048_576, 1 << 17, 34, paired=True)
        chankey_ablation("main", 196_608, 1 << 17, 66, paired=False)
        chankey_ablation("prop2", 393_216, 1 << 17, 34, paired=True)
    if which in ("trowkey", "all"):
        trowkey_ablation("prop1", 1_048_576, 1 << 17, 34, T=32,
                         paired=True)
        trowkey_ablation("main", 196_608, 1 << 17, 66, T=64,
                         paired=False)
        trowkey_ablation("main18", 196_608, 1 << 18, 66, T=64,
                         paired=False)
        trowkey_ablation("prop2", 393_216, 1 << 17, 34, T=32,
                         paired=True)
    if which in ("fwd", "all"):
        fwd_ablation("prop1", 1_048_576, 5, 32, 64)
    if which in ("pick", "all"):
        pick_ablation("prop1", 1_048_576, 34, T=32)
        pick_ablation("main", 196_608, 66, T=64)
    if which in ("encode", "all"):
        encode_ab()


if __name__ == "__main__":
    main()
