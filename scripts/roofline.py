"""Analytic roofline for the pinned K-Planes TPU workload (PERF.md).

Computes, per step segment, the bytes it must move and the MACs it must
execute under the CURRENT design, and divides by the v5e's measured
ceilings (820 GB/s HBM streaming, 188 TFLOP/s bf16 MXU) plus the
measured XLA gather/scatter floors (PERF.md "Measured primitive costs")
to produce the physical and toolchain bounds the measured times are
judged against (VERDICT round 2 item 1).

Usage: python scripts/roofline.py            # prints the table
The numbers feed the "Roofline" section of PERF.md.
"""
from __future__ import annotations

# ---- machine ceilings (measured on this v5e via microbench_r2) -------------
HBM_GBPS = 820.0            # streaming bandwidth
MXU_TFLOPS = 188.0          # bf16 (94 T MAC/s)
GATHER_NS_SMALL = 1.7       # per 128-lane row, table <= 4 MB (XLA floor)
GATHER_NS_LARGE = 10.0      # per 128-lane row, table >= 64 MB (XLA floor)
SORT_NS = 1.3               # per element per operand (lax.sort)

# ---- pinned workload (ref method_configs.py:481-560) -----------------------
RAYS = 4096
S_PROP = (256, 128)
S_NERF = 64
MS = (1, 2, 4, 8, 16)       # multiscale over 64^3 x 100
BASE = 64
T = 100
F = 32                      # field feature dim
PROPS = ({"res": 128, "t": 100, "f": 8}, {"res": 256, "t": 100, "f": 8})

M_FIELD = RAYS * S_NERF                     # 262,144
M_PROP = [RAYS * s for s in S_PROP]         # 1,048,576 / 524,288
FWD_KERNEL_MIN_ROWS = 65536                 # grid_sample.py gate


def field_tables():
    """[(kind, rows, w, feat, scale_mult)] for every field plane-scale."""
    out = []
    for m in MS:
        sp = BASE * m
        for _ in range(3):
            out.append(("space", sp * sp, sp, F, m))
        for _ in range(3):
            out.append(("time", T * sp, sp, F, m))
    return out


def prop_tables():
    out = []
    for p in PROPS:
        sp = p["res"]
        for _ in range(3):
            out.append(("space", sp * sp, sp, p["f"], 1))
        for _ in range(3):
            out.append(("time", p["t"] * sp, sp, p["f"], 1))
    return out


def gb(x):
    return x / 1e9


def ms_hbm(b):
    return b / (HBM_GBPS * 1e9) * 1e3


def ms_mxu(macs):
    return macs * 2 / (MXU_TFLOPS * 1e12) * 1e3


def main():
    ft = field_tables()
    pt = prop_tables()
    p_field = sum(r * f for _, r, _, f, _ in ft)
    p_prop = sum(r * f for _, r, _, f, _ in pt)
    print(f"field params {p_field/1e6:.1f}M   prop params {p_prop/1e6:.1f}M")

    rows = []  # (segment, measured_ms, bytes, macs, floor_ms, note)

    # 1. quad-pack fwd: read f32 tables, write 4x bf16 packed
    b = p_field * 4 + p_field * 4 * 2
    rows.append(("quad-pack fwd (field)", 8, b, 0, ms_hbm(b),
                 "streaming; pure slicing"))

    # 2. forward Pallas kernel (field tables >= 65536 rows)
    kf = [t for t in ft if t[1] >= FWD_KERNEL_MIN_ROWS]
    rws = len(kf) * M_FIELD
    b = rws * 256 + sum(r * 256 for _, r, _, _, _ in kf)  # rows + table stage
    macs = 0
    for _, r, w, _, _ in kf:
        span = max(1, r * 512 // M_FIELD)
        tr = w * max(1, min(-(-span // w), max(1, 2048 // w)))
        macs += M_FIELD * tr * 128  # one-hot gather matmul per point
    rows.append(("fwd kernel (big field tables)", 13, b, macs,
                 max(ms_hbm(b), ms_mxu(macs)),
                 f"{len(kf)} plane-scales; one-hot MACs dominate"))

    # 3. forward XLA gathers: small field tables + prop tables
    xf = [t for t in ft if t[1] < FWD_KERNEL_MIN_ROWS]
    n_field_rows = len(xf) * M_FIELD
    n_prop_rows = sum(6 * m for m in M_PROP)
    b_useful = n_field_rows * 256 + n_prop_rows * 64
    floor = (n_field_rows + n_prop_rows) * GATHER_NS_SMALL / 1e6
    rows.append(("fwd XLA gathers (props + small field)", 30, b_useful, 0,
                 ms_hbm(b_useful),
                 f"XLA floor {floor:.1f} ms @1.7ns/row "
                 f"({n_field_rows/1e6:.1f}M+{n_prop_rows/1e6:.1f}M rows)"))

    # 4. fold backward kernel (all field plane-scales)
    macs = 0
    b = 0
    for kind, r, w, _, _ in ft:
        span = max(1, r * 512 // M_FIELD)
        tr = w * max(1, min(-(-span // w), max(1, 2048 // w)))
        macs += M_FIELD * tr * 128          # scatter one-hot matmul
        b += r * 128                        # unpacked grad write (f32 F=32)
    b += 30 * M_FIELD * (256 + 56)          # g bf16 + meta f32 per plane-scale
    rows.append(("fold bwd kernel (field)", 31, b, macs,
                 max(ms_hbm(b), ms_mxu(macs)),
                 "one-hot scatter MACs, tr per tiling policy"))

    # 5. canonical alignment permutes (2 groups fwd + bwd)
    width = len(MS) * F * 2                 # [M, S*F] bf16
    n_perm = 4
    b = n_perm * M_FIELD * width * 2
    tiles = -(-len(MS) * F // 128)
    floor = n_perm * M_FIELD * tiles * GATHER_NS_LARGE / 1e6
    rows.append(("alignment permutes", 17, b, 0, ms_hbm(b),
                 f"XLA large-gather floor {floor:.1f} ms"))

    # 6. sorts (3 keys over M_FIELD; ~1.3 ns per key element, operands
    # ride ~free per the primitive table)
    b = 3 * 6 * M_FIELD * 4 * 2
    floor = 3 * M_FIELD * SORT_NS / 1e6
    rows.append(("canonical sorts", 2, b, 0, ms_hbm(b),
                 f"lax.sort floor {floor:.1f} ms"))

    # 7. MLPs (sigma 160->128->16, color SH+geo -> 128 -> 128 -> 3) fwd+bwd
    macs = M_FIELD * (160 * 128 + 128 * 16 + 31 * 128 + 128 * 128 + 128 * 3)
    macs += 2 * macs                        # bwd ~ 2x fwd
    macs += sum(m * (8 * 64 + 64 * 1) for m in M_PROP) * 1  # prop MLPs fwd
    rows.append(("MLPs fwd+bwd", 3, 0, macs, ms_mxu(macs), "MXU"))

    # 8. adam update (bf16 mu, f32 nu/params) over field+prop params
    p = p_field + p_prop
    b = p * (4 + 2 + 4) * 2 + p * 4         # r/w params+moments, read grads
    rows.append(("adam update (bf16 mu)", 4, b, 0, ms_hbm(b), "streaming"))

    # 9. bwd g/meta prep (pack_features transposes + bf16 casts)
    b = 30 * M_FIELD * (256 + 256)          # read f32 g + write packed bf16*2
    rows.append(("bwd g/meta prep", 9, b, 0, ms_hbm(b), "transpose streams"))

    # ---- full-step extras: proposal backward (1 step in 6 post-warmup) --
    # groups per 4D prop level: (XY P=1), (XZ,YZ P=2), (XT,YT,ZT P=3)
    prop_groups = [(1,), (2,), (3,)]
    # lax.sort costs ~1.3 ns per KEY element ("multi-operand similar",
    # PERF.md primitive table): 3 group sorts per level
    sort_keys = 3 * sum(M_PROP)
    b_sort = sum(
        (1 + 2 * np_ + 2) * m * 4 * 2
        for m in M_PROP for (np_,) in prop_groups
    )
    b_perm = sum(m * 6 * 8 * 2 * 2 for m in M_PROP)  # [M, P*8]bf16 r+w
    # one concat-gather per (level, group): rows = M per level x 3 groups,
    # 1 lane-tile each, ~6 ns/row at the 25-50 MB source sizes
    perm_rows_n = 3 * sum(M_PROP)
    macs_sc = 0
    for (lvl, p), m in zip(enumerate(PROPS), M_PROP):
        sp = p["res"]
        for kind, r, w, f, _ in prop_tables()[lvl * 6:(lvl + 1) * 6]:
            g_pack = 128 // (4 * f)             # 4 quad rows per line
            r4 = r // g_pack
            w4 = max(1, w // g_pack)
            span = max(1, (r4 * 512) // m)
            tr = w4 * max(1, min(-(-span // w4), max(1, 2048 // w4)))
            macs_sc += m * tr * 128
    rows.append(("prop bwd: sorts (1/6 steps)", 9, b_sort, 0,
                 ms_hbm(b_sort),
                 f"lax.sort floor {sort_keys * SORT_NS / 1e6:.1f} ms"))
    rows.append(("prop bwd: grad permute gathers (1/6)", 30, b_perm, 0,
                 ms_hbm(b_perm),
                 f"gather floor {perm_rows_n * 6.0 / 1e6:.1f} ms"
                 " (~6 ns/row at 25-50 MB sources)"))
    rows.append(("prop bwd: scatter kernels (1/6)", 17, 0, macs_sc,
                 ms_mxu(macs_sc), "row-packed one-hot scatter"))

    tot_meas = sum(r[1] for r in rows)
    tot_floor = sum(r[4] for r in rows)
    print(f"{'segment':44s} {'meas':>6s} {'GB':>6s} {'GMAC':>7s} "
          f"{'bound':>6s} {'%':>4s}  note")
    for seg, meas, b, macs, floor, note in rows:
        pct = 100 * floor / meas if meas else 0
        print(f"{seg:44s} {meas:6.1f} {gb(b):6.2f} {macs/1e9:7.1f} "
              f"{floor:6.2f} {pct:4.0f}  {note}")
    print(f"{'TOTAL (noprop segments)':44s} {tot_meas:6.1f} "
          f"{'':6s} {'':7s} {tot_floor:6.2f}")


if __name__ == "__main__":
    main()
