"""Standalone Pallas plane-kernel benchmark (TPU).

Times packed_bilerp_fwd_group / packed_bilerp_bwd_group at the real
K-Planes workload shapes without building the whole train step, so kernel
variants can be A/B'd in one ~1-2 min compile instead of a ~10 min step
compile.

Marginal-cost harness: the axon tunnel adds ~30 ms per jitted call, so a
lax.scan chains n kernel invocations (each depending on the previous via a
tiny f32 carry folded into tx) and the cost is (T(n2) - T(n1)) / (n2 - n1).

Usage:
  python scripts/kbench.py [module] [case-filter]
  python scripts/kbench.py /tmp/plane_kernels_v2.py space
"""
from __future__ import annotations

import importlib.util
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

N1, N2 = 3, 13


def load(modpath: str):
    if modpath.endswith(".py"):
        spec = importlib.util.spec_from_file_location("pk_variant", modpath)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    import importlib
    return importlib.import_module(modpath)


def marginal(make_run, *args):
    r1, r2 = make_run(N1), make_run(N2)
    jax.block_until_ready(r1(*args)); jax.block_until_ready(r2(*args))

    def t(r):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(r(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(r2) - t(r1)) / (N2 - N1) * 1e3


def bench_case(pk, name, *, h, w, m, planes, feat=32):
    rng = np.random.default_rng(0)
    r = h * w
    y = np.sort(rng.uniform(0, 1, m).astype(np.float32))
    x = rng.uniform(0, 1, m).astype(np.float32)
    yc = np.minimum((y * (h - 1)).astype(np.int32), h - 2)
    xc = np.minimum((x * (w - 1)).astype(np.int32), w - 2)
    rowid = jnp.asarray(yc * w + xc)
    tx = jnp.asarray(rng.uniform(0, 1, m).astype(np.float32))
    ty = jnp.asarray(rng.uniform(0, 1, m).astype(np.float32))
    g_pack = 128 // (4 * feat)
    w4 = max(1, w // g_pack)
    r4 = r // g_pack
    span = max(1, (r4 * pk.SC) // max(m, 1))
    tr = w4 * max(1, min(-(-span // w4), max(1, 2048 // w4), -(-r4 // w4)))
    group = max(1, min(4096 // (tr * planes), -(-r4 // tr)))

    tables = [jnp.asarray(rng.standard_normal((r, 4 * feat), dtype=np.float32))
              for _ in range(planes)]

    if 4 * feat == 128:
        def make_fwd(n):
            @jax.jit
            def run(tables, tx, ty):
                def body(c, _):
                    txc = tx * (1.0 + 1e-30 * c)
                    outs = pk.packed_bilerp_fwd_group(
                        tables, [rowid] * planes, [txc] * planes, ty,
                        tr=tr, group=group)
                    return outs[0][0, 0].astype(jnp.float32), None
                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
                return c
            return run
        fwd_ms = marginal(make_fwd, tables, tx, ty)
    else:
        fwd_ms = float("nan")

    gs = [jnp.asarray(rng.standard_normal((m, feat)).astype(np.float32))
          for _ in range(planes)]

    def make_bwd(n):
        @jax.jit
        def run(gs, tx, ty):
            def body(c, _):
                gsc = [g * (1.0 + 1e-30 * c) for g in gs]
                grads = pk.packed_bilerp_bwd_group(
                    gsc, [rowid] * planes, [tx] * planes, ty,
                    r=r, tr=tr, group=group)
                return grads[0][0, 0], None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return c
        return run
    bwd_ms = marginal(make_bwd, gs, tx, ty)

    print(f"{name:26s} r={r:>8} tr={tr:>5} grp={group} P={planes} "
          f"M={m:>8}  fwd {fwd_ms:7.2f} ms   bwd {bwd_ms:7.2f} ms",
          flush=True)
    return (0.0 if fwd_ms != fwd_ms else fwd_ms), bwd_ms


CASES = [
    ("space s16 (XZ,YZ)", 1024, 1024, 2, 32),
    ("space s16 (XY)", 1024, 1024, 1, 32),
    ("time  s16 (XT,YT,ZT)", 100, 1024, 3, 32),
    ("space s8  (XZ,YZ)", 512, 512, 2, 32),
    ("space s4  (XZ,YZ)", 256, 256, 2, 32),
    ("time  s8  (XT,YT,ZT)", 100, 512, 3, 32),
    ("prop0 (3 planes f8)", 128, 128, 3, 8),
]


def main():
    modpath = sys.argv[1] if len(sys.argv) > 1 else (
        "soccernerfs_tpu.ops.pallas.plane_kernels")
    filt = sys.argv[2] if len(sys.argv) > 2 else ""
    pk = load(modpath)
    print(f"module: {modpath}  SC={pk.SC}")
    tot_f = tot_b = 0.0
    for name, h, w, planes, feat in CASES:
        if filt and filt not in name:
            continue
        m = 1048576 if feat == 8 else 262144
        f, b = bench_case(pk, name, h=h, w=w, m=m, planes=planes, feat=feat)
        tot_f += f
        tot_b += b
    print(f"{'TOTAL (listed)':26s} {'':43s}fwd {tot_f:7.2f} ms   bwd {tot_b:7.2f} ms")


if __name__ == "__main__":
    main()
