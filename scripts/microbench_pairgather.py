"""A/B microbench for the zline hash pairing hypothesis (nerfacto scale).

Current hashed-level forward: 8 corner gathers of [rows, C=2] rows.
Proposed: additive-z hash + roll-packed [rows, 2C] table -> 4 gathers.
Backward: sort keys halve (4B vs 8B), scatter updates halve at c=4.

Uses microbench_r2's marginal-cost scan harness (the axon tunnel adds
~30 ms/call and does not block properly on small outputs).

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python
    scripts/microbench_pairgather.py
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from microbench_r2 import bench, rng  # noqa: E402


def main():
    rows, c, b = 1 << 19, 2, 393_216
    table = jnp.asarray(
        rng.standard_normal((rows, c), dtype=np.float32))
    table4 = jnp.concatenate([table, jnp.roll(table, -1, axis=0)], -1)
    idx8 = jnp.asarray(rng.integers(0, rows, (8, b), dtype=np.int32))
    ws8 = jnp.asarray(rng.uniform(0, 1, (8, b)).astype(np.float32))

    def g8(cr, args, rows=rows):
        t, i8, w8 = args
        out = 0.0
        for k in range(8):
            i = (i8[k] + cr.astype(jnp.int32)[0]) % rows
            out = out + w8[k][:, None] * jnp.take(t, i, axis=0, mode="clip")
        return cr + out[:1, 0]

    def g4(cr, args, rows=rows, c=c):
        t4, i8, w8 = args
        out = 0.0
        for k in range(4):
            i = (i8[k] + cr.astype(jnp.int32)[0]) % rows
            f = jnp.take(t4, i, axis=0, mode="clip")
            out = out + w8[k][:, None] * f[:, :c] \
                + w8[4 + k][:, None] * f[:, c:]
        return cr + out[:1, 0]

    bench("gather8 [rows,2]", g8, jnp.zeros((1,)), (table, idx8, ws8),
          per_unit=8 * b)
    bench("gather4 [rows,4]", g4, jnp.zeros((1,)), (table4, idx8, ws8),
          per_unit=4 * b)

    g2 = jnp.asarray(rng.standard_normal((8 * b, 2), dtype=np.float32))

    def s8(cr, args, b=b):
        i8, g2 = args
        k = (i8.reshape(-1) + cr.astype(jnp.int32)[0]) % rows
        srt = jax.lax.sort((k, g2[:, 0], g2[:, 1]), num_keys=1)
        return cr + srt[1][-1:] + srt[0][:1]

    def s4(cr, args, b=b):
        i8, g2 = args
        k = (i8[:4].reshape(-1) + cr.astype(jnp.int32)[0]) % rows
        g4v = g2.reshape(4 * b, 4)
        srt = jax.lax.sort((k, *(g4v[:, i] for i in range(4))), num_keys=1)
        return cr + srt[1][-1:] + srt[0][:1]

    bench("sort 8B keys+2ops", s8, jnp.zeros((1,)), (idx8, g2),
          per_unit=8 * b)
    bench("sort 4B keys+4ops", s4, jnp.zeros((1,)), (idx8, g2),
          per_unit=4 * b)

    from soccernerfs_tpu.ops.pallas import plane_kernels as pk

    k8 = jnp.sort(idx8.reshape(-1))
    k4 = jnp.sort(idx8[:4].reshape(-1))
    g4v = g2.reshape(4 * b, 4)

    def sc2(cr, args):
        g2, k8 = args
        gg = g2 + cr[:1]
        out = pk.sorted_scatter_add(gg, k8, r=rows, c=2)
        return cr + out[0, :1]

    def sc4(cr, args):
        g4v, k4 = args
        gg = g4v + cr[:1]
        out = pk.sorted_scatter_add(gg, k4, r=rows, c=4)
        return cr + out[0, :1]

    bench("scatter c=2 8B", sc2, jnp.zeros((1,)), (g2, k8), per_unit=8 * b)
    bench("scatter c=4 4B", sc4, jnp.zeros((1,)), (g4v, k4), per_unit=4 * b)


def temporal_main():
    """Pairing A/B at the TEMPORAL MAIN grid scale (nerfplayer-nerfacto:
    rows=2^18, c_row=66 bf16, B=196k, 16 levels -> x16 one-level cost).
    The r3 'wash' arithmetic (132-lane packed row = 2 tiles = 8x1) was
    THROUGHPUT reasoning; at 35-70 MB sources the gather is ROW-bound
    (4-10 ns/row, PERF.md r4), so halving rows may win even with double
    row bytes."""
    rows, c, b = 1 << 18, 66, 196_608
    table = jnp.asarray(
        rng.standard_normal((rows, c)).astype(np.float32)
    ).astype(jnp.bfloat16)
    table2 = jnp.concatenate([table, jnp.roll(table, -1, axis=0)], -1)
    idx8 = jnp.asarray(rng.integers(0, rows, (8, b), dtype=np.int32))
    ws8 = jnp.asarray(rng.uniform(0, 1, (8, b)).astype(np.float32))

    def g8(cr, args, rows=rows):
        t, i8, w8 = args
        out = 0.0
        for k in range(8):
            i = (i8[k] + cr.astype(jnp.int32)[0]) % rows
            out = out + w8[k][:, None] * jnp.take(t, i, axis=0,
                                                  mode="clip")
        return cr + out[:1, 0]

    def g4(cr, args, rows=rows, c=c):
        t2, i8, w8 = args
        out = 0.0
        for k in range(4):
            i = (i8[k] + cr.astype(jnp.int32)[0]) % rows
            f = jnp.take(t2, i, axis=0, mode="clip")
            out = out + w8[k][:, None] * f[:, :c] \
                + w8[4 + k][:, None] * f[:, c:]
        return cr + out[:1, 0]

    bench("MAIN gather8 [2^18,66]bf16", g8, jnp.zeros((1,)),
          (table, idx8, ws8), per_unit=8 * b)
    bench("MAIN gather4 [2^18,132]bf16 packed", g4, jnp.zeros((1,)),
          (table2, idx8, ws8), per_unit=4 * b)
    # same at the FULL-nerfplayer main size (2^17 rows)
    rows17 = 1 << 17
    t17 = table[:rows17]
    t17_2 = jnp.concatenate([t17, jnp.roll(t17, -1, axis=0)], -1)
    i17 = idx8 % rows17
    bench("MAIN17 gather8 [2^17,66]bf16",
          lambda cr, a: g8(cr, a, rows=rows17), jnp.zeros((1,)),
          (t17, i17, ws8), per_unit=8 * b)
    bench("MAIN17 gather4 [2^17,132]bf16 packed",
          lambda cr, a: g4(cr, a, rows=rows17), jnp.zeros((1,)),
          (t17_2, i17, ws8), per_unit=4 * b)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "temporal-main":
        temporal_main()
    else:
        main()
