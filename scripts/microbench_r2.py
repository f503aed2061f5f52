"""Round-2 perf microbenchmarks (TPU).  Run: python scripts/microbench_r2.py

Harness rules learned the hard way (axon tunnel):
  * ~30 ms fixed overhead per jitted call -> measure MARGINAL cost of a
    longer vs shorter lax.scan chain.
  * big arrays must be ARGUMENTS of the jitted fn (closures become
    constants: bogus folding + HTTP 413 on remote compile).
  * the carry must REALLY depend on each step's result (no `*0`).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)


def bench(name, step_fn, carry, args, per_unit=None, n1=5, n2=30, reps=3):
    """step_fn(carry, args) -> carry; prints marginal ms/step."""

    def make(n):
        @jax.jit
        def run(carry, args):
            def body(c, _):
                return step_fn(c, args), None
            c, _ = jax.lax.scan(body, carry, None, length=n)
            return jax.tree_util.tree_reduce(
                lambda a, x: a + jnp.sum(x.astype(jnp.float32)), c, jnp.float32(0)
            )
        return run

    r1, r2 = make(n1), make(n2)
    jax.device_get(r1(carry, args)), jax.device_get(r2(carry, args))

    def t(r):
        t0 = time.perf_counter()
        jax.device_get(r(carry, args))
        return time.perf_counter() - t0

    ms = (min(t(r2) for _ in range(reps)) - min(t(r1) for _ in range(reps))) / (n2 - n1) * 1e3
    extra = f" ({ms * 1e6 / per_unit:.2f} ns/unit)" if per_unit else ""
    print(f"{name}: {ms:.3f} ms{extra}")
    return ms


def main():
    print("devices:", jax.devices())

    # calibration
    a = jnp.asarray(rng.standard_normal((4096, 4096), dtype=np.float32)).astype(jnp.bfloat16)
    bench("mm 4096^3 (137.4 GFLOP)", lambda c, args: jnp.dot(c, args, preferred_element_type=jnp.bfloat16), a, a)

    # sorts
    for m in (262_144, 1_048_576):
        keys = jnp.asarray(rng.integers(0, 1 << 20, m, dtype=np.int32))

        def sstep(c, keys):
            kk = keys ^ c[0]
            s, v = jax.lax.sort((kk, keys), num_keys=1)
            return c ^ s[:1] ^ v[-1:]

        bench(f"sort_pair {m}", sstep, keys[:1], keys, per_unit=m)

    # gathers (unsorted + sorted idx), bf16 tables
    for (m, r, fw, tag) in (
        (1_048_576, 1_048_576, 128, "s16"),
        (262_144, 262_144, 128, "s8"),
        (262_144, 16_384, 128, "s2"),
        (1_048_576, 4_096, 128, "4k-wide"),
        (1_048_576, 4_096, 32, "prop1"),
        (524_288, 16_384, 32, "prop2"),
    ):
        idx = jnp.asarray(rng.integers(0, r, m, dtype=np.int32))
        table = jnp.asarray(rng.standard_normal((r, fw), dtype=np.float32)).astype(jnp.bfloat16)

        def gstep(c, args, r=r):
            t, i = args
            i2 = (i + c.astype(jnp.int32)[0]) % r
            out = jnp.take(t, i2, axis=0)
            return c + jnp.max(out[0]).astype(jnp.float32)[None]

        bench(f"gather {tag} m={m} r={r} fw={fw}", gstep,
              jnp.zeros((1,), jnp.float32), (table, idx), per_unit=m)

        def gsstep(c, args, r=r):
            t, i = args
            out = jnp.take(t, i, axis=0)
            return c + jnp.max(out[0]).astype(jnp.float32)[None] + out[-1, :1].astype(jnp.float32)

        bench(f"  sorted {tag}", gsstep,
              jnp.zeros((1,), jnp.float32), (table, jnp.sort(idx)), per_unit=m)

    # scatters
    for (m, r, fw, tag) in (
        (262_144, 1_048_576, 128, "s16"),
        (262_144, 16_384, 128, "s2"),
        (1_048_576, 4_096, 32, "prop1"),
        (524_288, 16_384, 32, "prop2"),
    ):
        idx = jnp.asarray(rng.integers(0, r, m, dtype=np.int32))
        g = jnp.asarray(rng.standard_normal((m, fw), dtype=np.float32))

        def scstep(c, args, r=r, fw=fw):
            gg, i = args
            acc = jnp.zeros((r, fw), jnp.float32).at[i].add(gg + c[0])
            return c + acc[0, :1] + acc[-1, :1]

        bench(f"scatter {tag} m={m} r={r} fw={fw}", scstep,
              jnp.zeros((1,), jnp.float32), (g, idx), per_unit=m)

    # one-hot matmul gather (XLA; onehot materializes in HBM - upper bound)
    for (m, r, fw, tag) in (
        (1_048_576, 4_096, 32, "prop1"),
        (262_144, 4_096, 128, "s1"),
    ):
        idx = jnp.asarray(rng.integers(0, r, m, dtype=np.int32))
        table = jnp.asarray(rng.standard_normal((r, fw), dtype=np.float32)).astype(jnp.bfloat16)

        def ohstep(c, args, r=r):
            t, i = args
            i2 = (i + c.astype(jnp.int32)[0]) % r
            oh = (i2[:, None] == jnp.arange(r, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
            out = jnp.dot(oh, t, preferred_element_type=jnp.float32)
            return c + jnp.max(out[0])[None]

        bench(f"onehot-XLA {tag} m={m} r={r} fw={fw}", ohstep,
              jnp.zeros((1,), jnp.float32), (table, idx), per_unit=m, n1=3, n2=13)


if __name__ == "__main__":
    main()
