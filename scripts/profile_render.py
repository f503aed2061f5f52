"""Diagnose the eval-render path: device-busy vs wall, chunk-size sweep.

bench.py --render reports ~61k test rays/s — the same as the train
FORWARD rate — despite the prepacked fast path.  This measures (a) the
device-busy fraction of a rendered frame (host/tunnel overhead shows up
as wall >> busy) and (b) throughput vs rays-per-chunk.

Run (TPU): python scripts/profile_render.py
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    from soccernerfs_tpu.core.cameras import Cameras, generate_rays
    from soccernerfs_tpu.models import kplanes

    cfg = kplanes.Config(
        spacetime_resolution=(64, 64, 64, 100),
        feature_dim=32,
        multiscale_res=(1, 2, 4, 8, 16),
        proposal_net_args_list=(
            {"feature_dim": 8, "resolution": (128, 128, 128, 100)},
            {"feature_dim": 8, "resolution": (256, 256, 256, 100)},
        ),
        num_proposal_samples_per_ray=(256, 128),
        num_nerf_samples_per_ray=64,
        sigma_net_hidden_dim=128,
        disable_viewing_dependent=True,
    )
    params = kplanes.init(jax.random.PRNGKey(0), cfg, num_train_data=20)
    aabb = jnp.asarray([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]])
    h, w = 540, 960
    cameras = Cameras.create(
        camera_to_worlds=np.eye(3, 4, dtype=np.float32)[None]
        + np.zeros((1, 3, 4), np.float32),
        fx=800.0, fy=800.0, cx=w / 2, cy=h / 2, width=w, height=h,
        times=np.zeros((1,), np.float32),
    )
    params = jax.jit(lambda p: kplanes.prepare_render_params(cfg, p))(params)
    coords_all = np.stack(
        np.meshgrid(np.arange(h, dtype=np.float32),
                    np.arange(w, dtype=np.float32), indexing="ij"), -1
    ).reshape(-1, 2)
    n_pix = coords_all.shape[0]

    @jax.jit
    def render_chunk(params, coords):
        rays = generate_rays(
            cameras, jnp.zeros((coords.shape[0],), jnp.int32), coords
        )
        out = kplanes.get_outputs(
            cfg, params, aabb, rays, rng=jax.random.PRNGKey(0), train=False
        )
        return out["rgb"]

    for log2c in (16, 17, 18):
        chunk = 1 << log2c
        n_chunks = -(-n_pix // chunk)
        pad = n_chunks * chunk - n_pix
        ca = np.concatenate([coords_all, coords_all[:max(pad, 0)]], 0)
        chunks = [jnp.asarray(ca[i * chunk:(i + 1) * chunk])
                  for i in range(n_chunks)]
        try:
            jax.block_until_ready(render_chunk(params, chunks[0]))
            t0 = time.time()
            outs = [render_chunk(params, c) for c in chunks]
            jax.block_until_ready(outs)
            dt = time.time() - t0
            print(f"chunk 2^{log2c}: frame {dt * 1e3:.0f} ms "
                  f"({n_pix / dt / 1e3:.1f}k rays/s)", flush=True)
        except Exception as e:
            print(f"chunk 2^{log2c}: {type(e).__name__}: {e}"[:200],
                  flush=True)

    # device-busy trace at the default chunk
    chunk = 1 << 16
    n_chunks = -(-n_pix // chunk)
    pad = n_chunks * chunk - n_pix
    ca = np.concatenate([coords_all, coords_all[:pad]], 0)
    chunks = [jnp.asarray(ca[i * chunk:(i + 1) * chunk])
              for i in range(n_chunks)]
    jax.block_until_ready(render_chunk(params, chunks[0]))
    with jax.profiler.trace("/tmp/snt_rtrace"):
        t0 = time.time()
        outs = [render_chunk(params, c) for c in chunks]
        jax.block_until_ready(outs)
        wall = time.time() - t0

    paths = sorted(glob.glob("/tmp/snt_rtrace/**/*.trace.json.gz",
                             recursive=True))
    busy = 0.0
    agg = collections.Counter()
    if paths:
        with gzip.open(paths[-1], "rt") as f:
            data = json.load(f)
        events = data.get("traceEvents", [])
        pid_names = {}
        for e in events:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"].get("name", "")
        for e in events:
            if e.get("ph") != "X":
                continue
            if "TPU" not in pid_names.get(e.get("pid"), ""):
                continue
            src = (e.get("args") or {}).get("source", "?")
            agg[src.split("/")[-1]] += e.get("dur", 0)
            busy += e.get("dur", 0)
    print(f"frame wall {wall * 1e3:.0f} ms, device busy {busy / 1e3:.0f} ms "
          f"({busy / 1e3 / (wall * 1e3) * 100:.0f}%)", flush=True)
    for src, us in agg.most_common(20):
        print(f"  {us / 1e3:8.2f}  {src}")


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
