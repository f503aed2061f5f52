"""Decompose the K-Planes TPU step time by ablation (see PERF.md).

Usage: python scripts/ablate_step.py [ablation ...]
Ablations: full, noprop (pruned proposal bwd), frozen_grids,
           no_gathers, no_aux_losses, fwd_only
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def build(ablation: str):
    from soccernerfs_tpu.core.cameras import Cameras, generate_rays
    from soccernerfs_tpu.models import kplanes
    from soccernerfs_tpu.ops import grid_sample
    from soccernerfs_tpu.fields import kplanes as kpf

    if ablation == "no_gathers":
        def fake_sampler(plane, coords, gather_dtype=jnp.bfloat16):
            f = plane.shape[-1]
            mean = jnp.mean(plane.reshape(-1, f), axis=0)
            return jnp.broadcast_to(mean, coords.shape[:-1] + (f,)) * (
                1.0 + 1e-6 * coords[..., :1]
            )
        kpf.sample_plane_bilinear_packed = fake_sampler  # monkeypatch
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
    batch_size = 4096
    params = kplanes.init(jax.random.PRNGKey(0), cfg, num_train_data=20)
    aabb = jnp.asarray([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]])
    n_cams = 20
    c2w = np.zeros((n_cams, 3, 4), np.float32)
    for i in range(n_cams):
        th = 2 * np.pi * i / n_cams
        z = np.array([np.cos(th), np.sin(th), 0.5]); z /= np.linalg.norm(z)
        x = np.cross(np.array([0.0, 0.0, 1.0]), z); x /= np.linalg.norm(x)
        c2w[i, :, 0], c2w[i, :, 1], c2w[i, :, 2] = x, np.cross(z, x), z
        c2w[i, :, 3] = z * 2.5
    cameras = Cameras.create(
        camera_to_worlds=c2w, fx=800.0, fy=800.0, cx=480.0, cy=270.0,
        width=960, height=540, times=np.linspace(0, 1, n_cams).astype(np.float32),
    )
    if "bf16adam" in ablation:
        from soccernerfs_tpu.engine.optimizers import scale_by_adam_lowp
        optimizer = optax.chain(
            scale_by_adam_lowp(eps=1e-12), optax.scale(-1e-2)
        )
    else:
        optimizer = optax.adam(1e-2, eps=1e-12)
    state = {
        "params": params,
        "opt_state": optimizer.init(params),
        "step": jnp.asarray(0, jnp.int32),
        "aux": kplanes.init_aux(cfg),
    }

    def train_step(state, cam_idx, coords, image, train_props):
        step = state["step"]
        sched_kwargs, new_aux = kplanes.schedules(cfg, step, state["aux"])
        sched_kwargs["train_proposal_networks"] = train_props
        rng = jax.random.fold_in(jax.random.PRNGKey(1), step)
        batch = {"image": image}

        def loss_fn(p):
            if "frozen_field" in ablation:
                p = dict(p)
                p["fields"] = dict(p["fields"])
                p["fields"]["grids"] = jax.tree_util.tree_map(
                    jax.lax.stop_gradient, p["fields"]["grids"]
                )
            if ablation == "frozen_grids":
                p = dict(p)
                p["fields"] = dict(p["fields"])
                p["fields"]["grids"] = jax.tree_util.tree_map(
                    jax.lax.stop_gradient, p["fields"]["grids"]
                )
                p["proposal_networks"] = jax.tree_util.tree_map(
                    jax.lax.stop_gradient, p["proposal_networks"]
                )
            rays = generate_rays(cameras, cam_idx, coords)
            outputs = kplanes.get_outputs(
                cfg, p, aabb, rays, rng=rng, train=True, **sched_kwargs
            )
            loss_dict = kplanes.get_loss_dict(cfg, p, outputs, batch, {})
            if "rgb_only" in ablation or ablation == "no_aux_losses":
                loss = loss_dict["rgb_loss"]
            elif "np_no_tv" in ablation:
                loss = sum(v for k, v in loss_dict.items()
                           if "tv" not in k and "smooth" not in k and "transient" not in k)
            elif ablation == "no_tv":
                loss = sum(v for k, v in loss_dict.items()
                           if "tv" not in k and "smooth" not in k and "transient" not in k)
            elif ablation == "no_interlevel":
                loss = sum(v for k, v in loss_dict.items() if k != "interlevel_loss")
            elif ablation == "no_distortion":
                loss = sum(v for k, v in loss_dict.items() if k != "distortion_loss")
            elif ablation == "rgb_interlevel":
                loss = loss_dict["rgb_loss"] + loss_dict["interlevel_loss"]
            else:
                loss = sum(loss_dict.values())
            return loss

        if ablation == "fwd_only":
            loss = loss_fn(state["params"])
            return (
                {"params": state["params"], "opt_state": state["opt_state"],
                 "step": step + 1, "aux": new_aux},
                loss,
            )
        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        updates, opt_state = optimizer.update(grads, state["opt_state"])
        new_params = optax.apply_updates(state["params"], updates)
        if os.environ.get("SNT_PIN_LAYOUT"):
            from jax.experimental import layout

            def pin(x):
                if hasattr(x, "ndim") and x.ndim == 3:
                    return layout.with_layout_constraint(
                        x, layout.Layout(tuple(range(x.ndim))))
                return x

            new_params = dict(new_params)
            new_params["fields"] = dict(new_params["fields"])
            new_params["fields"]["grids"] = jax.tree_util.tree_map(
                pin, new_params["fields"]["grids"]
            )
        return (
            {"params": new_params, "opt_state": opt_state, "step": step + 1,
             "aux": new_aux},
            loss,
        )

    step_fn = jax.jit(train_step, donate_argnums=0, static_argnums=4)

    def make_batch(i):
        r = np.random.default_rng(i)
        return (
            jnp.asarray(r.integers(0, n_cams, (batch_size,)).astype(np.int32)),
            jnp.asarray(np.stack(
                [r.uniform(0, 540, batch_size), r.uniform(0, 960, batch_size)], -1
            ).astype(np.float32)),
            jnp.asarray(r.uniform(0, 1, (batch_size, 3)).astype(np.float32)),
        )

    return step_fn, state, make_batch


def measure(ablation: str, n_steps=30):
    if ablation == "mix":
        return measure_mix()
    train_props = not ablation.startswith("np_") and ablation != "noprop"
    step_fn, state, make_batch = build(ablation)
    batches = [make_batch(i) for i in range(8)]
    state, loss = step_fn(state, *batches[0], train_props)
    jax.block_until_ready(loss)
    t0 = time.time()
    for i in range(n_steps):
        state, loss = step_fn(state, *batches[i % 8], train_props)
    float(jax.device_get(loss))
    ms = (time.time() - t0) / n_steps * 1e3
    print(f"{ablation}: {ms:.1f} ms/step ({4096/ms*1e3:.0f} rays/s)")


def measure_mix(n_steps=48):
    """Alternate the two compiled step variants like real training (5
    noprop : 1 full) — exposes any program-switch cost (e.g. layout
    mismatches between the two executables' state buffers)."""
    step_fn, state, make_batch = build("full")
    batches = [make_batch(i) for i in range(8)]
    state, loss = step_fn(state, *batches[0], True)
    jax.block_until_ready(loss)
    state, loss = step_fn(state, *batches[1], False)
    jax.block_until_ready(loss)
    t0 = time.time()
    for i in range(n_steps):
        state, loss = step_fn(state, *batches[i % 8], i % 6 == 5)
    float(jax.device_get(loss))
    ms = (time.time() - t0) / n_steps * 1e3
    print(f"mix(5:1): {ms:.1f} ms/step ({4096/ms*1e3:.0f} rays/s)")


if __name__ == "__main__":
    which = sys.argv[1:] or ["full", "noprop", "frozen_grids", "no_gathers",
                             "no_aux_losses", "fwd_only"]
    for a in which:
        measure(a)
