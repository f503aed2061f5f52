"""Functional MLPs with a bf16 compute policy.

TPU-native replacement for tiny-cuda-nn's FullyFusedMLP / CutlassMLP
(N3 in SURVEY §2.1; used by every tcnn-backed reference field).  Instead
of hand-fused CUDA, layers are plain matmuls sized for the MXU: params are
kept in fp32 (master weights), matmuls run in bfloat16 with fp32
accumulation — replacing the reference's AMP + GradScaler
(ref: engine/trainer.py:382-409) with a static precision policy.

"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Params = dict


def init_mlp(
    rng: jax.Array,
    in_dim: int,
    hidden_dim: int,
    num_hidden_layers: int,
    out_dim: int,
) -> Params:
    """Initialize an MLP with ``num_hidden_layers`` hidden layers.

    ``num_hidden_layers=0`` is a single linear map (the reference's
    linear-decoder sigma net, kplanes_field.py:236-246).  Weight init is
    torch.nn.Linear's kaiming-uniform(U(-1/sqrt(fan_in), 1/sqrt(fan_in)))
    so scale statistics match the reference stack.
    """
    dims = [in_dim] + [hidden_dim] * num_hidden_layers + [out_dim]
    ws, bs = [], []
    for i in range(len(dims) - 1):
        rng, wkey, bkey = jax.random.split(rng, 3)
        bound = 1.0 / jnp.sqrt(dims[i])
        ws.append(
            jax.random.uniform(wkey, (dims[i], dims[i + 1]), jnp.float32, -bound, bound)
        )
        bs.append(
            jax.random.uniform(bkey, (dims[i + 1],), jnp.float32, -bound, bound)
        )
    return {"w": ws, "b": bs}


def mlp_apply(
    params: Params,
    x: jnp.ndarray,
    activation: Optional[str] = "relu",
    output_activation: Optional[str] = None,
    compute_dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """Apply an MLP; matmuls in ``compute_dtype``, accumulation in fp32.

    Args:
        x: [..., in_dim].
        activation: hidden activation ("relu" | "none").
        output_activation: "sigmoid" | "relu" | None.
    Returns:
        [..., out_dim] float32.
    """
    h = x.astype(compute_dtype)
    n = len(params["w"])
    for i, (w, b) in enumerate(zip(params["w"], params["b"])):
        h = (
            jnp.dot(h, w.astype(compute_dtype), preferred_element_type=jnp.float32)
            + b
        )
        is_last = i == n - 1
        act = output_activation if is_last else activation
        if act == "relu":
            h = jax.nn.relu(h)
        elif act == "sigmoid":
            h = jax.nn.sigmoid(h)
        elif act in (None, "none"):
            pass
        else:
            raise ValueError(f"unknown activation {act}")
        if not is_last:
            h = h.astype(compute_dtype)
    return h.astype(jnp.float32)


def num_params(params: Params) -> int:
    return sum(int(w.size) for w in params["w"]) + sum(int(b.size) for b in params["b"])
