"""Batched searchsorted for TPU.

``jax.vmap(jnp.searchsorted)`` lowers to per-element binary-search loops
that compile slowly and run as scalar code.  On TPU the idiomatic form is
a branchless comparison reduction on the VPU: count how many bin edges
lie below each query.  O(K*Q) elementwise work instead of O(Q log K)
scalar work — a large win for the K, Q <= few hundred used by the PDF
resampler (ref: ray_samplers.py:342), the interlevel loss's ``outer``
(ref: losses.py:67-69), and the median renderers (ref: renderers.py:317).
"""
from __future__ import annotations

import jax.numpy as jnp


def searchsorted(sorted_seq: jnp.ndarray, values: jnp.ndarray, side: str = "left") -> jnp.ndarray:
    """Row-wise searchsorted: for each batch row, the insertion indices of
    ``values`` into ``sorted_seq``.

    Args:
        sorted_seq: [..., K] row-wise sorted.
        values: [..., Q].
    Returns:
        [..., Q] int32 indices in [0, K].
    """
    if side == "right":
        cmp = sorted_seq[..., None, :] <= values[..., :, None]
    else:
        cmp = sorted_seq[..., None, :] < values[..., :, None]
    return jnp.sum(cmp, axis=-1, dtype=jnp.int32)


def searchsorted_scalar(sorted_seq: jnp.ndarray, value: float, side: str = "left") -> jnp.ndarray:
    """[..., K] vs a scalar query -> [...] indices."""
    if side == "right":
        cmp = sorted_seq <= value
    else:
        cmp = sorted_seq < value
    return jnp.sum(cmp, axis=-1, dtype=jnp.int32)
