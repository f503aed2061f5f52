"""Image quality metrics: PSNR / SSIM / LPIPS.

Replaces the reference's torchmetrics instances
(ref: models/kplanes.py:291-294) with pure-JAX implementations.  LPIPS
requires pretrained perceptual weights; with no network egress we load
them from a local path when provided (SNT_LPIPS_WEIGHTS env var pointing
at a .npz of AlexNet conv features + linear heads) and return NaN
otherwise — mirroring how the reference's DynMetric degrades to NaN
without detections (ref: utils/dynmetric.py:79-80).
"""
from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio (matches torchmetrics with data_range=1)."""
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return jnp.outer(g, g)


@partial(jax.jit, static_argnames=("data_range",))
def ssim(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Structural similarity with the standard 11x11 sigma=1.5 Gaussian
    window (matches torchmetrics.functional.structural_similarity_index
    _measure defaults, used at ref: models/kplanes.py:473).

    The mean is taken over VALID interior windows only. This equals
    torchmetrics' behavior: it reflect-pads by (k-1)//2, convolves, then
    crops that same border from the SSIM map before averaging — leaving
    exactly the windows fully inside the original image.

    The window convolutions run at Precision.HIGHEST: on TPU the default
    conv precision is bf16, and the variance terms E[x^2] - mu^2 cancel
    catastrophically at bf16 (values ~1, variances ~1e-4) — measured
    SSIM errors up to 0.2 absolute on flat fixtures, including
    impossible values > 1.  f32-exact convs restore CPU/TPU agreement
    to ~1e-6 (tests/test_ops_numerics.py pins a float64 reference).

    Args:
        pred/target: [H, W, C] in [0, data_range].
    """
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    kernel = _gaussian_kernel()[:, :, None, None]  # [11, 11, 1, 1]

    def filt(x):
        # [H, W, C] -> depthwise valid conv
        x = jnp.transpose(x, (2, 0, 1))[:, None]  # [C, 1, H, W]
        out = jax.lax.conv_general_dilated(
            x,
            jnp.transpose(kernel, (3, 2, 0, 1)),  # [1, 1, 11, 11]
            window_strides=(1, 1),
            padding="VALID",
            precision=jax.lax.Precision.HIGHEST,
        )
        return out[:, 0]  # [C, H', W']

    mu_x = filt(pred)
    mu_y = filt(target)
    mu_xx = filt(pred * pred) - mu_x**2
    mu_yy = filt(target * target) - mu_y**2
    mu_xy = filt(pred * target) - mu_x * mu_y

    num = (2 * mu_x * mu_y + c1) * (2 * mu_xy + c2)
    den = (mu_x**2 + mu_y**2 + c1) * (mu_xx + mu_yy + c2)
    return jnp.mean(num / den)


# ---------------------------------------------------------------------------
# LPIPS (AlexNet backbone) — weights loaded from a local npz when available
# ---------------------------------------------------------------------------

_ALEX_LAYERS = [
    # (out_ch, kernel, stride, pad)
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}  # maxpool after conv0 and conv1 (and features taken pre-pool)

_lpips_weights_cache: Optional[dict] = None


def _load_lpips_weights() -> Optional[dict]:
    global _lpips_weights_cache
    if _lpips_weights_cache is not None:
        return _lpips_weights_cache
    path = os.environ.get("SNT_LPIPS_WEIGHTS", "")
    if not path or not os.path.exists(path):
        return None
    data = np.load(path)
    _lpips_weights_cache = {k: jnp.asarray(v) for k, v in data.items()}
    return _lpips_weights_cache


def lpips(pred: jnp.ndarray, target: jnp.ndarray) -> float:
    """LPIPS(AlexNet); returns NaN when no local weights are available.

    Expects [H, W, 3] images in [0, 1].
    """
    weights = _load_lpips_weights()
    if weights is None:
        return float("nan")

    shift = jnp.asarray([-0.030, -0.088, -0.188])
    scale = jnp.asarray([0.458, 0.448, 0.450])

    def features(img):
        x = (img * 2.0 - 1.0 - shift) / scale
        x = jnp.transpose(x, (2, 0, 1))[None]  # [1, 3, H, W]
        feats = []
        for i in range(len(_ALEX_LAYERS)):
            w = weights[f"conv{i}_w"]  # [out, in, k, k]
            b = weights[f"conv{i}_b"]
            _, _, _, pad = (None, None, None, _ALEX_LAYERS[i][3])
            stride = _ALEX_LAYERS[i][2]
            x = jax.lax.conv_general_dilated(
                x, w, (stride, stride), [(pad, pad), (pad, pad)]
            ) + b[None, :, None, None]
            x = jax.nn.relu(x)
            feats.append(x)
            if i in _POOL_AFTER:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
                )
        return feats

    f0 = features(pred)
    f1 = features(target)
    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), 1e-10)
        b = b / jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), 1e-10)
        diff = (a - b) ** 2
        lin = weights[f"lin{i}_w"]  # [1, C, 1, 1]
        total += jnp.mean(jnp.sum(diff * lin, axis=1))
    return float(total)


def all_image_metrics(pred: np.ndarray, target: np.ndarray) -> dict:
    """psnr/ssim/lpips for one [H, W, 3] image pair."""
    p = jnp.asarray(pred)
    t = jnp.asarray(target)
    return {
        "psnr": float(psnr(p, t)),
        "ssim": float(ssim(p, t)),
        "lpips": lpips(p, t),
    }
