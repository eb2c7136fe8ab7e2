"""Gaussian scale-space construction as batched separable convolutions.

The DoG pyramid underlying SIFT (reference calls cv::SIFT which builds this
natively; /root/reference/SfM-GMS/SfM-GMS/FeatureMatchUtil.cpp:9-12). On TPU
the blurs are depthwise 1-D convs that XLA fuses and pipelines; every octave
has a static shape so the whole pyramid lives inside one jit trace.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel1d(sigma: float) -> np.ndarray:
    """Odd-length normalized Gaussian taps, radius ~4 sigma (static)."""
    radius = max(1, int(math.ceil(4.0 * sigma)))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img, sigma: float):
    """Separable Gaussian blur of (H, W) or (B, H, W) float32, edge-replicate."""
    if sigma <= 0:
        return img
    k = jnp.asarray(gaussian_kernel1d(sigma))
    r = (k.shape[0] - 1) // 2
    squeeze = img.ndim == 2
    x = img[None] if squeeze else img
    # rows
    xp = jnp.pad(x, ((0, 0), (r, r), (0, 0)), mode="edge")
    x = jax.lax.conv_general_dilated(
        xp[:, None, :, :], k.reshape(1, 1, -1, 1), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[:, 0]
    # cols
    xp = jnp.pad(x, ((0, 0), (0, 0), (r, r)), mode="edge")
    x = jax.lax.conv_general_dilated(
        xp[:, None, :, :], k.reshape(1, 1, 1, -1), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[:, 0]
    return x[0] if squeeze else x


def downsample2(img):
    """Nearest 2x downsample (OpenCV SIFT uses resize INTER_NEAREST between
    octaves): take every other pixel."""
    return img[..., ::2, ::2]


def num_octaves(h: int, w: int, max_octaves: int) -> int:
    n = int(round(math.log2(min(h, w)))) - 2
    return max(1, min(max_octaves, n))


def build_octave(base, sigma: float, n_layers: int):
    """One octave: (n_layers+3, H, W) Gaussian stack from ``base`` (already at
    blur ``sigma``), plus the (n_layers+2, H, W) DoG stack."""
    k = 2.0 ** (1.0 / n_layers)
    gauss = [base]
    prev_sig = sigma
    for i in range(1, n_layers + 3):
        total = sigma * (k ** i)
        inc = math.sqrt(max(total * total - prev_sig * prev_sig, 1e-8))
        gauss.append(gaussian_blur(gauss[-1], inc))
        prev_sig = total
    g = jnp.stack(gauss)
    dog = g[1:] - g[:-1]
    return g, dog


def gradients(img_stack):
    """Central-difference gradients of a (L, H, W) stack -> (dx, dy)."""
    dx = jnp.zeros_like(img_stack)
    dy = jnp.zeros_like(img_stack)
    dx = dx.at[:, :, 1:-1].set((img_stack[:, :, 2:] - img_stack[:, :, :-2]) * 0.5)
    dy = dy.at[:, 1:-1, :].set((img_stack[:, 2:, :] - img_stack[:, :-2, :]) * 0.5)
    return dx, dy
