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

# All pyramid convolutions run at HIGHEST precision: on TPU the default conv
# precision is bfloat16 multiplies, whose ~0.2% error on O(1) pixel values is
# the same magnitude as the DoG signal (differences of adjacent Gaussian
# levels, ~1e-3) — extrema detection then fires on rounding noise and SIFT
# returns garbage keypoints ON CHIP while CPU (always f32) is correct. The
# blurs are a negligible share of pipeline FLOPs, so full precision here is
# free; the MXU-heavy descriptor-distance matmuls keep their fast path.
_PREC = jax.lax.Precision.HIGHEST


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
        dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=_PREC,
    )[:, 0]
    # cols
    xp = jnp.pad(x, ((0, 0), (0, 0), (r, r)), mode="edge")
    x = jax.lax.conv_general_dilated(
        xp[:, None, :, :], k.reshape(1, 1, 1, -1), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=_PREC,
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
    blur ``sigma``), plus the (n_layers+2, H, W) DoG stack.

    All levels are blurred directly from ``base`` as ONE multi-output-channel
    separable conv pair (incremental sigmas composed analytically) — no
    sequential blur chain, so XLA sees a single wide conv instead of
    n_layers+2 dependent ones."""
    k = 2.0 ** (1.0 / n_layers)
    # level i has total blur sigma*k^i; relative to base (already at sigma):
    incs = [
        math.sqrt(max((sigma * k**i) ** 2 - sigma * sigma, 1e-8))
        for i in range(1, n_layers + 3)
    ]
    kernels = [gaussian_kernel1d(s) for s in incs]
    width = max(len(kk) for kk in kernels)
    r = (width - 1) // 2
    K = np.zeros((len(kernels), 1, width), np.float32)
    for i, kk in enumerate(kernels):
        off = (width - len(kk)) // 2
        K[i, 0, off : off + len(kk)] = kk
    Kj = jnp.asarray(K)

    x = base[None, None]  # (1, 1, H, W)
    xp = jnp.pad(x, ((0, 0), (0, 0), (r, r), (0, 0)), mode="edge")
    rows = jax.lax.conv_general_dilated(
        xp, Kj[:, :, :, None], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=_PREC,
    )  # (1, L, H, W) — per-level row blur
    rp = jnp.pad(rows, ((0, 0), (0, 0), (0, 0), (r, r)), mode="edge")
    cols = jax.lax.conv_general_dilated(
        rp, Kj[:, :, None, :].reshape(len(kernels), 1, 1, width), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=_PREC,
        feature_group_count=len(kernels),
    )  # (1, L, H, W) — depthwise per-level col blur
    g = jnp.concatenate([base[None], cols[0]], axis=0)
    dog = g[1:] - g[:-1]
    return g, dog


def gradients(img_stack):
    """Central-difference gradients of a (L, H, W) stack -> (dx, dy)."""
    dx = jnp.zeros_like(img_stack)
    dy = jnp.zeros_like(img_stack)
    dx = dx.at[:, :, 1:-1].set((img_stack[:, :, 2:] - img_stack[:, :, :-2]) * 0.5)
    dy = dy.at[:, 1:-1, :].set((img_stack[:, 2:, :] - img_stack[:, :-2, :]) * 0.5)
    return dx, dy
