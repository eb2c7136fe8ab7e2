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


def decimate2(x, axis: int):
    """Keep every other element along ``axis`` (pad-to-even + factor-split
    reshape + unit slice — strided slices lower pathologically on TPU, see
    downsample2)."""
    n = x.shape[axis]
    n2 = -(-n // 2)
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, 2 * n2 - n)
    xp = jnp.pad(x, pads)
    shape = xp.shape[:axis] + (n2, 2) + xp.shape[axis + 1:]
    return jax.lax.index_in_dim(xp.reshape(shape), 0, axis + 1, keepdims=False)


def conv1d_slices(x, taps, axis: int, mode: str = "edge"):
    """1-D correlation along ``axis`` as a tap-weighted sum of shifted
    slices — all f32 adds on the VPU.

    On this chip a single-channel NCHW conv_general_dilated at HIGHEST
    precision runs ~30x slower than the identical math as slice-accumulate
    (measured: 25-tap separable blur of a 3024x4032 image, 827 ms conv vs
    26 ms slices, outputs equal to 4e-7) — XLA's TPU conv emitter is built
    for many-channel MXU convs, not C=1 full-precision stencils."""
    taps = np.asarray(taps)
    r = (len(taps) - 1) // 2
    pads = [(0, 0)] * x.ndim
    pads[axis] = (r, r)
    xp = jnp.pad(x, pads, mode=mode)
    n = x.shape[axis]
    acc = None
    for i, w in enumerate(taps):
        if w == 0.0:
            continue
        term = jnp.float32(w) * jax.lax.dynamic_slice_in_dim(xp, i, n, axis)
        acc = term if acc is None else acc + term
    return acc if acc is not None else jnp.zeros_like(x)


def gaussian_blur(img, sigma: float):
    """Separable Gaussian blur of (H, W) or (B, H, W) float32, edge-replicate."""
    if sigma <= 0:
        return img
    k = gaussian_kernel1d(sigma)
    x = conv1d_slices(img, k, img.ndim - 2)
    return conv1d_slices(x, k, img.ndim - 1)


def upsample2_linear(x):
    """Exact 2x bilinear upsample with half-pixel centers — the same weights
    as jax.image.resize(..., "linear") at scale 2 (out[2i] = .25 in[i-1] +
    .75 in[i]; out[2i+1] = .75 in[i] + .25 in[i+1], edges clamped; verified
    to 1 ulp), but as shift-adds instead of the dense (out, in) weight
    matmuls resize lowers to. At the SIFT base-image size those matmuls at
    HIGHEST precision were ~1.4 s/image on chip (scripts/sift_stage_probe.py)
    for what is ~6 VPU ops/pixel of actual work."""

    def up1(a):
        a_prev = jnp.concatenate([a[..., :1], a[..., :-1]], -1)
        a_next = jnp.concatenate([a[..., 1:], a[..., -1:]], -1)
        even = 0.25 * a_prev + 0.75 * a
        odd = 0.75 * a + 0.25 * a_next
        return jnp.stack([even, odd], -1).reshape(*a.shape[:-1], 2 * a.shape[-1])

    x = up1(x)
    return jnp.swapaxes(up1(jnp.swapaxes(x, -1, -2)), -1, -2)


def downsample2(img):
    """Nearest 2x downsample (OpenCV SIFT uses resize INTER_NEAREST between
    octaves): take every other pixel.

    Implemented as pad-to-even + factor-split reshape + unit slice instead
    of ``[..., ::2, ::2]`` — the strided-slice form lowers pathologically
    on TPU (adding one such slice as a program output took the octave-0
    select program from 47 to 412 ms, measured r5)."""
    h, w = img.shape[-2:]
    h2, w2 = -(-h // 2), -(-w // 2)
    pads = [(0, 0)] * (img.ndim - 2) + [(0, 2 * h2 - h), (0, 2 * w2 - w)]
    x = jnp.pad(img, pads)
    x = x.reshape(*img.shape[:-2], h2, 2, w2, 2)
    return x[..., :, 0, :, 0]


def num_octaves(h: int, w: int, max_octaves: int) -> int:
    n = int(round(math.log2(min(h, w)))) - 2
    return max(1, min(max_octaves, n))


def build_octave(base, sigma: float, n_layers: int):
    """One octave: (n_layers+3, H, W) Gaussian stack from ``base`` (already at
    blur ``sigma``), plus the (n_layers+2, H, W) DoG stack.

    Levels are blurred SEQUENTIALLY (level i from level i-1 with the
    incremental sigma) — the same construction cv::SIFT uses. The
    incremental kernels stay small (radius 5..13 vs 5..21 blurring straight
    from base), ~30% fewer taps over the octave, and TPU execution is
    serial anyway so the dependency chain costs nothing."""
    k = 2.0 ** (1.0 / n_layers)
    levels = [base]
    cur = base
    for i in range(1, n_layers + 3):
        # level i at sigma*k^i, from level i-1 at sigma*k^(i-1)
        s = sigma * math.sqrt(max(k ** (2 * i) - k ** (2 * i - 2), 1e-8))
        taps = gaussian_kernel1d(s)
        cur = conv1d_slices(conv1d_slices(cur, taps, 0), taps, 1)
        levels.append(cur)
    g = jnp.stack(levels, axis=0)
    dog = g[1:] - g[:-1]
    return g, dog


def gradients(img_stack):
    """Central-difference gradients of a (L, H, W) stack -> (dx, dy)."""
    dx = jnp.zeros_like(img_stack)
    dy = jnp.zeros_like(img_stack)
    dx = dx.at[:, :, 1:-1].set((img_stack[:, :, 2:] - img_stack[:, :, :-2]) * 0.5)
    dy = dy.at[:, 1:-1, :].set((img_stack[:, 2:, :] - img_stack[:, :-2, :]) * 0.5)
    return dx, dy
