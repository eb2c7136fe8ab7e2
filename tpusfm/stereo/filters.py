"""Image filters for the stereo/portrait path: integral-image box filter,
bisection median blur, morphological dilation.

Replaces cv::medianBlur(15) / cv::dilate / the averaging kernel in
createPortraitMode (/root/reference/SfM-GMS/SfM-GMS/DisparityUtil.cpp:330-395).
The median is computed by an 8-step intensity bisection with box-filter
counts — exact for 8-bit data, and each step is two cumsums (VPU-friendly),
instead of per-pixel sorting networks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def box_filter(img, radius: int):
    """Sum over a (2r+1)^2 window via integral images; zero-padded edges.

    img: (..., H, W)."""
    r = radius
    x = jnp.pad(img, [(0, 0)] * (img.ndim - 2) + [(r + 1, r), (r + 1, r)])
    c = jnp.cumsum(jnp.cumsum(x, axis=-1), axis=-2)
    k = 2 * r + 1
    return (
        c[..., k:, k:] - c[..., :-k, k:] - c[..., k:, :-k] + c[..., :-k, :-k]
    )


@functools.partial(jax.jit, static_argnames=("radius", "levels"))
def median_blur(img, radius: int = 7, levels: int = 256):
    """Median filter over a (2r+1)^2 window for [0,1] images.

    Histogram formulation: intensities quantized to ``levels``; a scan over
    levels accumulates per-pixel box-filtered counts and latches the first
    level whose cumulative window count passes half the window — every step
    is two cumsums on the VPU, no per-pixel sorting. Exact for 8-bit data at
    levels=256."""
    q = jnp.floor(jnp.clip(jnp.asarray(img), 0.0, 1.0) * (levels - 1) + 0.5)
    chan = q.ndim == 3
    if chan:
        q = jnp.moveaxis(q, -1, 0)  # (C, H, W)
    k = 2 * radius + 1
    half = (k * k) // 2

    def body(carry, t):
        found, med = carry
        cnt = box_filter((q <= t).astype(jnp.float32), radius)
        hit = (~found) & (cnt > half)
        med = jnp.where(hit, t, med)
        return (found | hit, med), None

    init = (jnp.zeros_like(q, dtype=bool), jnp.zeros_like(q))
    (_, med), _ = jax.lax.scan(body, init, jnp.arange(levels, dtype=q.dtype))
    out = med / (levels - 1)
    if chan:
        out = jnp.moveaxis(out, 0, -1)
    return out


@functools.partial(jax.jit, static_argnames=("iterations",))
def dilate(mask, iterations: int = 1):
    """Binary 3x3 dilation (cv::dilate default kernel), iterated."""
    m = jnp.asarray(mask, jnp.float32)
    for _ in range(iterations):
        m = jax.lax.reduce_window(m, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
    return m > 0.5


@functools.partial(jax.jit, static_argnames=("iterations",))
def erode(mask, iterations: int = 1):
    m = jnp.asarray(mask, jnp.float32)
    for _ in range(iterations):
        m = jax.lax.reduce_window(m, jnp.inf, jax.lax.min, (3, 3), (1, 1), "SAME")
    return m > 0.5
