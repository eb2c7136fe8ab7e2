"""Host-side image decode/encode + device-side image transforms.

Decode/encode run on the host (PIL); everything downstream is jnp. The
reference uses cv::imread/imwrite, cvtColor, resize, warpAffine
(/root/reference/SfM-GMS/SfM-GMS/main.cpp:19-20,44,114-119). GUI display
(imshow/waitKey) has no TPU-host equivalent; artifacts are written to disk
instead (see tpusfm.viz).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import jax
from functools import partial

try:
    from PIL import Image

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False

# ITU-R BT.601 luma weights — matches cv::cvtColor(COLOR_BGR2GRAY) semantics.
_LUMA = np.array([0.299, 0.587, 0.114], np.float32)


def imread(path: str) -> np.ndarray:
    """Decode an image file to (H, W, 3) float32 RGB in [0, 1]."""
    if not _HAS_PIL:
        raise RuntimeError("PIL unavailable for image decode")
    img = Image.open(path).convert("RGB")
    return np.asarray(img, np.float32) / 255.0


def imread_gray(path: str) -> np.ndarray:
    """Decode to (H, W) float32 grayscale in [0, 1]."""
    rgb = imread(path)
    return rgb @ _LUMA


def imwrite(path: str, img) -> None:
    """Encode (H, W) or (H, W, 3) float in [0,1] or uint8 to PNG/JPEG."""
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = np.clip(arr * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def to_gray(rgb):
    """(..., H, W, 3) RGB -> (..., H, W) grayscale, on device."""
    return jnp.asarray(rgb) @ jnp.asarray(_LUMA)


@partial(jax.jit, static_argnames=("height", "width"))
def resize(img, height: int, width: int):
    """Bilinear resize on device (reference: cv::resize, main.cpp:44)."""
    return jax.image.resize(jnp.asarray(img), (height, width) + jnp.shape(img)[2:], "linear")


@partial(jax.jit, static_argnames=())
def rotate(img, degrees, center=None):
    """Rotate about center, same output size, bilinear, zero fill.

    Equivalent of the reference's getRotationMatrix2D + warpAffine
    (/root/reference/SfM-GMS/SfM-GMS/main.cpp:114-120).
    """
    img = jnp.asarray(img)
    h, w = img.shape[0], img.shape[1]
    if center is None:
        center = ((w - 1) / 2.0, (h - 1) / 2.0)
    cx, cy = center
    theta = jnp.deg2rad(degrees)
    c, s = jnp.cos(theta), jnp.sin(theta)
    # Output pixel (x, y) samples input at the inverse rotation.
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    X, Y = jnp.meshgrid(xs, ys)
    xr = c * (X - cx) + s * (Y - cy) + cx
    yr = -s * (X - cx) + c * (Y - cy) + cy
    return bilinear_sample(img, xr, yr)


def bilinear_sample(img, x, y):
    """Sample img (H, W[, C]) at float coords; zero outside. Shapes of x/y preserved."""
    img = jnp.asarray(img)
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def at(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        if img.ndim == 3:
            valid = valid[..., None]
        return jnp.where(valid, v, 0.0)

    wx0, wx1 = (1 - dx), dx
    wy0, wy1 = (1 - dy), dy
    if img.ndim == 3:
        wx0, wx1, wy0, wy1 = (w_[..., None] for w_ in (wx0, wx1, wy0, wy1))
    return (
        at(y0i, x0i) * wy0 * wx0
        + at(y0i, x0i + 1) * wy0 * wx1
        + at(y0i + 1, x0i) * wy1 * wx0
        + at(y0i + 1, x0i + 1) * wy1 * wx1
    )
