"""Dense per-pixel SIFT-like descriptors (conv formulation).

The reference's "dense" mode creates one keypoint per pixel and runs SIFT
compute on all of them (/root/reference/SfM-GMS/SfM-GMS/DisparityUtil.cpp:125-133)
— at 450x375 that is ~169k keypoints, at 1080p ~2M. A per-keypoint gather
formulation would drown in scatter/gather; instead dense SIFT is exactly a
stack of convolutions (vlfeat dsift-style), which XLA maps straight onto the
TPU conv units:

  1. gradients -> soft-assign magnitude into 8 orientation bins (VPU),
  2. spatial pooling of each bin plane with a separable triangular (bilinear)
     filter = the descriptor's trilinear spatial weighting (conv),
  3. sample the 4x4 cell grid at per-pixel offsets = 16 shifted slices,
  4. concatenate -> (H, W, 128), normalize + clip like sparse SIFT.

Descriptors are upright (angle 0), matching the reference's dense keypoints
(size=1, angle unset).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_N_ORI = 8


def _triangular_kernel(cell: int) -> jnp.ndarray:
    """1-D triangular (bilinear pooling) filter of support 2*cell-1."""
    r = jnp.arange(1, cell + 1, dtype=jnp.float32)
    half = r / cell
    k = jnp.concatenate([half, half[::-1][1:]])
    return k / jnp.max(k)


def _conv1d(x, k, axis):
    """Depthwise 1-D convolution along axis (0=rows, 1=cols), SAME, zero pad."""
    r = (k.shape[0] - 1) // 2
    if axis == 0:
        kern = k.reshape(1, 1, -1, 1)
        pads = ((r, r), (0, 0))
    else:
        kern = k.reshape(1, 1, 1, -1)
        pads = ((0, 0), (r, r))
    xp = jnp.pad(x, ((0, 0),) + pads)
    return jax.lax.conv_general_dilated(
        xp[:, None], kern, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        # f32 taps: TPU's default bf16 conv precision would put ~0.4% noise
        # on the pooled orientation planes (see scalespace.py precision note)
        precision=jax.lax.Precision.HIGHEST,
    )[:, 0]


@functools.partial(jax.jit, static_argnames=("cell", "stride"))
def dense_sift_descriptors(img, cell: int = 4, stride: int = 1):
    """Dense descriptors for (H, W) grayscale in [0,1].

    cell: spatial bin width in pixels (descriptor spans 4*cell pixels).
    Returns (H', W', 128) float32, H' = ceil(H/stride).
    """
    img = jnp.asarray(img, jnp.float32)
    h, w = img.shape
    dx = jnp.zeros_like(img).at[:, 1:-1].set((img[:, 2:] - img[:, :-2]) * 0.5)
    dy = jnp.zeros_like(img).at[1:-1, :].set((img[2:, :] - img[:-2, :]) * 0.5)
    mag = jnp.sqrt(dx * dx + dy * dy)
    ang = jnp.arctan2(dy, dx)  # [-pi, pi)

    # soft orientation binning
    binf = jnp.mod(ang, 2 * jnp.pi) / (2 * jnp.pi) * _N_ORI
    b0 = jnp.floor(binf).astype(jnp.int32)
    f = binf - b0
    planes = []
    for o in range(_N_ORI):
        wgt = jnp.where(b0 == o, 1.0 - f, 0.0) + jnp.where(
            jnp.mod(b0 + 1, _N_ORI) == o, f, 0.0
        )
        planes.append(mag * wgt)
    ori = jnp.stack(planes)  # (8, H, W)

    # spatial pooling: triangular filter = per-cell bilinear weighting
    k = _triangular_kernel(cell)
    pooled = _conv1d(_conv1d(ori, k, 0), k, 1)  # (8, H, W)

    # sample the 4x4 grid of cell centers around each pixel
    offs = [(-1.5 + i) * cell for i in range(4)]
    feats = []
    for oy in offs:
        for ox in offs:
            shifted = jnp.roll(jnp.roll(pooled, -int(round(oy)), axis=1), -int(round(ox)), axis=2)
            feats.append(shifted)
    desc = jnp.stack(feats, axis=-1)          # (8, H, W, 16)
    desc = jnp.transpose(desc, (1, 2, 3, 0))  # (H, W, 16, 8)
    desc = desc.reshape(h, w, 16 * _N_ORI)

    if stride > 1:
        desc = desc[::stride, ::stride]
    norm = jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-6)
    desc = jnp.minimum(desc / norm, 0.2)
    norm = jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-6)
    return desc / norm
