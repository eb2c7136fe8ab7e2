"""Camera projection, distortion, and rotation parameterizations.

The building blocks under the reference's computeProjMat / calibrateCamera
usage (/root/reference/SfM-GMS/SfM-GMS/SfMUtil.cpp:86-91, main.cpp:61-67),
written as batched, differentiable JAX ops — the same functions feed the
bundle-adjustment residuals (tpusfm.ba).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rodrigues(rvec):
    """Axis-angle (3,) -> rotation matrix (3, 3). Batched via vmap."""
    theta = jnp.linalg.norm(rvec) + 1e-12
    k = rvec / theta
    K = jnp.array([
        [0.0, -k[2], k[1]],
        [k[2], 0.0, -k[0]],
        [-k[1], k[0], 0.0],
    ])
    s, c = jnp.sin(theta), jnp.cos(theta)
    return jnp.eye(3) + s * K + (1.0 - c) * (K @ K)


def rodrigues_inv(R):
    """Rotation matrix (3,3) -> axis-angle (3,)."""
    tr = jnp.trace(R)
    theta = jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0))
    v = jnp.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    s = jnp.maximum(2.0 * jnp.sin(theta), 1e-12)
    axis = v / s
    # near theta=0 fall back to first-order v/2
    return jnp.where(theta < 1e-6, v * 0.5, axis * theta)


def distort(xn, dist):
    """Apply radial/tangential distortion to normalized coords (..., 2).

    dist = (k1, k2, p1, p2, k3), OpenCV model."""
    k1, k2, p1, p2, k3 = (dist[i] for i in range(5))
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    xt = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yt = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([x * radial + xt, y * radial + yt], axis=-1)


def project_points(X, rvec, tvec, K, dist=None):
    """Project world points (..., 3) to pixels (..., 2).

    x_cam = R X + t; pixel = K . distort(x_cam / z). Differentiable in all
    args (the BA residual path)."""
    R = rodrigues(rvec)
    Xc = X @ R.T + tvec
    z = jnp.maximum(Xc[..., 2:3], 1e-9)
    # Clamp to a generous FOV so r^6 distortion terms cannot overflow f32 for
    # degenerate (masked/behind-camera) points — 0 * inf = NaN otherwise.
    xn = jnp.clip(Xc[..., :2] / z, -64.0, 64.0)
    if dist is not None:
        xn = distort(xn, dist)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    sk = K[0, 1]
    u = fx * xn[..., 0] + sk * xn[..., 1] + cx
    v = fy * xn[..., 1] + cy
    return jnp.stack([u, v], axis=-1)


def normalize_pixels(pts, K):
    """Pixels (..., 2) -> normalized camera coords via K^-1 (no undistort)."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    sk = K[0, 1]
    y = (pts[..., 1] - cy) / fy
    x = (pts[..., 0] - cx - sk * y) / fx
    return jnp.stack([x, y], axis=-1)
