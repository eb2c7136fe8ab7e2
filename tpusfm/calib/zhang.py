"""Camera calibration: Zhang's method + Levenberg-Marquardt refinement.

Replaces cv::calibrateCamera (/root/reference/SfM-GMS/SfM-GMS/main.cpp:61-67):
per-view DLT homographies -> closed-form intrinsics from the absolute-conic
constraints -> extrinsics per view -> joint LM over
(fx, fy, cx, cy, k1, k2, p1, p2, k3, per-view rvec/tvec) with autodiff
Jacobians. The full problem is ~1k residuals and <100 params: one dense
batched solve on device.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpusfm.geometry.projection import project_points, rodrigues_inv
from tpusfm.types import CameraIntrinsics


def board_object_points(rows: int, cols: int) -> np.ndarray:
    """Unit-square grid on z=0, row-major — mirrors the reference's object
    grid (/root/reference/SfM-GMS/SfM-GMS/CalibrationUtil.cpp:13-18)."""
    ys, xs = np.mgrid[0:rows, 0:cols]
    return np.stack([xs.reshape(-1), ys.reshape(-1), np.zeros(rows * cols)], 1).astype(np.float32)


def _homography_dlt(obj_xy, img_xy):
    """DLT homography (normalized) mapping obj plane coords -> pixels."""
    def normalize(p):
        mean = p.mean(0)
        scale = np.sqrt(2.0) / (np.abs(p - mean).mean() + 1e-12)
        T = np.array([[scale, 0, -scale * mean[0]], [0, scale, -scale * mean[1]], [0, 0, 1.0]])
        return (p - mean) * scale, T

    src, Ts = normalize(obj_xy)
    dst, Td = normalize(img_xy)
    n = len(src)
    A = np.zeros((2 * n, 9))
    for i in range(n):
        x, y = src[i]
        u, v = dst[i]
        A[2 * i] = [-x, -y, -1, 0, 0, 0, u * x, u * y, u]
        A[2 * i + 1] = [0, 0, 0, -x, -y, -1, v * x, v * y, v]
    _, _, vt = np.linalg.svd(A)
    H = vt[-1].reshape(3, 3)
    H = np.linalg.inv(Td) @ H @ Ts
    return H / H[2, 2]


def _v_ij(H, i, j):
    return np.array([
        H[0, i] * H[0, j],
        H[0, i] * H[1, j] + H[1, i] * H[0, j],
        H[1, i] * H[1, j],
        H[2, i] * H[0, j] + H[0, i] * H[2, j],
        H[2, i] * H[1, j] + H[1, i] * H[2, j],
        H[2, i] * H[2, j],
    ])


def _intrinsics_from_homographies(Hs):
    """Closed-form K from >=3 homographies (Zhang's B-matrix constraints)."""
    V = []
    for H in Hs:
        V.append(_v_ij(H, 0, 1))
        V.append(_v_ij(H, 0, 0) - _v_ij(H, 1, 1))
    V = np.array(V)
    _, _, vt = np.linalg.svd(V)
    b11, b12, b22, b13, b23, b33 = vt[-1]
    den = b11 * b22 - b12 * b12
    cy = (b12 * b13 - b11 * b23) / den
    lam = b33 - (b13 * b13 + cy * (b12 * b13 - b11 * b23)) / b11
    fx = np.sqrt(abs(lam / b11))
    fy = np.sqrt(abs(lam * b11 / den))
    skew = -b12 * fx * fx * fy / lam
    cx = skew * cy / fx - b13 * fx * fx / lam
    return np.array([[fx, skew, cx], [0, fy, cy], [0, 0, 1.0]])


def _extrinsics_from_h(K, H):
    Kinv = np.linalg.inv(K)
    h1, h2, h3 = H[:, 0], H[:, 1], H[:, 2]
    lam = 1.0 / (np.linalg.norm(Kinv @ h1) + 1e-12)
    r1 = lam * (Kinv @ h1)
    r2 = lam * (Kinv @ h2)
    r3 = np.cross(r1, r2)
    t = lam * (Kinv @ h3)
    R = np.stack([r1, r2, r3], 1)
    # project to SO(3)
    u, _, vt = np.linalg.svd(R)
    R = u @ vt
    if t[2] < 0:
        R[:, :2] *= -1
        t = -t
    return R, t


@functools.partial(jax.jit, static_argnames=("iters",))
def _lm_refine(params0, obj, img, iters: int = 30):
    """LM over packed params: [fx, fy, cx, cy, k1, k2, p1, p2, k3,
    (rvec, tvec) x V]. obj: (N, 3); img: (V, N, 2)."""
    V = img.shape[0]

    def residuals(p):
        K = jnp.array([[p[0], 0.0, p[2]], [0.0, p[1], p[3]], [0.0, 0.0, 1.0]])
        dist = p[4:9]
        def per_view(v):
            rv = jax.lax.dynamic_slice(p, (9 + 6 * v,), (3,))
            tv = jax.lax.dynamic_slice(p, (12 + 6 * v,), (3,))
            return project_points(obj, rv, tv, K, dist) - img[v]
        return jax.vmap(per_view)(jnp.arange(V)).reshape(-1)

    def step(carry, _):
        p, lam = carry
        J = jax.jacfwd(residuals)(p)
        r = residuals(p)
        H = J.T @ J
        g = J.T @ r
        def solve(l):
            return p - jnp.linalg.solve(H + l * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(H.shape[0]), g)
        cost = jnp.sum(r * r)
        p1 = solve(lam)
        c1 = jnp.sum(residuals(p1) ** 2)
        better = c1 < cost
        newp = jnp.where(better, p1, p)
        newlam = jnp.where(better, lam * 0.3, lam * 5.0)
        return (newp, jnp.clip(newlam, 1e-8, 1e6)), c1

    (p, _), costs = jax.lax.scan(step, (params0, jnp.float32(1e-3)), None, length=iters)
    return p, costs


def calibrate_camera(obj_points, img_points, image_size, refine_iters: int = 30):
    """Calibrate from V views of a planar grid.

    obj_points: (N, 3) z=0 board points; img_points: (V, N, 2) pixels.
    Returns (CameraIntrinsics, rvecs (V,3), tvecs (V,3), rms_px).
    """
    obj = np.asarray(obj_points, np.float32)
    img = np.asarray(img_points, np.float32)
    V = img.shape[0]
    Hs = [_homography_dlt(obj[:, :2], img[v]) for v in range(V)]
    K0 = _intrinsics_from_homographies(Hs)
    # guard rails: fall back to a sane default center if Zhang init is wild
    w, h = image_size
    if not (0.2 * w < K0[0, 2] < 0.8 * w) or not np.isfinite(K0).all():
        K0 = np.array([[0.9 * w, 0, w / 2], [0, 0.9 * w, h / 2], [0, 0, 1.0]])
    rts = [_extrinsics_from_h(K0, H) for H in Hs]
    rvecs = np.stack([np.asarray(rodrigues_inv(jnp.asarray(R))) for R, _ in rts])
    tvecs = np.stack([t for _, t in rts])

    params0 = np.concatenate(
        [np.array([K0[0, 0], K0[1, 1], K0[0, 2], K0[1, 2]]), np.zeros(5)]
        + [np.concatenate([rvecs[v], tvecs[v]]) for v in range(V)]
    ).astype(np.float32)

    p, costs = _lm_refine(jnp.asarray(params0), jnp.asarray(obj), jnp.asarray(img), refine_iters)
    p = np.asarray(p)
    K = np.array([[p[0], 0, p[2]], [0, p[1], p[3]], [0, 0, 1.0]], np.float32)
    dist = p[4:9].astype(np.float32)
    rv = p[9:].reshape(V, 6)[:, :3]
    tv = p[9:].reshape(V, 6)[:, 3:]
    n_res = V * obj.shape[0]
    rms = float(np.sqrt(np.asarray(costs)[-1] / n_res))
    intr = CameraIntrinsics(K=jnp.asarray(K), dist=jnp.asarray(dist))
    return intr, rv, tv, rms
