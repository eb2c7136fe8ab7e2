"""Linear triangulation, batched.

Covers both reference variants: the hand-written per-point DLT/SVD
(solveTriangulation, /root/reference/SfM-GMS/SfM-GMS/SfMUtil.cpp:93-126) and
cv::triangulatePoints + homogeneous divide (triangulate_OpenCV,
SfMUtil.cpp:128-144) — here one vmapped 4x4 SVD over all points at once.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _dlt_rows(P1, P2, x1, x2):
    """The 4 DLT constraint rows per correspondence -> (N, 4, 4)."""
    return jnp.stack([
        x1[..., 0, None] * P1[2] - P1[0],
        x1[..., 1, None] * P1[2] - P1[1],
        x2[..., 0, None] * P2[2] - P2[0],
        x2[..., 1, None] * P2[2] - P2[1],
    ], axis=-2)


def _dlt_one_svd(P1, P2, x1, x2):
    A = _dlt_rows(P1, P2, x1, x2)
    _, _, vt = jnp.linalg.svd(A)
    X = vt[-1]
    return X[:3] / jnp.where(jnp.abs(X[3]) > 1e-12, X[3], 1e-12)


def triangulate_dlt_svd(P1, P2, x1, x2):
    """Reference DLT via the 4x4 null-space SVD (the estimator the reference
    uses in both its variants). Kept as the oracle for the closed-form path;
    O(N) small SVDs are iterative on TPU and dominate latency."""
    return jax.vmap(lambda a, b: _dlt_one_svd(P1, P2, a, b))(x1, x2)


def triangulate_dlt(P1, P2, x1, x2):
    """Triangulate N correspondences.

    P1, P2: (3, 4) projection matrices. x1, x2: (N, 2) points in the frame of
    the projections (normalized camera coords when P = [R|t]).
    Returns (N, 3) points.

    TPU formulation: instead of the per-point 4x4 null-space SVD (an
    iterative decomposition per point — thousands of tiny sequential QR
    sweeps per pair), fix the homogeneous scale X4=1 and solve the 3x3
    normal equations min ||B X + c||^2 in closed form via the adjugate —
    pure elementwise VPU math, fully batched. Equivalent up to the DLT's
    own algebraic weighting except for points at infinity (X4 ~ 0), which
    downstream cheirality masks discard anyway.
    """
    A = _dlt_rows(P1, P2, x1, x2)               # (N, 4, 4)
    B = A[..., :3]                               # (N, 4, 3)
    c = A[..., 3]                                # (N, 4)
    # G = B^T B (3x3 symmetric), b = -B^T c
    G = jnp.einsum("nij,nik->njk", B, B)
    b = -jnp.einsum("nij,ni->nj", B, c)
    # adjugate solve (Cramer), elementwise
    g00, g01, g02 = G[..., 0, 0], G[..., 0, 1], G[..., 0, 2]
    g11, g12, g22 = G[..., 1, 1], G[..., 1, 2], G[..., 2, 2]
    c00 = g11 * g22 - g12 * g12
    c01 = g02 * g12 - g01 * g22
    c02 = g01 * g12 - g02 * g11
    c11 = g00 * g22 - g02 * g02
    c12 = g01 * g02 - g00 * g12
    c22 = g00 * g11 - g01 * g01
    det = g00 * c00 + g01 * c01 + g02 * c02
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, jnp.inf)
    X = jnp.stack([
        c00 * b[..., 0] + c01 * b[..., 1] + c02 * b[..., 2],
        c01 * b[..., 0] + c11 * b[..., 1] + c12 * b[..., 2],
        c02 * b[..., 0] + c12 * b[..., 1] + c22 * b[..., 2],
    ], axis=-1) * inv_det[..., None]
    return X


def triangulate_pair(R, t, x1n, x2n):
    """Two-view triangulation with canonical P1=[I|0], P2=[R|t]
    (the reference's setup, SfMUtil.cpp:53-59). x*n are normalized coords."""
    P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    P2 = jnp.concatenate([R, t.reshape(3, 1)], axis=1)
    return triangulate_dlt(P1, P2, x1n, x2n)


def depths(R, t, X):
    """Per-point depth in the camera with pose (R, t)."""
    return (X @ R.T + t)[..., 2]
