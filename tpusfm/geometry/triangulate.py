"""Linear triangulation, batched.

Covers both reference variants: the hand-written per-point DLT/SVD
(solveTriangulation, /root/reference/SfM-GMS/SfM-GMS/SfMUtil.cpp:93-126) and
cv::triangulatePoints + homogeneous divide (triangulate_OpenCV,
SfMUtil.cpp:128-144) — here one vmapped 4x4 SVD over all points at once.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _dlt_one(P1, P2, x1, x2):
    A = jnp.stack([
        x1[0] * P1[2] - P1[0],
        x1[1] * P1[2] - P1[1],
        x2[0] * P2[2] - P2[0],
        x2[1] * P2[2] - P2[1],
    ])
    _, _, vt = jnp.linalg.svd(A)
    X = vt[-1]
    return X[:3] / jnp.where(jnp.abs(X[3]) > 1e-12, X[3], 1e-12)


def triangulate_dlt(P1, P2, x1, x2):
    """Triangulate N correspondences.

    P1, P2: (3, 4) projection matrices. x1, x2: (N, 2) points in the frame of
    the projections (normalized camera coords when P = [R|t]).
    Returns (N, 3) points.
    """
    return jax.vmap(lambda a, b: _dlt_one(P1, P2, a, b))(x1, x2)


def triangulate_pair(R, t, x1n, x2n):
    """Two-view triangulation with canonical P1=[I|0], P2=[R|t]
    (the reference's setup, SfMUtil.cpp:53-59). x*n are normalized coords."""
    P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    P2 = jnp.concatenate([R, t.reshape(3, 1)], axis=1)
    return triangulate_dlt(P1, P2, x1n, x2n)


def depths(R, t, X):
    """Per-point depth in the camera with pose (R, t)."""
    return (X @ R.T + t)[..., 2]
