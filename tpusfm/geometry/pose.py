"""Relative pose from an essential matrix (cv::recoverPose equivalent,
/root/reference/SfM-GMS/SfM-GMS/SfMUtil.cpp:45): the four (R, t) candidates
from the SVD decomposition are disambiguated by a batched cheirality vote —
all candidate/point triangulations evaluated at once."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpusfm.geometry.triangulate import triangulate_pair, depths

_W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])


def pose_candidates(E):
    """The four (R, t) decompositions of E."""
    u, _, vt = jnp.linalg.svd(E)
    # ensure proper rotations
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    R1 = u @ _W @ vt
    R2 = u @ _W.T @ vt
    t = u[:, 2]
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def recover_pose(E, x1n, x2n, mask):
    """Cheirality-checked pose: returns (R, t, inlier_mask) where inliers are
    the input mask points with positive depth in both views."""
    Rs, ts = pose_candidates(E)

    def votes(R, t):
        X = triangulate_pair(R, t, x1n, x2n)
        d1 = X[:, 2]
        d2 = depths(R, t, X)
        ok = (d1 > 0) & (d2 > 0) & mask & (jnp.abs(X) < 50.0).all(axis=1)
        return jnp.sum(ok.astype(jnp.int32)), ok

    counts, oks = jax.vmap(votes)(Rs, ts)
    best = jnp.argmax(counts)
    return Rs[best], ts[best], oks[best]
