"""Essential-matrix estimation: batched minimal solvers inside a fixed-budget
RANSAC (5-point Nister via five_point.py, or linear 8-point).

TPU-native re-design of cv::findEssentialMat(RANSAC, prob=0.7, thr=1.0px)
(/root/reference/SfM-GMS/SfM-GMS/SfMUtil.cpp:39): instead of sequential
hypothesis testing with data-dependent early exit, a fixed batch of
``n_hypotheses`` minimal samples is solved and scored entirely in parallel
(vmap over hypotheses; scoring is one broadcasted Sampson-error evaluation),
then the best model is re-fit on its inliers — pure MXU/VPU work with static
shapes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpusfm.config import RansacConfig
from tpusfm.geometry.five_point import five_point_essential


def _eight_point(x1, x2, w=None):
    """Least-squares essential matrix from >=8 normalized correspondences.

    x1, x2: (N, 2); w: optional (N,) weights. Solves min ||A e|| with the
    epipolar constraint rows a_i = [x2 x1 terms]; enforces rank-2 with equal
    singular values (essential-matrix projection)."""
    ones = jnp.ones_like(x1[:, :1])
    h1 = jnp.concatenate([x1, ones], axis=1)  # (N,3)
    h2 = jnp.concatenate([x2, ones], axis=1)
    # constraint: h2^T E h1 = 0 ; A row = kron(h2, h1)
    A = (h2[:, :, None] * h1[:, None, :]).reshape(-1, 9)
    if w is not None:
        A = A * w[:, None]
    if A.shape[0] >= 9:
        # Economy SVD: with >= 9 rows vt spans all of R^9, so vt[-1] is the
        # least-squares null vector, and it avoids the N x N U factor that
        # made full_matrices=True dominate the 500-row refit. (Not valid for
        # the minimal 8-row system — economy vt then spans only the row
        # space.) Better f32 conditioning than the normal equations.
        _, _, vt = jnp.linalg.svd(A, full_matrices=False)
        E = vt[-1].reshape(3, 3)
    else:
        # Minimal 8-row sample: full SVD so vt covers all of R^9 including
        # the null vector (8x9 operand — the full factors are tiny here, and
        # f32 SVD of A is ~4 orders more accurate than eigh of A^T A).
        _, _, vt = jnp.linalg.svd(A, full_matrices=True)
        E = vt[-1].reshape(3, 3)
    u, s, vt2 = jnp.linalg.svd(E)
    sm = (s[0] + s[1]) * 0.5
    return u @ jnp.diag(jnp.array([sm, sm, 0.0])) @ vt2


def sampson_error(E, x1, x2):
    """Squared Sampson distance of correspondences (N, 2) in normalized coords."""
    ones = jnp.ones_like(x1[:, :1])
    h1 = jnp.concatenate([x1, ones], axis=1)
    h2 = jnp.concatenate([x2, ones], axis=1)
    Ex1 = h1 @ E.T          # (N, 3)
    Etx2 = h2 @ E            # (N, 3)
    num = jnp.sum(h2 * Ex1, axis=1) ** 2
    den = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


@functools.partial(jax.jit, static_argnames=("cfg",))
def find_essential_ransac(x1n, x2n, mask, focal, cfg: RansacConfig = RansacConfig()):
    """RANSAC essential matrix from normalized correspondences.

    x1n, x2n: (N, 2) normalized camera coords; mask: (N,) validity.
    focal: scalar used to convert cfg.threshold_px to normalized units.
    Returns (E, inlier_mask (N,), n_inliers).
    """
    n = x1n.shape[0]
    key = jax.random.PRNGKey(cfg.seed)
    probs = mask.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)

    keys = jax.random.split(key, cfg.n_hypotheses)
    sample_size = 5 if cfg.solver == "five_point" else cfg.sample_size

    def sample_idx(k):
        return jax.random.choice(k, n, shape=(sample_size,), replace=False, p=probs)

    idx = jax.vmap(sample_idx)(keys)               # (H, S)
    s1 = jnp.take(x1n, idx, axis=0)                 # (H, S, 2)
    s2 = jnp.take(x2n, idx, axis=0)

    if cfg.solver == "five_point":
        Es, Evalid = jax.vmap(five_point_essential)(s1, s2)   # (H,10,3,3)
        Es = Es.reshape(-1, 3, 3)
        Evalid = Evalid.reshape(-1)
    else:
        Es = jax.vmap(_eight_point)(s1, s2)         # (H, 3, 3)
        Evalid = jnp.ones(Es.shape[0], bool)

    thr = (cfg.threshold_px / focal) ** 2

    def score(E, ok):
        err = sampson_error(E, x1n, x2n)
        inl = (err < thr) & mask & ok
        return jnp.sum(inl.astype(jnp.int32)), inl

    counts, inls = jax.vmap(score)(Es, Evalid)
    best = jnp.argmax(counts)
    E0 = Es[best]
    inl0 = inls[best]

    # Refit on inliers (two rounds of least-squares re-estimation).
    def refit(E, _):
        err = sampson_error(E, x1n, x2n)
        inl = (err < thr) & mask
        w = inl.astype(jnp.float32)
        E = _eight_point(x1n, x2n, w)
        return E, None

    E1, _ = jax.lax.scan(refit, E0, None, length=2)
    err = sampson_error(E1, x1n, x2n)
    inl1 = (err < thr) & mask
    # Guard: if the refit degraded, keep the RANSAC winner.
    use_refit = jnp.sum(inl1.astype(jnp.int32)) >= jnp.sum(inl0.astype(jnp.int32))
    E = jnp.where(use_refit, E1, E0)
    inl = jnp.where(use_refit, inl1, inl0)
    return E, inl, jnp.sum(inl.astype(jnp.int32))
