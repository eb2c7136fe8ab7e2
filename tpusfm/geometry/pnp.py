"""Perspective-n-Point with fixed-budget RANSAC (new capability: the
reference is two-view only; PnP registers additional views for the
multi-view pipeline demanded by the north star, SURVEY.md §2.4).

Minimal solver: 6-point DLT for P = [R|t] on normalized coords, with the
rotation re-projected onto SO(3) by orthogonal Procrustes. Hypotheses are
solved/scored as one batched vmap, then refined by a fixed-iteration
Gauss-Newton on the inliers.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpusfm.geometry.projection import rodrigues, rodrigues_inv


def _dlt_pnp(X, xn, w=None):
    """DLT pose from >=6 3D-2D correspondences (normalized coords).

    X: (N, 3), xn: (N, 2). Returns (R, t). Hartley-normalizes the 3D points
    (center + isotropic scale) before the SVD — essential in f32 when the
    point cloud is anisotropic or has far-depth tails."""
    n = X.shape[0]
    Xm = jnp.mean(X, axis=0)
    Xs = jnp.mean(jnp.linalg.norm(X - Xm, axis=1)) / jnp.sqrt(3.0) + 1e-9
    X = (X - Xm) / Xs
    ones = jnp.ones((n, 1))
    Xh = jnp.concatenate([X, ones], axis=1)  # (N, 4)
    zeros = jnp.zeros_like(Xh)
    r1 = jnp.concatenate([Xh, zeros, -xn[:, :1] * Xh], axis=1)  # (N, 12)
    r2 = jnp.concatenate([zeros, Xh, -xn[:, 1:2] * Xh], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)  # (2N, 12)
    if w is not None:
        A = A * jnp.concatenate([w, w])[:, None]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    P = vt[-1].reshape(3, 4)

    def from_P(Pm):
        M = Pm[:, :3]
        # scale & orthogonalize: procrustes projection of M onto SO(3)
        u, s, vt2 = jnp.linalg.svd(M)
        d = jnp.sign(jnp.linalg.det(u @ vt2))
        R = u @ jnp.diag(jnp.array([1.0, 1.0, d])) @ vt2
        t = Pm[:, 3] * 3.0 / jnp.maximum(jnp.sum(s), 1e-12)
        return R, t

    # P is determined only up to sign; pick the one putting points in front.
    R1, t1 = from_P(P)
    R2, t2 = from_P(-P)
    z1 = jnp.sum(((X @ R1.T + t1)[:, 2] > 0).astype(jnp.int32))
    z2 = jnp.sum(((X @ R2.T + t2)[:, 2] > 0).astype(jnp.int32))
    take1 = z1 >= z2
    R = jnp.where(take1, R1, R2)
    t = jnp.where(take1, t1, t2)
    # denormalize: x ~ R((X-Xm)/Xs) + t  =>  t_true = Xs*t - R@Xm (R unchanged)
    t = Xs * t - R @ Xm
    return R, t


def _reproj_err2(R, t, X, xn):
    Xc = X @ R.T + t
    z = Xc[:, 2]
    proj = Xc[:, :2] / jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)[:, None]
    err = jnp.sum((proj - xn) ** 2, axis=1)
    return jnp.where(z > 0, err, 1e9)


@functools.partial(jax.jit, static_argnames=("n_hypotheses", "gn_iters"))
def pnp_ransac(
    X,
    xn,
    mask,
    focal,
    threshold_px: float = 2.0,
    n_hypotheses: int = 256,
    gn_iters: int = 10,
    seed: int = 0,
):
    """RANSAC + Gauss-Newton PnP.

    X: (N, 3) world points; xn: (N, 2) normalized observations; mask validity.
    Returns (rvec, tvec, inlier_mask, n_inliers)."""
    n = X.shape[0]
    key = jax.random.PRNGKey(seed)
    probs = mask.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    keys = jax.random.split(key, n_hypotheses)
    idx = jax.vmap(
        lambda k: jax.random.choice(k, n, shape=(6,), replace=False, p=probs)
    )(keys)

    Rs, ts = jax.vmap(lambda i: _dlt_pnp(X[i], xn[i]))(idx)

    # Per-hypothesis GN polish on its own minimal sample: the raw 6-point DLT
    # is too noise-sensitive to score well; three GN steps on the sample give
    # P3P-like accuracy while staying one big vmap.
    def polish(R0, t0, i):
        Xi = X[i]
        xi = xn[i]
        p0 = jnp.concatenate([rodrigues_inv(R0), t0])

        def res(p):
            Rm = rodrigues(p[:3])
            Xc = Xi @ Rm.T + p[3:]
            z = jnp.where(jnp.abs(Xc[:, 2]) > 1e-9, Xc[:, 2], 1e-9)
            return ((Xc[:, :2] / z[:, None]) - xi).reshape(-1)

        def gstep(p, _):
            J = jax.jacfwd(res)(p)
            r = res(p)
            H = J.T @ J + jnp.eye(6) * 1e-6
            return p - jnp.linalg.solve(H, J.T @ r), None

        p, _ = jax.lax.scan(gstep, p0, None, length=3)
        p = jnp.nan_to_num(p)
        return rodrigues(p[:3]), p[3:]

    Rs, ts = jax.vmap(polish)(Rs, ts, idx)
    thr = (threshold_px / focal) ** 2

    def score(R, t):
        err = _reproj_err2(R, t, X, xn)
        inl = (err < thr) & mask
        return jnp.sum(inl.astype(jnp.int32)), inl

    counts, inls = jax.vmap(score)(Rs, ts)
    best = jnp.argmax(counts)
    R0, t0 = Rs[best], ts[best]
    inl0 = inls[best]

    # Gauss-Newton refinement on inliers over (rvec, t).
    rvec0 = rodrigues_inv(R0)
    params0 = jnp.concatenate([rvec0, t0])

    def residuals(p):
        R = rodrigues(p[:3])
        Xc = X @ R.T + p[3:]
        z = jnp.where(jnp.abs(Xc[:, 2]) > 1e-9, Xc[:, 2], 1e-9)
        proj = Xc[:, :2] / z[:, None]
        r = (proj - xn) * inl0[:, None]
        return r.reshape(-1)

    def gn_step(p, _):
        J = jax.jacfwd(residuals)(p)  # (2N, 6)
        r = residuals(p)
        H = J.T @ J + jnp.eye(6) * 1e-8
        g = J.T @ r
        return p - jnp.linalg.solve(H, g), None

    params, _ = jax.lax.scan(gn_step, params0, None, length=gn_iters)
    R = rodrigues(params[:3])
    t = params[3:]
    err = _reproj_err2(R, t, X, xn)
    inl = (err < thr) & mask
    # keep refinement only if it didn't lose inliers
    better = jnp.sum(inl.astype(jnp.int32)) >= counts[best]
    rvec = jnp.where(better, params[:3], rvec0)
    tvec = jnp.where(better, t, t0)
    inlier = jnp.where(better, inl, inl0)
    return rvec, tvec, inlier, jnp.sum(inlier.astype(jnp.int32))
