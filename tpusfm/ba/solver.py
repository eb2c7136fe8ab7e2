"""Bundle adjustment: Levenberg-Marquardt with Schur-complement reduction.

The flagship numerical component demanded by the north star (reference has
no BA — two-view only, /root/reference/SfM-GMS/SfM-GMS/SfMUtil.cpp). Design
for TPU:

* Per-observation residuals and their (2,6)/(2,3) camera/point Jacobian
  blocks come from one vmapped jacfwd — no sparse matrix assembly.
* Camera blocks U, point blocks V, cross blocks W, and gradients are
  segment-sums over the observation axis — scatter-adds on the VPU. W is
  kept dense as (P, V, 6, 3): with O(10) keyframe views this is the natural
  TPU layout (zero-padded, regular), not a CSR emulation.
* Schur complement S = U - W V^-1 W^T and the reduced camera solve are
  batched einsums + one small dense solve; point updates back-substitute in
  closed form (batched 3x3 inverses).
* The LM loop is a lax.scan with accept/reject damping — fixed iteration
  count, no data-dependent control flow.

The observation segment-sums are exactly the quantities that distribute
across chips with a psum (tpusfm/dist/sharded_ba.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpusfm.ba.tracks import Observations
from tpusfm.config import BaConfig
from tpusfm.geometry.projection import project_points


def _residual_one(cam6, pt3, xy, K, dist):
    return project_points(pt3, cam6[:3], cam6[3:], K, dist) - xy


def _huber_weight(r2, delta):
    """IRLS sqrt-weight for the Huber loss on squared residual norm r2."""
    rn = jnp.sqrt(jnp.maximum(r2, 1e-12))
    return jnp.where(rn <= delta, 1.0, jnp.sqrt(delta / rn))


def compute_cost(cams, points, obs: Observations, K, dist, delta):
    r = jax.vmap(lambda c, p, x: _residual_one(cams[c], points[p], x, K, dist))(
        obs.cam, obs.pt, obs.xy
    )
    r2 = jnp.sum(r * r, axis=1)
    rn = jnp.sqrt(jnp.maximum(r2, 1e-12))
    huber = jnp.where(rn <= delta, 0.5 * r2, delta * (rn - 0.5 * delta))
    return jnp.sum(jnp.where(obs.mask, huber, 0.0))


def build_normal_blocks(cams, points, obs: Observations, K, dist, delta):
    """Accumulate (U, Vp, W, g_c, g_p, cost) for the current linearization.

    Shapes: U (V,6,6); Vp (P,3,3); W (P,V,6,3); g_c (V,6); g_p (P,3).
    This is the obs-parallel part: every output is a segment-sum over
    observations (psum-reducible across shards)."""
    Vn = cams.shape[0]
    Pn = points.shape[0]

    def one(cam_id, pt_id, xy, m):
        params = jnp.concatenate([cams[cam_id], points[pt_id]])

        def f(q):
            return _residual_one(q[:6], q[6:], xy, K, dist)

        J = jax.jacfwd(f)(params)  # (2, 9)
        r = f(params)
        w = _huber_weight(jnp.sum(r * r), delta) * m.astype(jnp.float32)
        # masked/degenerate rows must contribute exact zeros, not NaN * 0
        A = jnp.nan_to_num(J[:, :6]) * w
        B = jnp.nan_to_num(J[:, 6:]) * w
        r = jnp.nan_to_num(r) * w
        return A, B, r

    A, B, r = jax.vmap(one)(obs.cam, obs.pt, obs.xy, obs.mask)

    AtA = jnp.einsum("oik,oil->okl", A, A)            # (O,6,6)
    BtB = jnp.einsum("oik,oil->okl", B, B)            # (O,3,3)
    AtB = jnp.einsum("oik,oil->okl", A, B)            # (O,6,3)
    Atr = jnp.einsum("oik,oi->ok", A, r)              # (O,6)
    Btr = jnp.einsum("oik,oi->ok", B, r)              # (O,3)

    U = jnp.zeros((Vn, 6, 6)).at[obs.cam].add(AtA)
    Vp = jnp.zeros((Pn, 3, 3)).at[obs.pt].add(BtB)
    W = jnp.zeros((Pn, Vn, 6, 3)).at[obs.pt, obs.cam].add(AtB)
    g_c = jnp.zeros((Vn, 6)).at[obs.cam].add(-Atr)
    g_p = jnp.zeros((Pn, 3)).at[obs.pt].add(-Btr)
    cost = compute_cost(cams, points, obs, K, dist, delta)
    return U, Vp, W, g_c, g_p, cost


def schur_solve(U, Vp, W, g_c, g_p, lam, n_fixed_cams: int):
    """One damped Schur step: returns (delta_cams (V,6), delta_points (P,3))."""
    Vn = U.shape[0]
    Pn = Vp.shape[0]
    # LM damping on block diagonals (multiplicative, Marquardt style)
    Ud = U + lam * jnp.einsum("vij,ij->vij", U, jnp.eye(6)) + 1e-8 * jnp.eye(6)
    Vd = Vp + lam * jnp.einsum("pij,ij->pij", Vp, jnp.eye(3)) + 1e-8 * jnp.eye(3)
    Vinv = jnp.linalg.inv(Vd)                          # (P,3,3)

    M = jnp.einsum("pvia,pab->pvib", W, Vinv)          # (P,V,6,3)
    S = -jnp.einsum("pvib,pwjb->viwj", M, W)           # (V,6,V,6)
    S = S.at[jnp.arange(Vn), :, jnp.arange(Vn), :].add(Ud)
    rhs = g_c - jnp.einsum("pvib,pb->vi", M, g_p)      # (V,6)

    # gauge fixing: freeze the first n_fixed_cams cameras
    free = (jnp.arange(Vn) >= n_fixed_cams).astype(jnp.float32)
    Sf = S * free[:, None, None, None] * free[None, None, :, None]
    Sf = Sf.reshape(Vn * 6, Vn * 6)
    fixed_diag = jnp.repeat(1.0 - free, 6)
    Sf = Sf + jnp.diag(fixed_diag)
    rhsf = (rhs * free[:, None]).reshape(-1)

    dc = jnp.linalg.solve(Sf, rhsf).reshape(Vn, 6)
    dc = dc * free[:, None]

    dp = jnp.einsum("pab,pb->pa", Vinv, g_p - jnp.einsum("pvib,vi->pb", W, dc))
    return dc, dp


@functools.partial(jax.jit, static_argnames=("cfg", "n_fixed_cams"))
def bundle_adjust(cams, points, obs: Observations, K, dist,
                  cfg: BaConfig = BaConfig(), n_fixed_cams: int = 1):
    """LM bundle adjustment. cams (V,6) [rvec|tvec]; points (P,3).

    Returns (cams, points, costs (iters,)) — costs for convergence logging.
    """
    delta = jnp.float32(cfg.huber_delta)

    def step(carry, _):
        cams, points, lam = carry
        U, Vp, W, g_c, g_p, cost = build_normal_blocks(cams, points, obs, K, dist, delta)
        dc, dp = schur_solve(U, Vp, W, g_c, g_p, lam, n_fixed_cams)
        new_cams = cams + dc
        new_points = points + dp
        new_cost = compute_cost(new_cams, new_points, obs, K, dist, delta)
        accept = new_cost < cost
        cams = jnp.where(accept, new_cams, cams)
        points = jnp.where(accept, new_points, points)
        lam = jnp.where(accept, lam * cfg.lambda_down, lam * cfg.lambda_up)
        lam = jnp.clip(lam, 1e-9, 1e6)
        return (cams, points, lam), jnp.where(accept, new_cost, cost)

    (cams, points, _), costs = jax.lax.scan(
        step, (cams, points, jnp.float32(cfg.init_lambda)), None, length=cfg.max_iters
    )
    return cams, points, costs


def mean_reprojection_error(cams, points, obs: Observations, K, dist):
    """Mean pixel reprojection error over valid observations (the parity
    metric vs the reference reconstructions)."""
    r = jax.vmap(lambda c, p, x: _residual_one(cams[c], points[p], x, K, dist))(
        obs.cam, obs.pt, obs.xy
    )
    e = jnp.sqrt(jnp.sum(r * r, axis=1))
    n = jnp.maximum(jnp.sum(obs.mask.astype(jnp.float32)), 1.0)
    return jnp.sum(jnp.where(obs.mask, e, 0.0)) / n
