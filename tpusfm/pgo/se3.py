"""SE(3) Lie-group operations, batched and autodiff-safe.

Building blocks for the pose-graph optimization layer (tpusfm.pgo.graph) —
a capability beyond the reference (which is two-view only,
/root/reference/SfM-GMS/SfM-GMS/SfMUtil.cpp:4-83). Everything here is
written so that jax.jacfwd through a residual evaluated AT the identity
(the converged pose-graph state) produces finite Jacobians: each
non-smooth branch (arccos at 1, sin theta / theta) uses the double-where
pattern so neither primal nor tangent sees the singular expression.

Poses are (R, t): R (..., 3, 3) rotation, t (..., 3) translation, acting
as x_world = R @ x_local + t. Tangent vectors xi = (omega, v) (..., 6)
with the rotation block first.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """(..., 3) -> skew-symmetric (..., 3, 3)."""
    x, y, z = w[..., 0], w[..., 1], w[..., 2]
    o = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([o, -z, y], -1),
        jnp.stack([z, o, -x], -1),
        jnp.stack([-y, x, o], -1),
    ], -2)


def vee(W):
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], -1)


def _sinc_factors(theta2):
    """Taylor-safe (sin t / t, (1 - cos t) / t^2, (t - sin t) / t^3).

    theta2 may be exactly 0 (identity updates); all three factors and their
    derivatives stay finite there."""
    small = theta2 < 1e-8
    t2 = jnp.where(small, 1.0, theta2)       # safe operand for the big branch
    t = jnp.sqrt(t2)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(t) / t)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(t)) / t2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (t - jnp.sin(t)) / (t2 * t))
    return a, b, c


def so3_exp(w):
    """Axis-angle (..., 3) -> rotation (..., 3, 3), Rodrigues formula."""
    theta2 = jnp.sum(w * w, -1)
    a, b, _ = _sinc_factors(theta2)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R):
    """Rotation (..., 3, 3) -> axis-angle (..., 3).

    Differentiable at the identity (the pose-graph converged state); valid
    for theta < pi - eps (pose-graph residuals live near 0)."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    c = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    small = c > 1.0 - 1e-6
    c_safe = jnp.where(small, 0.0, c)        # keep arccos' grad finite
    theta = jnp.where(small, 0.0, jnp.arccos(c_safe))
    # f = theta / (2 sin theta); Taylor 1/2 + theta^2/12, theta^2 ~ 2(1-c)
    s = jnp.sin(theta)
    f = jnp.where(small, 0.5 + (1.0 - c) / 6.0,
                  theta / jnp.where(small, 1.0, 2.0 * s))
    return vee(R - jnp.swapaxes(R, -1, -2)) * f[..., None]


def se3_exp(xi):
    """Tangent (..., 6) [omega|v] -> (R (...,3,3), t (...,3))."""
    w, v = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, -1)
    a, b, c = _sinc_factors(theta2)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3), W.shape)
    R = eye + a[..., None, None] * W + b[..., None, None] * W2
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, v)
    return R, t


def se3_log(R, t):
    """(R, t) -> tangent (..., 6). Inverse of se3_exp near the identity."""
    w = so3_log(R)
    theta2 = jnp.sum(w * w, -1)
    a, b, _ = _sinc_factors(theta2)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3), W.shape)
    # V^-1 = I - W/2 + (1/theta^2)(1 - a/(2b)) W^2  (Taylor: 1/12)
    small = theta2 < 1e-8
    t2 = jnp.where(small, 1.0, theta2)
    coef = jnp.where(small, 1.0 / 12.0, (1.0 - a / (2.0 * b)) / t2)
    Vinv = eye - 0.5 * W + coef[..., None, None] * W2
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([w, v], -1)


def compose(Ra, ta, Rb, tb):
    """(Ra, ta) . (Rb, tb): first apply b, then a."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)
