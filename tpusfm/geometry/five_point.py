"""Minimal 5-point essential-matrix solver (Nister 2004), TPU-native.

The reference relies on OpenCV's ``findEssentialMat`` which runs Nister's
5-point solver inside RANSAC (/root/reference/SfM-GMS/SfM-GMS/SfMUtil.cpp:39).
The companion 8-point solver (epipolar.py) degenerates on planar scenes; the
5-point solver does not, so it is the production path.

TPU-first design decisions:

* **No symbolic codegen, no eigendecomposition.** Classic implementations
  either hard-code thousands of generated coefficient expressions or build a
  10x10 action matrix and call a nonsymmetric eigensolver -- which XLA does
  not provide on TPU.  Here the 10 cubic constraints
  (det(E)=0 and 2*E*E^T*E - tr(E*E^T)*E = 0) are expanded *numerically* with
  small precomputed monomial-product tables (einsum contractions), Nister's
  Gauss-Jordan elimination reduces them to a 3x3 polynomial matrix B(z), and
  det B(z) -- the degree-10 polynomial -- is formed by 1-D convolutions.
* **Static-shape real-root isolation.** Roots are found by the substitution
  z = tan(theta), evaluating the homogenized polynomial on a fixed theta grid,
  isolating sign changes (up to 10 slots, padded + masked), then a fixed
  budget of bisection steps and Newton polish.  Everything is ``vmap``-able
  across RANSAC hypotheses; degenerate samples produce masked-out candidates
  that RANSAC scoring simply ignores.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

# The solver's polynomial algebra is numerically delicate (degree-10
# elimination); on TPU the default bf16 MXU precision destroys it, so
# every contraction in this module runs at full f32 precision.  The
# tensors are tiny -- this costs nothing.
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

# ---------------------------------------------------------------------------
# Monomial bookkeeping (host-side, static).
#
# deg<=1 monomials over (x, y, z):   [x, y, z, 1]
# deg<=2 monomials (10)           :  [x2, xy, xz, y2, yz, z2, x, y, z, 1]
# deg<=3 monomials (20), in Nister's column order: the first ten are the ones
# eliminated by Gauss-Jordan, the last ten form the tail used to build B(z).
# ---------------------------------------------------------------------------

_DEG1 = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0)]
_DEG2 = [
    (2, 0, 0), (1, 1, 0), (1, 0, 1), (0, 2, 0), (0, 1, 1),
    (0, 0, 2), (1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0),
]
_DEG3 = [
    (3, 0, 0), (0, 3, 0), (2, 1, 0), (1, 2, 0), (2, 0, 1),
    (2, 0, 0), (0, 2, 1), (0, 2, 0), (1, 1, 1), (1, 1, 0),
    # ---- tail: [xz2, xz, x, yz2, yz, y, z3, z2, z, 1]
    (1, 0, 2), (1, 0, 1), (1, 0, 0), (0, 1, 2), (0, 1, 1),
    (0, 1, 0), (0, 0, 3), (0, 0, 2), (0, 0, 1), (0, 0, 0),
]


def _product_table(a_monoms, b_monoms, out_monoms):
    """One-hot tensor T with T[i,j,k]=1 iff a_i * b_j = out_k."""
    index = {m: k for k, m in enumerate(out_monoms)}
    T = np.zeros((len(a_monoms), len(b_monoms), len(out_monoms)), np.float32)
    for i, ma in enumerate(a_monoms):
        for j, mb in enumerate(b_monoms):
            s = tuple(ea + eb for ea, eb in zip(ma, mb))
            T[i, j, index[s]] = 1.0
    return T


# Kept as NumPy constants (not jnp) so importing this module inside a jit
# trace cannot leak tracers; XLA embeds them as literals at each use site.
_T11 = _product_table(_DEG1, _DEG1, _DEG2)                # (4,4,10)
_T21 = _product_table(_DEG2, _DEG1, _DEG3)                # (10,4,20)
_EXP3 = np.array(_DEG3, np.float32)                       # (20,3) exponents


def _mono20(v):
    """Values of the 20 deg<=3 monomials at v=(x,y,z).

    NOTE: this is *not* the same as chaining the product tables on the value
    vector [x,y,z,1] -- that sums duplicate (i,j) pairs and yields
    multiplicity-weighted values (e.g. 2xy in the xy slot).
    """
    return jnp.prod(v[None, :] ** _EXP3, axis=1)


def _mul11(a, b):
    """(...,4) x (...,4) -> (...,10) polynomial product."""
    return _einsum("...i,...j,ijk->...k", a, b, _T11)


def _mul21(a, b):
    """(...,10) x (...,4) -> (...,20) polynomial product."""
    return _einsum("...i,...j,ijk->...k", a, b, _T21)


def _constraint_matrix(L):
    """10x20 cubic-constraint coefficient matrix from the nullspace basis.

    L: (3,3,4) -- entry (i,j) of E as a linear form over [x,y,z,1] so that
    E(x,y,z) = x*E1 + y*E2 + z*E3 + E4.
    Rows: [det(E)] + the nine entries of 2*E*E^T*E - tr(E*E^T)*E.
    """
    # det(E) via cofactor expansion along row 0.
    m00 = _mul11(L[1, 1], L[2, 2]) - _mul11(L[1, 2], L[2, 1])
    m01 = _mul11(L[1, 0], L[2, 2]) - _mul11(L[1, 2], L[2, 0])
    m02 = _mul11(L[1, 0], L[2, 1]) - _mul11(L[1, 1], L[2, 0])
    det = _mul21(m00, L[0, 0]) - _mul21(m01, L[0, 1]) + _mul21(m02, L[0, 2])

    # (E E^T)_{ik} = sum_j E_ij E_kj   -- deg-2 polys, shape (3,3,10)
    EEt = _einsum("ijm,kjn,mnp->ikp", L, L, _T11)
    trace = EEt[0, 0] + EEt[1, 1] + EEt[2, 2]                    # (10,)
    # (E E^T E)_{il} = sum_k (EE^T)_{ik} E_{kl}  -- deg-3, (3,3,20)
    EEtE = _einsum("ikm,kln,mnp->ilp", EEt, L, _T21)
    tE = _einsum("m,iln,mnp->ilp", trace, L, _T21)            # tr * E
    C = 2.0 * EEtE - tE                                          # (3,3,20)

    return jnp.concatenate([det[None, :], C.reshape(9, 20)], axis=0)


def _poly_eval(coeffs, z):
    """Evaluate polynomial with coefficients high->low at z (Horner)."""
    acc = jnp.zeros_like(z)
    for i in range(coeffs.shape[0]):
        acc = acc * z + coeffs[i]
    return acc


def _homog_eval(coeffs, s, c):
    """Evaluate sum_d coeffs[d] * s^(D-d) * c^d for z = s/c (degree D).

    Bounded for all theta, so sign changes on a theta grid locate every real
    root of the (possibly leading-coefficient-degenerate) polynomial.
    """
    D = coeffs.shape[0] - 1
    acc = jnp.zeros(jnp.broadcast_shapes(s.shape, c.shape), coeffs.dtype)
    for d in range(D + 1):
        acc = acc + coeffs[d] * (s ** (D - d)) * (c ** d)
    return acc


_N_GRID = 512
_MAX_ROOTS = 10
_BISECT_ITERS = 40


def _real_roots_deg10(coeffs):
    """Up to 10 real roots of a degree-10 polynomial, static shapes.

    coeffs: (11,) high->low.  Returns (roots (10,), valid (10,) bool).
    """
    scale = jnp.max(jnp.abs(coeffs))
    coeffs = coeffs / jnp.maximum(scale, 1e-30)

    eps = 1e-4
    theta = jnp.linspace(-np.pi / 2 + eps, np.pi / 2 - eps, _N_GRID)
    s, c = jnp.sin(theta), jnp.cos(theta)
    g = _homog_eval(coeffs, s, c)                                # (G,)

    sign_change = (g[:-1] * g[1:]) < 0.0                          # (G-1,)

    # Even-multiplicity roots (the planar two-fold ambiguity makes them the
    # NORM, not a corner case) touch zero without crossing: admit near-zero
    # local minima of |g| as candidates too, ranked after true crossings.
    ag = jnp.abs(g)
    interior = ag[1:-1]
    local_min = (interior <= ag[:-2]) & (interior <= ag[2:]) & (interior < 1e-2)
    local_min = jnp.pad(local_min, (0, 1))                        # align to cells
    score = jnp.where(sign_change, -1.0,
                      jnp.where(local_min, jnp.pad(interior, (0, 1)), jnp.inf))
    order = jnp.argsort(score)[:_MAX_ROOTS]                       # best 10 cells
    valid = jnp.take(score, order) < jnp.inf
    is_cross = jnp.take(sign_change, order)
    cell = jnp.minimum(order, _N_GRID - 2)

    lo = theta[cell]
    hi = theta[cell + 1]
    glo = _homog_eval(coeffs, jnp.sin(lo), jnp.cos(lo))

    def bisect(_, state):
        lo, hi, glo = state
        mid = 0.5 * (lo + hi)
        gmid = _homog_eval(coeffs, jnp.sin(mid), jnp.cos(mid))
        same = (glo * gmid) > 0.0
        lo = jnp.where(same, mid, lo)
        glo = jnp.where(same, gmid, glo)
        hi = jnp.where(same, hi, mid)
        return lo, hi, glo

    blo, bhi, _ = jax.lax.fori_loop(0, _BISECT_ITERS, bisect, (lo, hi, glo))
    # crossings: bisected midpoint; touching minima: the grid point itself
    # (cell+1 is the interior local-min index; Newton/GN polish finishes it).
    theta_root = jnp.where(is_cross, 0.5 * (blo + bhi), theta[cell + 1])
    z = jnp.tan(theta_root)

    # Newton polish in z (derivative coefficients: d/dz).
    D = coeffs.shape[0] - 1
    dcoeffs = coeffs[:-1] * jnp.arange(D, 0, -1, dtype=coeffs.dtype)

    def newton(_, z):
        f = _poly_eval(coeffs, z)
        df = _poly_eval(dcoeffs, z)
        step = f / jnp.where(jnp.abs(df) > 1e-20, df, jnp.inf)
        return z - jnp.clip(step, -1.0, 1.0)

    z = jax.lax.fori_loop(0, 3, newton, z)
    return z, valid


def _project_essential(E):
    u, svals, vt = jnp.linalg.svd(E)
    sm = 0.5 * (svals[0] + svals[1])
    return u @ jnp.diag(jnp.array([sm, sm, 0.0], E.dtype)) @ vt


def _rref(A, n_pivots: int):
    """Partially-pivoted reduced row echelon form with a STATIC pivot loop.

    The RANSAC hypothesis path runs thousands of tiny factorizations per
    frame; iterative decompositions (SVD/LU) serialize into long sweeps on
    TPU, while this unrolled elimination is a handful of vectorized selects
    and rank-1 updates per pivot — exact for the well-posed samples and
    merely garbage (scored away, or flagged by the pivot check downstream)
    for degenerate ones."""
    m, n = A.shape
    for k in range(n_pivots):
        cand = jnp.where(jnp.arange(m) >= k, jnp.abs(A[:, k]), -1.0)
        p = jnp.argmax(cand)
        rk, rp = A[k], A[p]
        A = A.at[k].set(rp).at[p].set(rk)
        piv = A[k, k]
        safe = jnp.where(jnp.abs(piv) > 1e-20, piv, 1e-20)
        A = A.at[k].set(A[k] / safe)
        factors = A[:, k].at[k].set(0.0)
        A = A - factors[:, None] * A[k][None, :]
    return A


def five_point_essential(x1, x2):
    """Essential-matrix candidates from exactly 5 normalized correspondences.

    x1, x2: (5, 2) normalized camera coordinates (matching OpenCV's internal
    convention; the constraint used is h2^T E h1 = 0 as in epipolar.py).
    Returns (E (10,3,3), valid (10,) bool) -- up to 10 real solutions, padded.
    """
    ones = jnp.ones_like(x1[:, :1])
    h1 = jnp.concatenate([x1, ones], axis=1)
    h2 = jnp.concatenate([x2, ones], axis=1)
    A = (h2[:, :, None] * h1[:, None, :]).reshape(5, 9)
    # Nullspace via SVD: the elimination variant (_nullspace4_of_5x9) is
    # faster but measurably less accurate on near-degenerate (planar)
    # samples even after re-orthonormalization — wrong-pose regressions in
    # tests. The 5x9 SVD stays; the 10x10 solve and the polish steps below
    # are elimination/closed-form.
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    basis = vt[5:9]                                   # (4, 9) nullspace
    # E(x,y,z) = x*B0 + y*B1 + z*B2 + B3 ; linear-form tensor (3,3,4)
    L = jnp.moveaxis(basis.reshape(4, 3, 3), 0, -1)

    M = _constraint_matrix(L)                          # (10, 20)
    R = _rref(M, 10)[:, 10:]                           # (10, 10) tails

    # Rows e..j have leading monomials [x2z, x2, y2z, y2, xyz, xy].
    # Tail columns: [xz2, xz, x, yz2, yz, y, z3, z2, z, 1].
    def kpolys(top, bot):
        """<k> = <top> - z*<bot>: returns (k1 (4,), k2 (4,), k3 (5,))."""
        tx, bx = top[0:3], bot[0:3]      # x-coefficient: quadratic in z
        ty, by = top[3:6], bot[3:6]
        tc, bc = top[6:10], bot[6:10]    # constant part: cubic in z
        k1 = jnp.stack([-bx[0], tx[0] - bx[1], tx[1] - bx[2], tx[2]])
        k2 = jnp.stack([-by[0], ty[0] - by[1], ty[1] - by[2], ty[2]])
        k3 = jnp.stack([-bc[0], tc[0] - bc[1], tc[1] - bc[2],
                        tc[2] - bc[3], tc[3]])
        return k1, k2, k3

    k1, k2, k3 = kpolys(R[4], R[5])
    l1, l2, l3 = kpolys(R[6], R[7])
    m1, m2, m3 = kpolys(R[8], R[9])

    conv = jnp.convolve
    # det B(z): degree 10 (11 coefficients, high->low).
    n = (conv(k1, conv(l2, m3) - conv(l3, m2))
         - jnp.pad(conv(k2, conv(l1, m3) - conv(l3, m1)), (0, 0))
         + jnp.pad(conv(k3, conv(l1, m2) - conv(l2, m1)), (0, 0)))

    z, valid = _real_roots_deg10(n)                    # (10,), (10,)

    # Back-substitute each root: least-squares (x, y) from the 3x2 system
    # [[k1,k2],[l1,l2],[m1,m2]] @ (x,y) = -(k3,l3,m3) evaluated at z.
    def solve_xy(z):
        a = jnp.stack([_poly_eval(k1, z), _poly_eval(l1, z), _poly_eval(m1, z)])
        b = jnp.stack([_poly_eval(k2, z), _poly_eval(l2, z), _poly_eval(m2, z)])
        d = -jnp.stack([_poly_eval(k3, z), _poly_eval(l3, z), _poly_eval(m3, z)])
        AtA = jnp.array([[a @ a, a @ b], [a @ b, b @ b]])
        Atd = jnp.array([a @ d, b @ d])
        det = AtA[0, 0] * AtA[1, 1] - AtA[0, 1] * AtA[1, 0]
        inv = jnp.array([[AtA[1, 1], -AtA[0, 1]], [-AtA[1, 0], AtA[0, 0]]])
        xy = (inv @ Atd) / jnp.where(jnp.abs(det) > 1e-20, det, jnp.inf)
        return xy

    xy = jax.vmap(solve_xy)(z)                          # (10, 2)
    finite = jnp.all(jnp.isfinite(xy), axis=1) & jnp.isfinite(z)
    xy = jnp.where(finite[:, None], xy, 0.0)
    zsafe = jnp.where(finite, z, 0.0)

    # Gauss-Newton polish on the 10 cubic constraints.  The nullspace
    # parametrization satisfies the 5 epipolar constraints for *any*
    # (x,y,z); what limits f32 accuracy is the rootfinding error against
    # det/trace manifold constraints, so refine (x,y,z) on r = M@mono(x,y,z).
    def constraint_res(v):
        return M @ _mono20(v)                            # (10,)

    def solve3_sym(G, b):
        """Closed-form symmetric 3x3 solve via the adjugate (the iterative
        LU behind jnp.linalg.solve is the wrong tool inside a 10-step
        Gauss-Newton loop vmapped over hundreds of hypotheses)."""
        a, d, e = G[0, 0], G[0, 1], G[0, 2]
        bb, f, c = G[1, 1], G[1, 2], G[2, 2]
        A_ = bb * c - f * f
        B_ = e * f - d * c
        C_ = d * f - bb * e
        D_ = a * c - e * e
        E_ = d * e - a * f
        F_ = a * bb - d * d
        det = a * A_ + d * B_ + e * C_
        det = jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
        return jnp.stack([
            A_ * b[0] + B_ * b[1] + C_ * b[2],
            B_ * b[0] + D_ * b[1] + E_ * b[2],
            C_ * b[0] + E_ * b[1] + F_ * b[2],
        ]) / det

    def polish(v0):
        def gn(_, v):
            r = constraint_res(v)
            J = jax.jacfwd(constraint_res)(v)            # (10, 3)
            JtJ = J.T @ J + 1e-9 * jnp.eye(3, dtype=J.dtype)
            step = solve3_sym(JtJ, J.T @ r)
            step = jnp.clip(step, -1.0, 1.0)
            v1 = v - step
            better = jnp.sum(constraint_res(v1) ** 2) < jnp.sum(r ** 2)
            return jnp.where(better, v1, v)
        return jax.lax.fori_loop(0, 10, gn, v0)

    xyz = jnp.concatenate([xy, zsafe[:, None]], axis=1)  # (10, 3)
    xyz = jax.vmap(polish)(xyz)
    xy, zsafe = xyz[:, :2], xyz[:, 2]

    def build(xyz):
        x, y, zz = xyz
        E = _einsum("ijc,c->ij", L, jnp.array([x, y, zz, 1.0], L.dtype))
        norm = jnp.linalg.norm(E)
        return _project_essential(E / jnp.maximum(norm, 1e-20))

    Es = jax.vmap(build)(xyz)
    Es = jnp.where(jnp.isfinite(Es).all(axis=(1, 2), keepdims=True), Es, 0.0)
    return Es, valid & finite
