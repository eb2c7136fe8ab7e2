"""Pose-graph optimization: LM over SE(3) nodes with relative-pose edges.

The loop-closure refinement layer the north star asks for on top of the
reference's two-view pipeline (the reference chains structureFromMotion
poses with no global correction, /root/reference/SfM-GMS/SfM-GMS/SfMUtil.cpp:45).

TPU-native design:

* All edges evaluated in one vmapped batch: residual r_e = Log(Z_e^-1 .
  T_i^-1 . T_j) and its (6, 12) Jacobian from one jacfwd at delta = 0 —
  the se3 ops (tpusfm.pgo.se3) are written to stay finite there.
* The normal system H = J^T J is assembled by scatter-adding the four
  6x6 endpoint blocks per edge into a dense (6N, 6N) matrix — N is the
  keyframe count (tens to hundreds), so one dense damped solve per LM
  step is a single well-shaped MXU op, not a sparse emulation.
* The LM loop is a lax.scan with accept/reject damping — fixed trip
  count, no data-dependent control flow inside jit.
* The per-edge block build is a segment-sum over the edge axis, i.e.
  psum-reducible when edges shard across a mesh
  (tpusfm/dist/sharded_pgo.py uses the same functions).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from tpusfm.pgo import se3


@dataclasses.dataclass(frozen=True)
class PgoConfig:
    max_iters: int = 20
    init_lambda: float = 1e-4
    lambda_up: float = 10.0
    lambda_down: float = 0.1
    rot_weight: float = 1.0       # weight on the rotation residual block
    trans_weight: float = 1.0
    # robust (Huber) kernel on the per-edge residual norm: loop-closure /
    # span edges that contradict a consistent odometry chain get their
    # influence bounded instead of dragging the solution (the standard
    # g2o/ceres recipe). Large delta ~ plain least squares.
    huber_delta: float = 0.5
    # inner PCG iterations of the matrix-free solver (optimize_pose_graph_cg)
    cg_iters: int = 64


def edge_residual(Ri, ti, Rj, tj, Zr, Zt):
    """r = Log(Z^-1 . T_i^-1 . T_j) for one edge, (6,)."""
    Rinv, tinv = se3.inverse(Ri, ti)
    Rij, tij = se3.compose(Rinv, tinv, Rj, tj)
    Zri, Zti = se3.inverse(Zr, Zt)
    Re, te = se3.compose(Zri, Zti, Rij, tij)
    return se3.se3_log(Re, te)


def _block_weights(cfg: PgoConfig):
    """(6,) residual-block weights: rotation block, then translation."""
    return jnp.concatenate([jnp.full(3, cfg.rot_weight),
                            jnp.full(3, cfg.trans_weight)])


def _huber_w(rn, delta):
    """IRLS sqrt-weight of the Huber kernel at residual norm rn."""
    return jnp.sqrt(jnp.where(rn <= delta, 1.0,
                              delta / jnp.maximum(rn, 1e-12)))


def _edge_terms(R, t, ei, ej, Zr, Zt, w, bw, delta):
    """Vmapped residuals + Jacobian blocks for every edge.

    Returns (r (E, 6), Ji (E, 6, 6), Jj (E, 6, 6)) where Ji/Jj are
    d r / d delta_i, d r / d delta_j under the right-multiplicative update
    T <- T . Exp(delta), pre-scaled by the per-edge weight and the (6,)
    rotation/translation block weights bw."""

    def one(Ri, ti, Rj, tj, zr, zt, we):
        def f(d):
            dRi, dti = se3.se3_exp(d[:6])
            dRj, dtj = se3.se3_exp(d[6:])
            Ri2, ti2 = se3.compose(Ri, ti, dRi, dti)
            Rj2, tj2 = se3.compose(Rj, tj, dRj, dtj)
            return edge_residual(Ri2, ti2, Rj2, tj2, zr, zt)

        z = jnp.zeros(12)
        J = jax.jacfwd(f)(z)          # (6, 12)
        r = f(z)
        s = we * bw * _huber_w(jnp.linalg.norm(r * we * bw), delta)
        return r * s, J[:, :6] * s[:, None], J[:, 6:] * s[:, None]

    return jax.vmap(one)(R[ei], t[ei], R[ej], t[ej], Zr, Zt, w)


def build_normal_system(R, t, ei, ej, Zr, Zt, w, n_nodes: int,
                        cfg: PgoConfig = PgoConfig()):
    """Assemble (H (6N, 6N), g (6N,), cost) for the current linearization.

    Every output is a segment-sum over edges — the psum-reducible part."""
    r, Ji, Jj = _edge_terms(R, t, ei, ej, Zr, Zt, w, _block_weights(cfg),
                            jnp.float32(cfg.huber_delta))
    Hii = jnp.einsum("eki,ekj->eij", Ji, Ji)
    Hjj = jnp.einsum("eki,ekj->eij", Jj, Jj)
    Hij = jnp.einsum("eki,ekj->eij", Ji, Jj)
    gi = -jnp.einsum("eki,ek->ei", Ji, r)
    gj = -jnp.einsum("eki,ek->ei", Jj, r)

    N = n_nodes
    H = jnp.zeros((N, 6, N, 6))
    H = H.at[ei, :, ei, :].add(Hii)
    H = H.at[ej, :, ej, :].add(Hjj)
    H = H.at[ei, :, ej, :].add(Hij)
    H = H.at[ej, :, ei, :].add(jnp.swapaxes(Hij, -1, -2))
    g = jnp.zeros((N, 6)).at[ei].add(gi).at[ej].add(gj)
    cost = jnp.sum(r * r)
    return H.reshape(6 * N, 6 * N), g.reshape(-1), cost


def graph_cost(R, t, ei, ej, Zr, Zt, w, cfg: PgoConfig = PgoConfig()):
    """True robust (Huber-on-norm) cost — the LM accept/reject criterion."""
    r = jax.vmap(edge_residual)(R[ei], t[ei], R[ej], t[ej], Zr, Zt)
    rw = r * w[:, None] * _block_weights(cfg)[None]
    rn = jnp.sqrt(jnp.maximum(jnp.sum(rw * rw, axis=1), 1e-18))
    d = jnp.float32(cfg.huber_delta)
    hub = jnp.where(rn <= d, 0.5 * rn * rn, d * (rn - 0.5 * d))
    return 2.0 * jnp.sum(hub)


def lm_scan(R, t, cfg: PgoConfig, n_fixed: int, normal_fn, cost_fn):
    """Shared LM driver: normal_fn/cost_fn supply the (possibly psum'd)
    edge reductions. Used by both the single-device and the edge-sharded
    (tpusfm/dist/sharded_pgo.py) optimizers."""
    N = R.shape[0]
    free = (jnp.arange(N) >= n_fixed).astype(jnp.float32)
    free6 = jnp.repeat(free, 6)

    def step(carry, _):
        # the accepted TRUE Huber cost rides in the carry: accept/reject
        # must compare cost_fn against cost_fn — the surrogate returned by
        # normal_fn is the IRLS-weighted square, a different metric whose
        # mismatch spuriously rejected genuinely-improving steps exactly in
        # the large-residual loop-closure regime (r4 advisor finding)
        R, t, lam, cost = carry
        H, g, _ = normal_fn(R, t)
        # gauge fix: zero the rows/cols of the frozen nodes, unit diagonal
        Hf = H * free6[:, None] * free6[None, :] + jnp.diag(1.0 - free6)
        Hf = Hf + lam * jnp.diag(jnp.clip(jnp.diag(Hf), 1e-6, None))
        gf = g * free6
        d = jnp.linalg.solve(Hf, gf).reshape(N, 6) * free[:, None]
        dR, dt = se3.se3_exp(d)
        R2, t2 = se3.compose(R, t, dR, dt)
        new_cost = cost_fn(R2, t2)
        accept = new_cost < cost
        R = jnp.where(accept, R2, R)
        t = jnp.where(accept, t2, t)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.clip(jnp.where(accept, lam * cfg.lambda_down,
                                 lam * cfg.lambda_up), 1e-10, 1e8)
        return (R, t, lam, cost), cost

    cost0 = cost_fn(R, t)
    (R, t, _, _), costs = jax.lax.scan(
        step, (R, t, jnp.float32(cfg.init_lambda), cost0), None,
        length=cfg.max_iters)
    return R, t, costs


@functools.partial(jax.jit, static_argnames=("cfg", "n_fixed"))
def optimize_pose_graph(R, t, ei, ej, Zr, Zt, w=None,
                        cfg: PgoConfig = PgoConfig(), n_fixed: int = 1):
    """LM pose-graph optimization.

    R (N,3,3), t (N,3): initial node poses (world_T_node).
    ei, ej (E,) int32: edge endpoints; Zr (E,3,3), Zt (E,3): measured
    relative poses node_i_T_node_j. w (E,): per-edge weights (masked edges
    -> 0). Returns (R, t, costs (iters,))."""
    N = R.shape[0]
    if w is None:
        w = jnp.ones(ei.shape[0])

    return lm_scan(
        R, t, cfg, n_fixed,
        lambda R_, t_: build_normal_system(R_, t_, ei, ej, Zr, Zt, w, N, cfg),
        lambda R_, t_: graph_cost(R_, t_, ei, ej, Zr, Zt, w, cfg),
    )


def _cg_solve(hv, Minv, b, iters: int):
    """Block-Jacobi preconditioned CG for A x = b, fixed trip count.

    hv: (N,6)->(N,6) operator product; Minv: (N,6,6) per-node preconditioner
    inverse. Converged systems freeze (alpha, beta -> 0) instead of exiting
    — no data-dependent control flow inside jit."""
    x = jnp.zeros_like(b)
    r = b
    z = jnp.einsum("nab,nb->na", Minv, r)
    p = z
    rz = jnp.sum(r * z)

    def body(carry, _):
        x, r, p, rz = carry
        Ap = hv(p)
        ok = rz > 1e-24
        alpha = jnp.where(ok, rz / jnp.maximum(jnp.sum(p * Ap), 1e-30), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = jnp.einsum("nab,nb->na", Minv, r)
        rz2 = jnp.sum(r * z)
        beta = jnp.where(ok, rz2 / jnp.maximum(rz, 1e-30), 0.0)
        p = z + beta * p
        return (x, r, p, rz2), None

    (x, _, _, _), _ = jax.lax.scan(body, (x, r, p, rz), None, length=iters)
    return x


def lm_cg_core(R, t, ei, ej, Zr, Zt, w, N: int, cfg: PgoConfig,
               n_fixed: int, reduce_fn=lambda x: x):
    """LM over SE(3) with a MATRIX-FREE block-sparse inner solver.

    The dense path (lm_scan + build_normal_system) scatter-assembles a
    (6N)^2 H and runs an O(N^3) solve — fine at tens of keyframes, exactly
    what breaks at thousands (r4 comm model: 0.4% projected efficiency at 8
    chips for N=64). Here H is never formed: each LM step builds per-edge
    6x6 endpoint blocks once, the damped gauge-fixed H.v product is two
    gathers + four block muls + one scatter-add per edge, and a block-Jacobi
    (per-node 6x6) preconditioned CG solves the step. Under edge sharding
    ``reduce_fn`` is a psum over the shard axis, so communication per LM
    step is O(N*6) floats per CG iteration plus one O(N*36) block-diagonal —
    independent of E and never quadratic in N.

    ei/ej/Zr/Zt/w may be a local edge shard (padded edges carry w=0: their
    residuals, blocks and cost terms vanish). Returns (R, t, costs).
    """
    bw = _block_weights(cfg)
    delta = jnp.float32(cfg.huber_delta)
    free = (jnp.arange(N) >= n_fixed).astype(jnp.float32)[:, None]

    def cost_fn(R_, t_):
        return reduce_fn(graph_cost(R_, t_, ei, ej, Zr, Zt, w, cfg))

    def linearize(R_, t_):
        r, Ji, Jj = _edge_terms(R_, t_, ei, ej, Zr, Zt, w, bw, delta)
        Hii = jnp.einsum("eki,ekj->eij", Ji, Ji)
        Hjj = jnp.einsum("eki,ekj->eij", Jj, Jj)
        Hij = jnp.einsum("eki,ekj->eij", Ji, Jj)
        gi = -jnp.einsum("eki,ek->ei", Ji, r)
        gj = -jnp.einsum("eki,ek->ei", Jj, r)
        D = jnp.zeros((N, 6, 6)).at[ei].add(Hii).at[ej].add(Hjj)
        g = jnp.zeros((N, 6)).at[ei].add(gi).at[ej].add(gj)
        return (Hii, Hjj, Hij), reduce_fn(D), reduce_fn(g)

    def hv(blocks, v):
        Hii, Hjj, Hij = blocks
        vi = v[ei]
        vj = v[ej]
        ci = (jnp.einsum("eab,eb->ea", Hii, vi)
              + jnp.einsum("eab,eb->ea", Hij, vj))
        cj = (jnp.einsum("eba,eb->ea", Hij, vi)
              + jnp.einsum("eab,eb->ea", Hjj, vj))
        out = jnp.zeros((N, 6)).at[ei].add(ci).at[ej].add(cj)
        return reduce_fn(out)

    def step(carry, _):
        R_, t_, lam, cost = carry
        blocks, D, g = linearize(R_, t_)
        ddiag = jnp.clip(jnp.diagonal(D, axis1=1, axis2=2), 1e-6, None)
        damp = lam * ddiag                                    # (N, 6)

        def A(v):
            vf = v * free
            return (hv(blocks, vf) + damp * vf) * free + v * (1.0 - free)

        Dd = D + jax.vmap(jnp.diag)(damp)
        Dd = jnp.where(free[:, :, None] > 0, Dd, jnp.eye(6)[None])
        Minv = jnp.linalg.inv(Dd + 1e-8 * jnp.eye(6))
        d = _cg_solve(A, Minv, g * free, cfg.cg_iters) * free

        dR, dt = se3.se3_exp(d)
        R2, t2 = se3.compose(R_, t_, dR, dt)
        new_cost = cost_fn(R2, t2)
        accept = new_cost < cost
        R_ = jnp.where(accept, R2, R_)
        t_ = jnp.where(accept, t2, t_)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.clip(jnp.where(accept, lam * cfg.lambda_down,
                                 lam * cfg.lambda_up), 1e-10, 1e8)
        return (R_, t_, lam, cost), cost

    cost0 = cost_fn(R, t)
    (R, t, _, _), costs = jax.lax.scan(
        step, (R, t, jnp.float32(cfg.init_lambda), cost0), None,
        length=cfg.max_iters)
    return R, t, costs


@functools.partial(jax.jit, static_argnames=("cfg", "n_fixed"))
def optimize_pose_graph_cg(R, t, ei, ej, Zr, Zt, w=None,
                           cfg: PgoConfig = PgoConfig(), n_fixed: int = 1):
    """Matrix-free LM pose-graph optimization (see lm_cg_core) — the
    at-scale solver for keyframe counts in the hundreds-to-thousands; same
    contract as optimize_pose_graph."""
    if w is None:
        w = jnp.ones(ei.shape[0])
    return lm_cg_core(R, t, ei, ej, Zr, Zt, w, R.shape[0], cfg, n_fixed)


def chain_odometry(Zr, Zt):
    """Integrate sequential relative poses into absolute node poses.

    Zr (N-1, 3, 3), Zt (N-1, 3): edge k measures k_T_{k+1}. Returns
    (R (N,3,3), t (N,3)) with node 0 at the identity — the drift-accumulating
    trajectory the pose graph then corrects (reference anchor: the chained
    structureFromMotion poses, /root/reference/SfM-GMS/SfM-GMS/SfMUtil.cpp:45)."""
    def step(carry, zz):
        R, t = carry
        Rn, tn = se3.compose(R, t, zz[0], zz[1])
        return (Rn, tn), (Rn, tn)

    R0 = jnp.eye(3)
    t0 = jnp.zeros(3)
    _, (Rs, ts) = jax.lax.scan(step, (R0, t0), (Zr, Zt))
    return (jnp.concatenate([R0[None], Rs]),
            jnp.concatenate([t0[None], ts]))
