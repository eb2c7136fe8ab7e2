"""Pose-graph optimization tests: se3 roundtrips, drift correction by a
loop closure, and sharded == single-device equivalence (VERDICT r3 #2)."""
import numpy as np
import jax
import jax.numpy as jnp

from tpusfm.dist.mesh import make_mesh
from tpusfm.dist.sharded_pgo import sharded_optimize_pose_graph
from tpusfm.pgo import PgoConfig, chain_odometry, optimize_pose_graph, se3
from tpusfm.pgo.graph import graph_cost


def _random_poses(n, rng, angle=0.5, trans=1.0):
    w = rng.normal(size=(n, 3)) * angle
    R = np.asarray(jax.vmap(se3.so3_exp)(jnp.asarray(w)))
    t = rng.normal(size=(n, 3)) * trans
    return jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32)


def _relative(R, t, i, j):
    Ri, ti = se3.inverse(R[i], t[i])
    return se3.compose(Ri, ti, R[j], t[j])


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    xi = jnp.asarray(rng.normal(size=(32, 6)).astype(np.float32))
    R, t = se3.se3_exp(xi)
    xi2 = se3.se3_log(R, t)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=2e-5)
    # identity: exact zeros, finite jacobian
    z = jnp.zeros(6)
    np.testing.assert_allclose(np.asarray(se3.se3_log(*se3.se3_exp(z))), 0.0)
    J = jax.jacfwd(lambda d: se3.se3_log(*se3.se3_exp(d)))(z)
    assert np.all(np.isfinite(np.asarray(J)))
    np.testing.assert_allclose(np.asarray(J), np.eye(6), atol=1e-5)


def test_residual_zero_at_ground_truth():
    rng = np.random.default_rng(1)
    R, t = _random_poses(6, rng)
    ei = jnp.asarray([0, 1, 2, 3, 4, 0], jnp.int32)
    ej = jnp.asarray([1, 2, 3, 4, 5, 5], jnp.int32)
    Zr, Zt = jax.vmap(lambda i, j: _relative(R, t, i, j))(ei, ej)
    c = graph_cost(R, t, ei, ej, Zr, Zt, jnp.ones(6))
    assert float(c) < 1e-8, float(c)


def _noisy_loop_problem(n=12, seed=2, noise=0.03):
    """Ground-truth loop of n poses; odometry edges with noise + one exact
    loop-closure edge. Returns (gt, odometry-chained init, edges)."""
    rng = np.random.default_rng(seed)
    # ground truth: walk around a circle
    ang = 2 * np.pi / n
    Rg, tg = [np.eye(3)], [np.zeros(3)]
    step_R = np.asarray(se3.so3_exp(jnp.asarray([0.0, 0.0, ang])))
    for k in range(1, n):
        Rg.append(Rg[-1] @ step_R)
        tg.append(tg[-1] + Rg[-2] @ np.array([1.0, 0.0, 0.0]))
    Rg = jnp.asarray(np.stack(Rg), jnp.float32)
    tg = jnp.asarray(np.stack(tg), jnp.float32)

    # odometry measurements: true relative pose + noise
    Zr_list, Zt_list = [], []
    for k in range(n - 1):
        zr, zt = _relative(Rg, tg, k, k + 1)
        d = jnp.asarray(rng.normal(size=6).astype(np.float32) * noise)
        nr, nt = se3.se3_exp(d)
        zr, zt = se3.compose(zr, zt, nr, nt)
        Zr_list.append(zr)
        Zt_list.append(zt)
    Zr_od = jnp.stack(Zr_list)
    Zt_od = jnp.stack(Zt_list)

    # loop closure 0 -> n-1, exact
    zr_lc, zt_lc = _relative(Rg, tg, 0, n - 1)

    R0, t0 = chain_odometry(Zr_od, Zt_od)
    ei = jnp.asarray(list(range(n - 1)) + [0], jnp.int32)
    ej = jnp.asarray(list(range(1, n)) + [n - 1], jnp.int32)
    Zr = jnp.concatenate([Zr_od, zr_lc[None]])
    Zt = jnp.concatenate([Zt_od, zt_lc[None]])
    return (Rg, tg), (R0, t0), (ei, ej, Zr, Zt)


def _ate(t_est, t_gt):
    return float(jnp.sqrt(jnp.mean(jnp.sum((t_est - t_gt) ** 2, -1))))


def test_loop_closure_reduces_drift():
    (Rg, tg), (R0, t0), (ei, ej, Zr, Zt) = _noisy_loop_problem()
    w = jnp.ones(ei.shape[0]).at[-1].set(10.0)  # trust the loop closure
    cfg = PgoConfig(max_iters=15)
    R1, t1, costs = optimize_pose_graph(R0, t0, ei, ej, Zr, Zt, w, cfg)

    ate_before = _ate(t0, tg)
    ate_after = _ate(t1, tg)
    assert np.all(np.isfinite(np.asarray(costs)))
    assert float(costs[-1]) < float(costs[0])
    assert ate_after < 0.5 * ate_before, (ate_before, ate_after)
    # rotations stay orthonormal through the compositions
    RtR = np.asarray(jnp.einsum("nij,nik->njk", R1, R1))
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (R1.shape[0], 1, 1)),
                               atol=1e-4)


def test_sharded_pgo_matches_single_device():
    (_, _), (R0, t0), (ei, ej, Zr, Zt) = _noisy_loop_problem(n=10, seed=5)
    w = jnp.ones(ei.shape[0]).at[-1].set(5.0)
    cfg = PgoConfig(max_iters=8)
    R1, t1, c1 = optimize_pose_graph(R0, t0, ei, ej, Zr, Zt, w, cfg)
    mesh = make_mesh()
    R2, t2, c2 = sharded_optimize_pose_graph(R0, t0, ei, ej, Zr, Zt, w, mesh, cfg)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(c2[-1]), np.asarray(c1[-1]),
                               rtol=1e-4, atol=1e-7)


def test_cg_matches_dense():
    """Matrix-free CG solver (r5, VERDICT r4 #5) reaches the dense solver's
    optimum on the loop problem."""
    from tpusfm.pgo import optimize_pose_graph_cg

    (Rg, tg), (R0, t0), (ei, ej, Zr, Zt) = _noisy_loop_problem()
    w = jnp.ones(ei.shape[0]).at[-1].set(10.0)
    cfg = PgoConfig(max_iters=15, cg_iters=100)
    R1, t1, c1 = optimize_pose_graph(R0, t0, ei, ej, Zr, Zt, w,
                                     PgoConfig(max_iters=15))
    R2, t2, c2 = optimize_pose_graph_cg(R0, t0, ei, ej, Zr, Zt, w, cfg)
    assert float(c2[-1]) <= float(c1[-1]) * 1.05, (float(c1[-1]), float(c2[-1]))
    ate_dense = _ate(t1, tg)
    ate_cg = _ate(t2, tg)
    assert ate_cg <= ate_dense * 1.1 + 1e-3, (ate_dense, ate_cg)


def test_sharded_cg_matches_single_device_small():
    """Tight equivalence of the edge-sharded CG path on a small graph."""
    from tpusfm.dist.sharded_pgo import sharded_optimize_pose_graph_cg
    from tpusfm.pgo import optimize_pose_graph_cg

    (_, _), (R0, t0), (ei, ej, Zr, Zt) = _noisy_loop_problem(n=10, seed=5)
    w = jnp.ones(ei.shape[0]).at[-1].set(5.0)
    cfg = PgoConfig(max_iters=8, cg_iters=64)
    R1, t1, c1 = optimize_pose_graph_cg(R0, t0, ei, ej, Zr, Zt, w, cfg)
    mesh = make_mesh()
    R2, t2, c2 = sharded_optimize_pose_graph_cg(
        R0, t0, ei, ej, Zr, Zt, w, mesh, cfg)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c1),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t1), atol=1e-3)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R1), atol=1e-3)


def test_sharded_cg_scales_to_n1024():
    """Edge-sharded matrix-free PGO on a synthetic 1024-node graph over the
    8-device mesh (VERDICT r4 #5): the dense (6N)^2 path is out of the
    question at this size; the CG path must reduce cost and real drift,
    and the sharded run must land in the same cost basin as single-device
    (bitwise trajectories diverge through ~1000 fp-reordered CG steps)."""
    from tpusfm.dist.sharded_pgo import sharded_optimize_pose_graph_cg
    from tpusfm.pgo import optimize_pose_graph_cg

    n = 1024
    (Rg, tg), (R0, t0), (ei, ej, Zr, Zt) = _noisy_loop_problem(
        n=n, seed=7, noise=0.01)
    # extra loop closures: span-64 and span-256 chords (exact relative
    # measurements) — the long chords cut the graph diameter so the
    # block-Jacobi CG information front crosses it within the iteration
    # budget (Jacobi-CG propagates ~1 hop per iteration)
    lc_i = np.arange(0, n - 64, 64)
    lc_j = lc_i + 64
    lc_i2 = np.arange(0, n - 256, 256)
    lc_j2 = lc_i2 + 256
    lc_i = jnp.asarray(np.concatenate([lc_i, lc_i2]), jnp.int32)
    lc_j = jnp.asarray(np.concatenate([lc_j, lc_j2]), jnp.int32)
    Zr_lc, Zt_lc = jax.vmap(lambda i, j: _relative(Rg, tg, i, j))(lc_i, lc_j)
    ei = jnp.concatenate([ei, lc_i])
    ej = jnp.concatenate([ej, lc_j])
    Zr = jnp.concatenate([Zr, Zr_lc])
    Zt = jnp.concatenate([Zt, Zt_lc])
    w = jnp.ones(ei.shape[0]).at[n - 1:].set(5.0)

    # trusted synthetic measurements: effectively-plain least squares
    # (a 0.5 Huber delta saturates on the big drift residuals and bounds
    # exactly the informative loop edges)
    cfg = PgoConfig(max_iters=20, cg_iters=224, huber_delta=1e4)
    R1, t1, c1 = optimize_pose_graph_cg(R0, t0, ei, ej, Zr, Zt, w, cfg)
    mesh = make_mesh()
    R2, t2, c2 = sharded_optimize_pose_graph_cg(
        R0, t0, ei, ej, Zr, Zt, w, mesh, cfg)

    # deep convergence: ~3 orders of magnitude on the graph cost
    assert float(c1[-1]) < 0.02 * float(c1[0]), np.asarray(c1)
    assert float(c2[-1]) < 0.02 * float(c2[0]), np.asarray(c2)
    assert abs(float(c2[-1]) - float(c1[-1])) < 0.15 * float(c1[-1]) + 1e-3
    # absolute-trajectory improvement vs ground truth is bounded by the
    # intrinsic uncertainty of 1024 noisy odometry steps (long-wavelength
    # modes are weakly constrained) — assert a meaningful reduction, not
    # full recovery
    ate_before = _ate(t0, tg)
    for tx in (t1, t2):
        ate_after = _ate(tx, tg)
        assert ate_after < 0.8 * ate_before, (ate_before, ate_after)
