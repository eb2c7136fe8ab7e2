"""Geometry layer on synthetic cameras: essential/RANSAC, pose recovery,
triangulation, undistortion, PnP (SURVEY.md §4 test strategy)."""
import numpy as np
import jax
import jax.numpy as jnp

from tpusfm.config import RansacConfig
from tpusfm.geometry.projection import rodrigues, rodrigues_inv, project_points
from tpusfm.geometry.undistort import undistort_points
from tpusfm.geometry.triangulate import triangulate_pair
from tpusfm.geometry.epipolar import find_essential_ransac, sampson_error
from tpusfm.geometry.pose import recover_pose
from tpusfm.geometry.pnp import pnp_ransac


def _synthetic_two_view(n=200, outliers=40, seed=0, noise=0.0):
    rng = np.random.default_rng(seed)
    X = rng.uniform([-1, -1, 4], [1, 1, 8], size=(n, 3)).astype(np.float32)
    rvec = np.array([0.05, -0.3, 0.02], np.float32)
    tvec = np.array([0.8, 0.05, 0.1], np.float32)
    R = np.asarray(rodrigues(jnp.array(rvec)))
    x1 = X[:, :2] / X[:, 2:]
    Xc = X @ R.T + tvec
    x2 = Xc[:, :2] / Xc[:, 2:]
    if noise:
        x1 += rng.normal(size=x1.shape) * noise
        x2 += rng.normal(size=x2.shape) * noise
    if outliers:
        idx = rng.choice(n, outliers, replace=False)
        x2[idx] += rng.uniform(-0.3, 0.3, size=(outliers, 2))
    return X, R, tvec, x1.astype(np.float32), x2.astype(np.float32), idx if outliers else None


def test_rodrigues_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(5):
        r = rng.normal(size=3).astype(np.float32)
        R = rodrigues(jnp.array(r))
        np.testing.assert_allclose(np.asarray(R) @ np.asarray(R).T, np.eye(3), atol=1e-5)
        r2 = rodrigues_inv(R)
        np.testing.assert_allclose(np.asarray(r2), r, atol=1e-4)


def test_essential_ransac_and_pose():
    X, R, t, x1, x2, out_idx = _synthetic_two_view()
    mask = jnp.ones(len(x1), bool)
    E, inl, n_inl = find_essential_ransac(
        jnp.array(x1), jnp.array(x2), mask, focal=800.0,
        cfg=RansacConfig(n_hypotheses=256, threshold_px=1.5),
    )
    inl = np.asarray(inl)
    assert int(n_inl) >= 150
    # outliers must be excluded
    assert inl[out_idx].mean() < 0.1
    # recovered pose direction matches ground truth
    Rr, tr, ok = recover_pose(E, jnp.array(x1), jnp.array(x2), jnp.array(inl))
    Rr, tr = np.asarray(Rr), np.asarray(tr)
    t_unit = t / np.linalg.norm(t)
    assert abs(np.dot(tr, t_unit)) > 0.99, (tr, t_unit)
    assert np.abs(Rr - R).max() < 0.02


def test_triangulation_recovers_points():
    X, R, t, x1, x2, _ = _synthetic_two_view(outliers=0)
    Xr = triangulate_pair(jnp.array(R), jnp.array(t), jnp.array(x1), jnp.array(x2))
    np.testing.assert_allclose(np.asarray(Xr), X, atol=1e-3)


def test_undistort_inverts_distortion():
    rng = np.random.default_rng(2)
    K = jnp.array([[800.0, 0, 320], [0, 800, 240], [0, 0, 1]])
    dist = jnp.array([-0.2, 0.05, 0.001, -0.002, 0.01])
    X = rng.uniform([-1, -1, 4], [1, 1, 8], size=(100, 3)).astype(np.float32)
    rvec = jnp.zeros(3)
    tvec = jnp.zeros(3)
    pix = project_points(jnp.array(X), rvec, tvec, K, dist)
    xn = undistort_points(pix, K, dist)
    np.testing.assert_allclose(np.asarray(xn), X[:, :2] / X[:, 2:], atol=1e-4)


def test_pnp_ransac():
    rng = np.random.default_rng(3)
    X = rng.uniform([-1, -1, 4], [1, 1, 8], size=(150, 3)).astype(np.float32)
    rvec = np.array([0.1, 0.2, -0.05], np.float32)
    tvec = np.array([0.3, -0.2, 0.5], np.float32)
    R = np.asarray(rodrigues(jnp.array(rvec)))
    Xc = X @ R.T + tvec
    xn = (Xc[:, :2] / Xc[:, 2:]).astype(np.float32)
    out = rng.choice(150, 30, replace=False)
    xn[out] += rng.uniform(0.05, 0.2, size=(30, 2)).astype(np.float32)
    rv, tv, inl, n = pnp_ransac(jnp.array(X), jnp.array(xn), jnp.ones(150, bool), focal=800.0)
    assert int(n) >= 100
    np.testing.assert_allclose(np.asarray(rv), rvec, atol=5e-3)
    np.testing.assert_allclose(np.asarray(tv), tvec, atol=5e-3)
    assert np.asarray(inl)[out].mean() < 0.1


def test_sampson_zero_for_exact():
    X, R, t, x1, x2, _ = _synthetic_two_view(outliers=0)
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    err = sampson_error(jnp.array(E, dtype=jnp.float32), jnp.array(x1), jnp.array(x2))
    assert float(jnp.max(err)) < 1e-6


def test_five_point_minimal_solver():
    """Candidates from 5 exact correspondences satisfy epipolar constraints
    on held-out points, for general AND planar scenes (where the linear
    8-point solver degenerates)."""
    from tpusfm.geometry.five_point import five_point_essential

    rng = np.random.default_rng(7)
    for planar in (False, True):
        r = rng.normal(size=3).astype(np.float32) * 0.1
        R = np.asarray(rodrigues(jnp.array(r)))
        t = rng.normal(size=3).astype(np.float32)
        t /= np.linalg.norm(t)
        X = rng.uniform([-1, -1, 4], [1, 1, 8], size=(50, 3))
        if planar:
            X[:, 2] = 5.0 + 0.3 * X[:, 0] - 0.2 * X[:, 1]
        x1 = X[:, :2] / X[:, 2:]
        Xc = X @ R.T + t
        x2 = Xc[:, :2] / Xc[:, 2:]
        Es, valid = five_point_essential(
            jnp.array(x1[:5], jnp.float32), jnp.array(x2[:5], jnp.float32))
        Es, valid = np.asarray(Es), np.asarray(valid)
        assert valid.sum() >= 1
        h1 = np.concatenate([x1, np.ones((50, 1))], 1)
        h2 = np.concatenate([x2, np.ones((50, 1))], 1)
        best = min(
            np.abs(np.einsum("ni,ij,nj->n", h2, E, h1)).max()
            for E, v in zip(Es, valid) if v)
        assert best < 5e-3, (planar, best)


def test_essential_ransac_planar_scene():
    """Five-point RANSAC (the default) recovers pose from a purely planar
    scene -- the configuration where 8-point essential estimation is
    degenerate (reference handles this via findEssentialMat's 5-point,
    /root/reference/SfM-GMS/SfM-GMS/SfMUtil.cpp:39)."""
    rng = np.random.default_rng(11)
    r = np.array([0.04, -0.2, 0.05], np.float32)
    R = np.asarray(rodrigues(jnp.array(r)))
    t = np.array([0.7, 0.1, 0.15], np.float32)
    t /= np.linalg.norm(t)
    X = rng.uniform([-1, -1, 0], [1, 1, 0], size=(200, 3)).astype(np.float32)
    X[:, 2] = 5.0 + 0.4 * X[:, 0] + 0.25 * X[:, 1]      # a tilted plane
    x1 = X[:, :2] / X[:, 2:]
    Xc = X @ R.T + t
    x2 = Xc[:, :2] / Xc[:, 2:]
    mask = jnp.ones(len(x1), bool)
    E, inl, n_inl = find_essential_ransac(
        jnp.array(x1, jnp.float32), jnp.array(x2, jnp.float32), mask,
        focal=800.0, cfg=RansacConfig(n_hypotheses=256, threshold_px=1.5,
                                      solver="five_point"),
    )
    assert int(n_inl) >= 150, int(n_inl)
    Rr, tr, ok = recover_pose(E, jnp.array(x1), jnp.array(x2), inl)
    Rr, tr = np.asarray(Rr), np.asarray(tr)
    assert abs(np.dot(tr, t)) > 0.99, (tr, t)
    assert np.abs(Rr - R).max() < 0.02


def test_eight_point_minimal_null_vector():
    """The minimal 8-row system must return the true null vector (an economy
    SVD of an 8x9 A spans only the row space and silently returns a
    non-null row — ADVICE round 2). Noiseless sample -> Sampson ~ 0."""
    from tpusfm.geometry.epipolar import _eight_point

    X, R, t, x1, x2, _ = _synthetic_two_view(n=8, outliers=0, seed=3, noise=0.0)
    E = _eight_point(jnp.array(x1), jnp.array(x2))
    err = np.asarray(sampson_error(E, jnp.array(x1), jnp.array(x2)))
    assert err.max() < 1e-10, err

    # and the weighted >= 9-row path stays exact too
    X, R, t, x1, x2, _ = _synthetic_two_view(n=50, outliers=0, seed=4, noise=0.0)
    w = jnp.ones((50,), jnp.float32)
    E = _eight_point(jnp.array(x1), jnp.array(x2), w)
    err = np.asarray(sampson_error(E, jnp.array(x1), jnp.array(x2)))
    assert err.max() < 1e-10, err


def test_triangulate_closed_form_matches_svd_oracle():
    """The closed-form normal-equation triangulation (TPU fast path) must
    agree with the 4x4 null-space SVD estimator on realistic noisy data."""
    from tpusfm.geometry.triangulate import triangulate_dlt, triangulate_dlt_svd

    rng = np.random.default_rng(11)
    X = rng.uniform([-2, -2, 4], [2, 2, 10], size=(200, 3)).astype(np.float32)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0.5, 0.0, 0.0], np.float32)
    x1 = X[:, :2] / X[:, 2:]
    Xc2 = X @ R.T + t
    x2 = Xc2[:, :2] / Xc2[:, 2:]
    x1 += rng.normal(size=x1.shape).astype(np.float32) * 1e-3
    x2 += rng.normal(size=x2.shape).astype(np.float32) * 1e-3
    P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1)
    P2 = jnp.concatenate([jnp.asarray(R), jnp.asarray(t).reshape(3, 1)], 1)
    Xa = np.asarray(triangulate_dlt(P1, P2, jnp.asarray(x1), jnp.asarray(x2)))
    Xb = np.asarray(triangulate_dlt_svd(P1, P2, jnp.asarray(x1), jnp.asarray(x2)))
    np.testing.assert_allclose(Xa, Xb, rtol=2e-2, atol=2e-2)
    # depth error scales as z^2 * sigma / baseline (~0.2 per sigma at z=10,
    # b=0.5): bound the max by a few sigma and the bulk much tighter
    err = np.abs(Xa - X)
    assert err.max() < 1.0, err.max()
    assert np.median(err) < 0.05, np.median(err)
