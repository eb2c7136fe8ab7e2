"""Bundle adjustment on synthetic multi-view problems: perturbed cameras and
points must converge back to low reprojection error (SURVEY.md §2.4 flagship
distributed workload; single-chip correctness here)."""
import numpy as np
import jax.numpy as jnp

from tpusfm.ba.solver import bundle_adjust, mean_reprojection_error
from tpusfm.ba.tracks import Observations, build_tracks
from tpusfm.config import BaConfig
from tpusfm.geometry.projection import project_points, rodrigues


def _synthetic_problem(n_views=4, n_points=120, noise=0.3, seed=0):
    rng = np.random.default_rng(seed)
    K = jnp.array([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]])
    dist = jnp.zeros(5)
    X = rng.uniform([-2, -2, 6], [2, 2, 10], size=(n_points, 3)).astype(np.float32)
    cams = []
    for v in range(n_views):
        rv = np.array([0.02 * v, 0.15 * v - 0.2, 0.01 * v], np.float32)
        tv = np.array([0.5 * v - 1.0, 0.05 * v, 0.1 * v], np.float32)
        cams.append(np.concatenate([rv, tv]))
    cams = np.stack(cams).astype(np.float32)
    obs_xy, obs_cam, obs_pt = [], [], []
    for v in range(n_views):
        pix = np.array(project_points(jnp.array(X), jnp.array(cams[v, :3]),
                                      jnp.array(cams[v, 3:]), K, dist))
        pix += rng.normal(size=pix.shape) * noise
        for p in range(n_points):
            obs_xy.append(pix[p])
            obs_cam.append(v)
            obs_pt.append(p)
    obs = Observations(
        xy=jnp.array(np.array(obs_xy, np.float32)),
        cam=jnp.array(np.array(obs_cam, np.int32)),
        pt=jnp.array(np.array(obs_pt, np.int32)),
        mask=jnp.ones(len(obs_xy), bool),
    )
    return K, dist, jnp.array(cams), jnp.array(X), obs


def test_ba_converges_from_perturbation():
    K, dist, cams, X, obs = _synthetic_problem()
    rng = np.random.default_rng(1)
    cams0 = np.array(cams)
    cams0[1:] += rng.normal(size=cams0[1:].shape).astype(np.float32) * 0.03
    X0 = np.array(X) + rng.normal(size=X.shape).astype(np.float32) * 0.1

    err0 = float(mean_reprojection_error(jnp.array(cams0), jnp.array(X0), obs, K, dist))
    cams1, X1, costs = bundle_adjust(jnp.array(cams0), jnp.array(X0), obs, K, dist,
                                     BaConfig(max_iters=15), n_fixed_cams=1)
    err1 = float(mean_reprojection_error(cams1, X1, obs, K, dist))
    assert err0 > 5.0, err0
    assert err1 < 0.5, (err0, err1)
    c = np.asarray(costs)
    assert c[-1] < c[0]


def test_ba_fixed_cameras_stay_fixed():
    K, dist, cams, X, obs = _synthetic_problem(n_views=3)
    rng = np.random.default_rng(2)
    cams0 = np.array(cams)
    cams0[1:] += 0.02
    X0 = np.array(X) + rng.normal(size=X.shape).astype(np.float32) * 0.05
    cams1, _, _ = bundle_adjust(jnp.array(cams0), jnp.array(X0), obs, K, dist,
                                BaConfig(max_iters=5), n_fixed_cams=1)
    np.testing.assert_array_equal(np.asarray(cams1)[0], cams0[0])


def test_build_tracks_merges_chains():
    # view0 kp0 <-> view1 kp3 <-> view2 kp7 forms one track of length 3
    pair_matches = {
        (0, 1): (np.array([0, 1]), np.array([3, 4]), np.array([True, True])),
        (1, 2): (np.array([3]), np.array([7]), np.array([True])),
    }
    kxy = [np.arange(20).reshape(10, 2).astype(np.float32) for _ in range(3)]
    obs, n_tracks = build_tracks(pair_matches, kxy, 3)
    assert n_tracks == 2
    cam = np.asarray(obs.cam)
    pt = np.asarray(obs.pt)
    lens = np.bincount(pt)
    assert sorted(lens.tolist()) == [2, 3]


def test_build_tracks_drops_conflicts():
    # two keypoints of view1 merged into one track -> dropped
    pair_matches = {
        (0, 1): (np.array([0, 0]), np.array([3, 4]), np.array([True, True])),
    }
    kxy = [np.arange(20).reshape(10, 2).astype(np.float32) for _ in range(2)]
    obs, n_tracks = build_tracks(pair_matches, kxy, 2)
    assert n_tracks == 0


def test_track_major_matches_flat_solver():
    """The at-scale track-major solver (ba/track_solver.py) must reproduce
    the dense-W baseline solver on the same problem (VERDICT r3 #6)."""
    from tpusfm.ba.track_solver import bundle_adjust_tm, to_track_major, tm_cost

    K, dist, cams, X, obs = _synthetic_problem(n_views=4, n_points=96)
    rng = np.random.default_rng(3)
    cams0 = jnp.asarray(np.array(cams) + np.concatenate(
        [np.zeros((1, 6)), rng.normal(size=(3, 6)).astype(np.float32) * 0.02]))
    X0 = jnp.asarray(np.array(X) + rng.normal(size=X.shape).astype(np.float32) * 0.05)
    cfg = BaConfig(max_iters=8)

    c1, p1, costs1 = bundle_adjust(cams0, X0, obs, K, dist, cfg, 1)
    tobs = to_track_major(obs, n_tracks=96)
    c2, p2, costs2 = bundle_adjust_tm(cams0, X0, tobs, K, dist, cfg, 1)

    e1 = float(mean_reprojection_error(c1, p1, obs, K, dist))
    e2 = float(mean_reprojection_error(c2, p2, obs, K, dist))
    assert e2 < 0.5, e2
    np.testing.assert_allclose(np.asarray(costs2), np.asarray(costs1),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c1), rtol=1e-2, atol=2e-3)


def test_to_track_major_vectorized_packing():
    """Vectorized packing (r5): slot order matches the per-observation loop
    semantics (original order within a track, excess dropped), and 100k+
    observations pack in well under a second (VERDICT r4 weak #7)."""
    import time as _time

    from tpusfm.ba.tracks import Observations
    from tpusfm.ba.track_solver import to_track_major

    rng = np.random.default_rng(5)
    n_obs, n_tracks = 120_000, 30_000
    pt = rng.integers(0, n_tracks, n_obs).astype(np.int32)
    cam = rng.integers(0, 24, n_obs).astype(np.int32)
    xy = rng.normal(size=(n_obs, 2)).astype(np.float32)
    mask = rng.random(n_obs) < 0.9
    obs = Observations(xy=jnp.asarray(xy), cam=jnp.asarray(cam),
                       pt=jnp.asarray(pt), mask=jnp.asarray(mask))

    t0 = _time.perf_counter()
    tobs = to_track_major(obs, n_tracks, n_slots=6)
    dt = _time.perf_counter() - t0
    assert dt < 1.0, f"packing took {dt:.2f}s"

    # reference: plain per-observation loop
    S = 6
    slot = np.zeros(n_tracks, np.int64)
    ref_xy = np.zeros((n_tracks, S, 2), np.float32)
    ref_cam = np.zeros((n_tracks, S), np.int32)
    ref_m = np.zeros((n_tracks, S), bool)
    for o in range(n_obs):
        if not mask[o]:
            continue
        p, s = pt[o], slot[pt[o]]
        if s >= S:
            continue
        ref_xy[p, s] = xy[o]
        ref_cam[p, s] = cam[o]
        ref_m[p, s] = True
        slot[p] = s + 1
    np.testing.assert_array_equal(np.asarray(tobs.mask), ref_m)
    np.testing.assert_array_equal(np.asarray(tobs.cam), ref_cam)
    np.testing.assert_array_equal(np.asarray(tobs.xy), ref_xy)
