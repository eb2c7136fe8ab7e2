"""Multi-chip tests on the 8-device virtual CPU mesh (SURVEY.md §4):
sharded BA == single-chip BA; ring matching == plain NN; pair-parallel
matching correctness."""
import numpy as np
import jax
import jax.numpy as jnp

from tpusfm.ba.solver import bundle_adjust, mean_reprojection_error
from tpusfm.ba.tracks import Observations
from tpusfm.config import BaConfig
from tpusfm.dist.mesh import make_mesh
from tpusfm.dist.ring_match import ring_nn_search
from tpusfm.dist.pair_parallel import parallel_pair_match
from tpusfm.dist.sharded_ba import sharded_bundle_adjust
from tpusfm.kernels.distance import nn_search_xla

from test_ba import _synthetic_problem


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_ba_matches_single_chip():
    K, dist, cams, X, obs = _synthetic_problem(n_views=4, n_points=64)
    rng = np.random.default_rng(0)
    cams0 = jnp.asarray(np.array(cams) + np.concatenate(
        [np.zeros((1, 6)), rng.normal(size=(3, 6)) * 0.02]).astype(np.float32))
    X0 = jnp.asarray(np.array(X) + rng.normal(size=X.shape).astype(np.float32) * 0.05)
    cfg = BaConfig(max_iters=8)

    c1, p1, costs1 = bundle_adjust(cams0, X0, obs, K, dist, cfg, 1)
    mesh = make_mesh()
    c2, p2, costs2 = sharded_bundle_adjust(cams0, X0, obs, K, dist, mesh, cfg, 1)

    e1 = float(mean_reprojection_error(c1, p1, obs, K, dist))
    e2 = float(mean_reprojection_error(c2, p2, obs, K, dist))
    assert e2 < 0.6, e2
    np.testing.assert_allclose(e1, e2, rtol=0.1, atol=0.05)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-2)


def test_ring_nn_matches_plain():
    rng = np.random.default_rng(1)
    nq, ndb, d = 64, 128, 32   # divisible by 8
    q = rng.normal(size=(nq, d)).astype(np.float32)
    db = rng.normal(size=(ndb, d)).astype(np.float32)
    mask = np.ones(ndb, np.float32)
    mask[100:] = 0
    mesh = make_mesh()
    idx, best, second = ring_nn_search(jnp.array(q), jnp.array(db), jnp.array(mask), mesh)
    ridx, rbest, rsecond = nn_search_xla(jnp.array(q), jnp.array(db), jnp.array(mask))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))
    np.testing.assert_allclose(np.asarray(best), np.asarray(rbest), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(second), np.asarray(rsecond), rtol=1e-4, atol=1e-4)


def test_pipeline_parallel_two_view():
    """GPipe-style staged two-view pipeline (dist/pipeline.py) produces the
    serial chain's results for every micro-batch, at 2-stage and 4-stage
    splits. Counts may differ by a borderline RANSAC inlier (different op
    fusion inside scan/switch shifts f32 rounding)."""
    import jax.tree_util as jtu

    from tpusfm.config import MatchConfig, PipelineConfig, RansacConfig, SiftConfig
    from tpusfm.io import imread_gray
    from tpusfm.io.dataset import source_image
    from tpusfm.sfm.pipelined import two_view_pipelined, two_view_stages
    from tpusfm.types import CameraIntrinsics

    g1 = np.asarray(jax.image.resize(
        jnp.array(imread_gray(source_image("PikaBun1.jpg"))), (126, 168), "linear"))
    g2 = np.asarray(jax.image.resize(
        jnp.array(imread_gray(source_image("PikaBun4.jpg"))), (126, 168), "linear"))
    cfg = PipelineConfig(sift=SiftConfig(max_features=256),
                         match=MatchConfig(max_matches=128),
                         ransac=RansacConfig(n_hypotheses=64))
    intr = CameraIntrinsics.ideal(0.838 * 168, 0.838 * 168, 84, 63)
    M = 3
    pairs = jnp.asarray(np.stack([np.stack([g1 + i * 1e-4, g2]) for i in range(M)]))

    stages = two_view_stages(intr, cfg, 2)
    refs = [stages[1](stages[0](jtu.tree_map(lambda a: a[i], pairs))) for i in range(M)]

    for S in (2, 4):
        r = two_view_pipelined(pairs, intr, make_mesh(S), cfg)
        for i, ref in enumerate(refs):
            assert int(r.n_matches[i]) == int(ref.n_matches), (S, i)
            assert abs(int(r.n_inliers[i]) - int(ref.n_inliers)) <= 2, (S, i)
            # R agrees to a small rotation (borderline-inlier refit jitter)
            dR = np.asarray(r.R[i]) @ np.asarray(ref.R).T
            ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
            assert ang < 5.0, (S, i, ang)


def test_parallel_pair_match():
    rng = np.random.default_rng(2)
    B, N, D = 8, 32, 16
    d1 = rng.normal(size=(B, N, D)).astype(np.float32) * 5
    perms = np.stack([rng.permutation(N) for _ in range(B)])
    d2 = np.stack([d1[b][perms[b]] for b in range(B)])
    d2 += rng.normal(size=d2.shape).astype(np.float32) * 0.01
    mask = np.ones((B, N), bool)
    mesh = make_mesh()
    idx2, dist, valid = parallel_pair_match(
        jnp.array(d1), jnp.array(d2), jnp.array(mask), jnp.array(mask), mesh)
    idx2 = np.asarray(idx2)
    valid = np.asarray(valid)
    assert valid.mean() > 0.9
    for b in range(B):
        inv = np.empty(N, int)
        inv[perms[b]] = np.arange(N)
        got = idx2[b][valid[b]]
        want = inv[np.arange(N)][valid[b]]
        assert (got == want).mean() > 0.95


def _synthetic_sequence_features(n_views=4, n_points=200, seed=5):
    """Synthetic multi-view Features whose descriptors identify tracks, so
    the full incremental_sfm product path (match -> tracks -> PnP -> BA)
    runs without image decoding/SIFT cost."""
    from tpusfm.geometry.projection import project_points
    from tpusfm.types import CameraIntrinsics, Features, Keypoints

    rng = np.random.default_rng(seed)
    intr = CameraIntrinsics.ideal(300.0, 300.0, 160.0, 120.0)
    X = rng.uniform([-2, -2, 6], [2, 2, 10], size=(n_points, 3)).astype(np.float32)
    base_desc = rng.normal(size=(n_points, 32)).astype(np.float32) * 5
    feats, sizes = [], []
    for v in range(n_views):
        rv = jnp.asarray(np.array([0.02 * v, 0.1 * v - 0.15, 0.01 * v], np.float32))
        tv = jnp.asarray(np.array([0.4 * v - 0.8, 0.04 * v, 0.05 * v], np.float32))
        pix = np.array(project_points(jnp.asarray(X), rv, tv, intr.K, intr.dist))
        pix += rng.normal(size=pix.shape).astype(np.float32) * 0.2
        desc = base_desc + rng.normal(size=base_desc.shape).astype(np.float32) * 0.01
        n = n_points
        feats.append(Features(
            kpts=Keypoints(
                xy=jnp.asarray(pix.astype(np.float32)),
                scale=jnp.ones(n, jnp.float32),
                angle=jnp.zeros(n, jnp.float32),
                response=jnp.ones(n, jnp.float32),
                mask=jnp.ones(n, bool),
            ),
            desc=jnp.asarray(desc),
        ))
        sizes.append((320, 240))
    return feats, sizes, intr


def test_incremental_sfm_sharded_ba_matches_single_chip():
    """The product path (`cli sfm-seq --devices N`): incremental_sfm with a
    mesh shards every BA solve; the reconstruction must match the
    single-chip run."""
    from tpusfm.ba.multiview import incremental_sfm
    from tpusfm.config import PipelineConfig

    feats, sizes, intr = _synthetic_sequence_features()
    cfg = PipelineConfig()
    r1 = incremental_sfm(feats, sizes, intr, cfg, algo="bf")
    r2 = incremental_sfm(feats, sizes, intr, cfg, algo="bf", mesh=make_mesh())
    e1 = r1["metrics"]["reproj_error_px"]
    e2 = r2["metrics"]["reproj_error_px"]
    assert e1 < 1.0, e1
    np.testing.assert_allclose(e1, e2, rtol=0.05, atol=0.02)
    assert r1["metrics"]["n_registered"] == r2["metrics"]["n_registered"]
    np.testing.assert_allclose(np.asarray(r1["cams"]), np.asarray(r2["cams"]),
                               atol=5e-2)


def test_disparity_dense_ring_matches_single_chip():
    """The product path (`cli disparity --density dense --devices N`): the
    ring-sharded dense NN match must reproduce the single-device RMS grid
    cell."""
    from tpusfm.io import imread_gray
    from tpusfm.io.dataset import source_image
    from tpusfm.stereo.disparity import run_disparity_benchmark

    def tiny(name):
        g = imread_gray(source_image(name))
        return jnp.asarray(np.asarray(
            jax.image.resize(jnp.array(g), (48, 64), "linear")))

    left, right, gt = tiny("left1.png"), tiny("right1.png"), tiny("left_gt1.png")
    r1 = run_disparity_benchmark(left, right, gt, "sift", "dense", 4.0)
    r2 = run_disparity_benchmark(left, right, gt, "sift", "dense", 4.0,
                                 mesh=make_mesh())
    assert r1["count"] == r2["count"], (r1["count"], r2["count"])
    np.testing.assert_allclose(r1["rms"], r2["rms"], rtol=1e-4)


def test_parallel_two_view_matches_batch():
    """Data-parallel product path: full two-view SfM with pairs sharded over
    the mesh == single-device two_view_batch."""
    import jax.tree_util as jtu

    from tpusfm.config import PipelineConfig
    from tpusfm.dist.pair_parallel import parallel_two_view
    from tpusfm.sfm.two_view import two_view_batch
    from tpusfm.types import CameraIntrinsics

    feats, sizes, intr = _synthetic_sequence_features(n_views=2, n_points=256)
    B = 8
    f1 = jtu.tree_map(lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), feats[0])
    f2 = jtu.tree_map(lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), feats[1])
    cfg = PipelineConfig()
    r1 = two_view_batch(f1, f2, intr, cfg)
    r2 = parallel_two_view(f1, f2, intr, make_mesh(), cfg)
    np.testing.assert_array_equal(np.asarray(r1.n_matches), np.asarray(r2.n_matches))
    np.testing.assert_array_equal(np.asarray(r1.n_inliers), np.asarray(r2.n_inliers))
    np.testing.assert_allclose(np.asarray(r1.R), np.asarray(r2.R), atol=1e-5)


def test_ring_nn_blocked_matches_plain():
    """Blocked-local ring matching (the dense-scale configuration) must be
    exactly equivalent to the unblocked ring and the plain search."""
    rng = np.random.default_rng(7)
    nq, ndb, d = 128, 256, 32
    q = rng.normal(size=(nq, d)).astype(np.float32)
    db = rng.normal(size=(ndb, d)).astype(np.float32)
    mask = np.ones(ndb, np.float32)
    mask[200:] = 0
    mesh = make_mesh()
    idx, best, second = ring_nn_search(jnp.array(q), jnp.array(db),
                                       jnp.array(mask), mesh, block=8)
    ridx, rbest, rsecond = nn_search_xla(jnp.array(q), jnp.array(db), jnp.array(mask))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))
    np.testing.assert_allclose(np.asarray(best), np.asarray(rbest), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(second), np.asarray(rsecond), rtol=1e-4, atol=1e-4)


def test_sharded_track_major_ba_matches_single_device():
    """Track-sharded at-scale BA (sharded_bundle_adjust_tm) == bundle_adjust_tm."""
    from tpusfm.ba.track_solver import bundle_adjust_tm, to_track_major
    from tpusfm.dist.sharded_ba import sharded_bundle_adjust_tm

    K, dist, cams, X, obs = _synthetic_problem(n_views=4, n_points=96)
    rng = np.random.default_rng(3)
    cams0 = jnp.asarray(np.array(cams) + np.concatenate(
        [np.zeros((1, 6)), rng.normal(size=(3, 6)).astype(np.float32) * 0.02]))
    X0 = jnp.asarray(np.array(X) + rng.normal(size=X.shape).astype(np.float32) * 0.05)
    cfg = BaConfig(max_iters=8)
    tobs = to_track_major(obs, n_tracks=96)

    c1, p1, costs1 = bundle_adjust_tm(cams0, X0, tobs, K, dist, cfg, 1)
    mesh = make_mesh()
    c2, p2, costs2 = sharded_bundle_adjust_tm(cams0, X0, tobs, K, dist, mesh,
                                              cfg, 1)
    np.testing.assert_allclose(np.asarray(costs2), np.asarray(costs1),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c1), atol=2e-3)
    # Point coords are the noisiest output: near convergence, float
    # reassociation (different fusion on 1 vs 8 devices) flips LM
    # accept/reject boundaries and the per-track V^-1 amplifies the
    # difference (measured: 1e-5 after 2 iters, ~9e-3 after 8, while costs
    # stay within 1e-4 relative) — so points get a looser absolute bound
    # on ~10-unit coordinates.
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), atol=2e-2)


def test_sharded_gms_matches_single_device():
    """Mesh-sharded GMS vote grid == single-device gms_filter (SURVEY §2.4)."""
    from tpusfm.config import GmsConfig
    from tpusfm.dist.sharded_gms import sharded_gms_filter
    from tpusfm.match.gms import gms_filter
    from tpusfm.types import Keypoints, Matches

    rng = np.random.default_rng(7)
    n = 600
    w, h = 320, 240
    xy1 = rng.uniform([0, 0], [w, h], size=(n, 2)).astype(np.float32)
    # coherent motion for 70% + outliers
    shift = np.array([12.0, -7.0], np.float32)
    xy2 = xy1 + shift
    out = rng.random(n) > 0.7
    xy2[out] = rng.uniform([0, 0], [w, h], size=(int(out.sum()), 2))

    def kp(xy):
        return Keypoints(xy=jnp.asarray(xy), scale=jnp.ones(n),
                         angle=jnp.zeros(n), response=jnp.ones(n),
                         mask=jnp.ones(n, bool))

    m = Matches(idx1=jnp.arange(n, dtype=jnp.int32),
                idx2=jnp.arange(n, dtype=jnp.int32),
                distance=jnp.zeros(n), mask=jnp.ones(n, bool))
    cfg = GmsConfig(with_rotation=True, with_scale=True)
    r1 = gms_filter(kp(xy1), kp(xy2), m, (w, h), (w, h), cfg)
    mesh = make_mesh()
    r2 = sharded_gms_filter(kp(xy1), kp(xy2), m, (w, h), (w, h), mesh, cfg)
    np.testing.assert_array_equal(np.asarray(r2.mask), np.asarray(r1.mask))
    assert int(np.asarray(r1.mask).sum()) > 0


def test_fused_ring_gms_matches_reference():
    """Fused dense-mode [ring NN + GMS votes] in one shard_map (r5, VERDICT
    r4 #6) == plain nn_search followed by gms_filter."""
    from tpusfm.config import GmsConfig
    from tpusfm.dist.fused_dense import ring_match_gms
    from tpusfm.match.gms import gms_filter
    from tpusfm.types import Keypoints, Matches

    rng = np.random.default_rng(11)
    n = 256  # divisible by the 8-device mesh
    w, h = 640, 480
    # inliers concentrated in a small region so their per-cell support
    # clears the GMS statistical threshold
    xy1 = rng.uniform([0, 0], [w, h], (n, 2)).astype(np.float32)
    inl = np.arange(n) < (3 * n) // 4
    xy1[inl] = rng.uniform([200, 150], [400, 300], (inl.sum(), 2))
    shift = np.array([35.0, -12.0], np.float32)
    xy2 = np.empty_like(xy1)
    xy2[inl] = np.clip(xy1[inl] + shift, 0, [w - 1, h - 1])
    xy2[~inl] = rng.uniform([0, 0], [w, h], ((~inl).sum(), 2))
    desc = rng.normal(size=(n, 32)).astype(np.float32) * 4
    d1 = desc + rng.normal(size=desc.shape).astype(np.float32) * 0.05
    d2 = desc.copy()

    q = jnp.asarray(d1)
    db = jnp.asarray(d2)
    dbm = jnp.ones((n,), jnp.float32)
    cfg = GmsConfig()

    # reference: plain NN + gms_filter on the equivalent match structure
    idx_r, best_r, _ = nn_search_xla(q, db, dbm)
    kp = lambda xy: Keypoints(xy=jnp.asarray(xy), scale=jnp.ones(n),
                              angle=jnp.zeros(n), response=jnp.ones(n),
                              mask=jnp.ones(n, bool))
    mref = Matches(idx1=jnp.arange(n, dtype=jnp.int32), idx2=idx_r,
                   distance=best_r, mask=idx_r >= 0)
    ref = gms_filter(kp(xy1), kp(xy2), mref, (w, h), (w, h), cfg)

    mesh = make_mesh()
    idx_f, best_f, _, inl_f = ring_match_gms(
        q, db, dbm, jnp.asarray(xy1), jnp.asarray(xy2), (w, h), (w, h),
        mesh, cfg)

    np.testing.assert_array_equal(np.asarray(idx_f), np.asarray(idx_r))
    np.testing.assert_array_equal(np.asarray(inl_f), np.asarray(ref.mask))
    assert int(np.asarray(inl_f).sum()) > 0  # the planted shift survives
