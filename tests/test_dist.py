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
