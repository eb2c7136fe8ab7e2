"""End-to-end two-view SfM on a rendered synthetic scene with known
geometry: the full pipeline (SIFT -> match -> essential -> pose ->
triangulation) must recover the camera motion (SURVEY.md §4)."""
import numpy as np
import jax
import jax.numpy as jnp

from tpusfm.config import PipelineConfig, SiftConfig, MatchConfig, RansacConfig
from tpusfm.sfm import two_view_sfm
from tpusfm.sfm.fused import fused_two_view
from tpusfm.features.sift import sift_detect_and_compute
from tpusfm.types import CameraIntrinsics


def _render_views():
    """Textured plane at z=5 viewed fronto-parallel, second view translated
    +0.5 in x: expected relative pose R=I, t ~ [-1, 0, 0] (unit norm)."""
    rng = np.random.default_rng(0)
    H = W = 160
    f = 160.0
    # smooth random field: dense in blob-like DoG features at several scales
    from scipy.ndimage import gaussian_filter

    tex = gaussian_filter(rng.random((256, 256)), 2.0)
    tex += 0.5 * gaussian_filter(rng.random((256, 256)), 5.0)
    tex = ((tex - tex.min()) / (tex.max() - tex.min())).astype(np.float32)
    tex = tex[64:192, 64:192]  # central 128x128 crop

    def depth(wx):
        # non-planar surface: a plane is degenerate for the essential matrix
        return 5.0 + 1.0 * np.sin(wx * 1.5)

    def render(cam_x):
        ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
        u = (xs - W / 2) / f
        v = (ys - H / 2) / f
        # solve wx = cam_x + u * z(wx) by fixed point (contraction: |u|*1.5 < 1)
        wx = cam_x + u * 5.0
        for _ in range(20):
            wx = cam_x + u * depth(wx)
        wy = v * depth(wx)
        tx = np.clip((wx + 2.0) / 4.0 * 127, 0, 127)
        ty = np.clip((wy + 2.0) / 4.0 * 127, 0, 127)
        return tex[ty.astype(int), tx.astype(int)]

    return render(0.0), render(0.5)


_CFG = PipelineConfig(
    sift=SiftConfig(max_features=256, upsample=False),
    match=MatchConfig(max_matches=256),
    ransac=RansacConfig(n_hypotheses=128, threshold_px=2.0),
)


def test_two_view_pipeline_recovers_translation():
    g1, g2 = _render_views()
    intr = CameraIntrinsics.ideal(160.0, 160.0, 80.0, 80.0)
    f1 = sift_detect_and_compute(jnp.array(g1), _CFG.sift)
    f2 = sift_detect_and_compute(jnp.array(g2), _CFG.sift)
    r = two_view_sfm(f1, f2, intr, "bf", (160, 160), (160, 160), _CFG)
    assert int(r.n_inliers) >= 20, int(r.n_inliers)
    t = np.asarray(r.t)
    R = np.asarray(r.R)
    # R ~ identity, t ~ +-x direction
    assert np.abs(R - np.eye(3)).max() < 0.05, R
    assert abs(t[0]) > 0.98, t
    # triangulated points should lie near the z=5 plane (scale-normalized:
    # with |t|=1 and true baseline 0.5, depths come out near 10)
    X = np.asarray(r.points3d)[np.asarray(r.point_mask)]
    med_z = np.median(X[:, 2])
    assert 5.0 < med_z < 20.0, med_z


def test_fused_matches_composed_pipeline():
    g1, g2 = _render_views()
    intr = CameraIntrinsics.ideal(160.0, 160.0, 80.0, 80.0)
    rf = fused_two_view(jnp.array(g1), jnp.array(g2), intr.K, intr.dist,
                        (160, 160), (160, 160), _CFG)
    f1 = sift_detect_and_compute(jnp.array(g1), _CFG.sift)
    f2 = sift_detect_and_compute(jnp.array(g2), _CFG.sift)
    rc = two_view_sfm(f1, f2, intr, "bf", (160, 160), (160, 160), _CFG)
    assert int(rf.n_matches) == int(rc.n_matches)
    np.testing.assert_allclose(np.asarray(rf.R), np.asarray(rc.R), atol=1e-4)
    np.testing.assert_allclose(np.asarray(rf.t), np.asarray(rc.t), atol=1e-4)
