"""Stereo suite: box/median filters, native CCL, StereoBM on synthetic
shifted texture, match-disparity RMS metric (DisparityUtil capability)."""
import numpy as np
import jax.numpy as jnp

from tpusfm.config import StereoBMConfig
from tpusfm.native import connected_components, have_native, filter_speckles
from tpusfm.stereo.block_matching import stereo_bm
from tpusfm.stereo.disparity import match_disparity_image, disparity_rms
from tpusfm.stereo.filters import box_filter, median_blur, dilate
from tpusfm.types import Keypoints, Matches


def test_box_filter_matches_naive():
    rng = np.random.default_rng(0)
    img = rng.random((20, 24)).astype(np.float32)
    r = 2
    out = np.asarray(box_filter(jnp.array(img), r))
    pad = np.pad(img, r)
    naive = np.zeros_like(img)
    for y in range(20):
        for x in range(24):
            naive[y, x] = pad[y : y + 2 * r + 1, x : x + 2 * r + 1].sum()
    np.testing.assert_allclose(out, naive, rtol=1e-5, atol=1e-5)


def test_median_blur_matches_numpy():
    rng = np.random.default_rng(1)
    img = rng.random((16, 18)).astype(np.float32)
    r = 1
    out = np.asarray(median_blur(jnp.array(img), r)) * 255
    q = np.clip(np.round(img * 255), 0, 255)
    pad = np.pad(q, r, mode="constant")
    for y in range(4, 12):
        for x in range(4, 14):
            win = pad[y : y + 3, x : x + 3]
            assert abs(out[y, x] - np.median(win)) <= 1.0, (y, x, out[y, x], np.median(win))


def test_connected_components():
    mask = np.zeros((20, 30), np.uint8)
    mask[2:6, 2:6] = 1       # area 16
    mask[10:18, 10:25] = 1   # area 120
    mask[1, 28] = 1          # area 1
    labels, n, areas = connected_components(mask, 8)
    assert n == 3
    assert sorted(areas.tolist()) == [1, 16, 120]
    assert labels[3, 3] != labels[12, 12]
    assert (labels > 0).sum() == mask.sum()


def test_native_lib_builds():
    assert have_native(), "C++ native module failed to build"


def test_filter_speckles():
    disp = np.zeros((20, 20), np.float32)
    valid = np.zeros((20, 20), np.uint8)
    valid[5:15, 5:15] = 1     # big region (100 px)
    valid[0:2, 0:2] = 1       # speckle (4 px)
    d, v = filter_speckles(disp, valid, max_diff=1.0, max_size=20)
    assert v[6, 6]
    assert not v[0, 0]


def test_stereo_bm_recovers_constant_shift():
    rng = np.random.default_rng(2)
    w, h, d_true = 160, 64, 12
    tex = rng.random((h, w + d_true)).astype(np.float32)
    left = tex[:, :-d_true]
    right = tex[:, d_true:]  # left_x matches right_(x - d_true)
    cfg = StereoBMConfig(num_disparities=32, min_disparity=0, block_size=9,
                         texture_threshold=0, disp12_max_diff=1)
    disp, valid = stereo_bm(jnp.array(left), jnp.array(right), cfg)
    disp = np.asarray(disp)
    valid = np.asarray(valid)
    interior = valid[10:-10, 24:-24]
    assert interior.mean() > 0.8
    err = np.abs(disp[10:-10, 24:-24] - d_true)[interior]
    assert np.median(err) < 0.51, np.median(err)


def test_match_disparity_and_rms():
    # two keypoints with known disparities, gt image consistent with one
    k1 = Keypoints(
        xy=jnp.array([[4.0, 3.0], [10.0, 7.0]]),
        scale=jnp.ones(2), angle=jnp.zeros(2), response=jnp.ones(2),
        mask=jnp.ones(2, bool),
    )
    k2 = Keypoints(
        xy=jnp.array([[1.0, 3.0], [2.0, 7.0]]),
        scale=jnp.ones(2), angle=jnp.zeros(2), response=jnp.ones(2),
        mask=jnp.ones(2, bool),
    )
    m = Matches(idx1=jnp.array([0, 1]), idx2=jnp.array([0, 1]),
                distance=jnp.zeros(2), mask=jnp.ones(2, bool))
    disp, valid = match_disparity_image(k1, k2, m, 12, 16)
    assert float(disp[3, 4]) == 3.0
    assert float(disp[7, 10]) == 8.0
    assert int(np.asarray(valid).sum()) == 2
    gt = np.zeros((12, 16), np.float32)
    gt[3, 4] = 12 / 255.0   # gt/disp_ratio = 3 -> err 0
    gt[7, 10] = 20 / 255.0  # gt/disp_ratio = 5 -> err 3
    rms, n = disparity_rms(disp, valid, jnp.array(gt), 4.0)
    assert int(n) == 2
    np.testing.assert_allclose(float(rms), np.sqrt((0 + 9) / 2), rtol=1e-5)
