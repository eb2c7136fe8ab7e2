"""Calibration: synthetic-board K recovery and chessboard detection on a
rendered board (capability of CalibrationUtil + cv::calibrateCamera,
reference main.cpp:59-67)."""
import numpy as np
import jax.numpy as jnp

from tpusfm.calib.chessboard import find_chessboard_corners
from tpusfm.calib.zhang import board_object_points, calibrate_camera
from tpusfm.geometry.projection import project_points


def _synthetic_views(K, dist, n_views=6, rows=6, cols=9, noise=0.1, seed=0):
    rng = np.random.default_rng(seed)
    obj = board_object_points(rows, cols)
    views = []
    rvs, tvs = [], []
    for v in range(n_views):
        rv = np.array([0.1, 0.1, 0.0]) * rng.normal(size=3) + np.array([0.2, -0.15, 0.05]) * (v - 2)
        tv = np.array([-4.0 + rng.normal() * 0.5, -2.5 + rng.normal() * 0.5, 14.0 + v])
        pix = np.array(project_points(jnp.array(obj), jnp.array(rv, dtype=jnp.float32),
                                      jnp.array(tv, dtype=jnp.float32), jnp.array(K), jnp.array(dist)))
        pix += rng.normal(size=pix.shape) * noise
        views.append(pix.astype(np.float32))
        rvs.append(rv)
        tvs.append(tv)
    return obj, np.stack(views), rvs, tvs


def test_calibrate_recovers_intrinsics():
    K = np.array([[500.0, 0, 320], [0, 495.0, 240], [0, 0, 1]], np.float32)
    dist = np.array([-0.15, 0.05, 0.001, -0.001, 0.0], np.float32)
    obj, views, _, _ = _synthetic_views(K, dist)
    intr, rv, tv, rms = calibrate_camera(obj, views, (640, 480))
    Kr = np.asarray(intr.K)
    assert abs(Kr[0, 0] - 500) < 5, Kr
    assert abs(Kr[1, 1] - 495) < 5, Kr
    assert abs(Kr[0, 2] - 320) < 5, Kr
    assert abs(Kr[1, 2] - 240) < 5, Kr
    dr = np.asarray(intr.dist)
    assert abs(dr[0] + 0.15) < 0.03, dr
    assert rms < 0.3, rms


def test_calibrate_real_chessboard_images():
    """The reference's actual calibration task: 10 photos of a 6x9 board at
    2016x1512 (/root/reference/SfM-GMS/CalibrationImages, driver
    main.cpp:59-67). Requires >=8/10 boards detected and an LM-refined
    reprojection RMS below 1.2 px (cv2.calibrateCamera on the same
    correspondences reports 1.0638 px)."""
    import os

    import pytest

    from tpusfm.io import imread_gray

    root = "/root/reference/SfM-GMS/CalibrationImages"
    if not os.path.isdir(root):
        pytest.skip("reference calibration images unavailable")
    rows, cols = 6, 9
    pts = []
    for i in range(10):
        g = imread_gray(os.path.join(root, f"IMG_{i}.jpg"))
        c, found = find_chessboard_corners(g, rows, cols)
        if found:
            pts.append(c)
    assert len(pts) >= 8, f"only {len(pts)}/10 boards found"
    h, w = np.asarray(g).shape
    intr, _, _, rms = calibrate_camera(board_object_points(rows, cols), np.stack(pts), (w, h))
    K = np.asarray(intr.K)
    assert rms < 1.2, rms
    # fx/fy from the committed artifact (cv2 parity: 1664.2 / 1663.5)
    assert abs(K[0, 0] - 1664.0) < 40, K
    assert abs(K[1, 1] - 1664.0) < 40, K
    assert abs(K[0, 2] - w / 2) < 0.05 * w, K
    assert abs(K[1, 2] - h / 2) < 0.05 * h, K


def test_chessboard_detection_synthetic():
    # render an 8x11-square checkerboard -> 7x10 inner corners; ask for 6x9 sub?
    # render exactly (rows+1)x(cols+1) squares so inner corners = rows x cols
    rows, cols = 6, 9
    sq = 24
    board = np.add.outer(np.arange((rows + 1) * sq) // sq,
                         np.arange((cols + 1) * sq) // sq) % 2
    img = np.full((320, 380), 0.6, np.float32)
    y0, x0 = 40, 50
    patch = np.where(board, 0.9, 0.1).astype(np.float32)
    img[y0 : y0 + patch.shape[0], x0 : x0 + patch.shape[1]] = patch
    corners, ok = find_chessboard_corners(img, rows, cols)
    assert ok
    # inner corners at x0 + k*sq, y0 + j*sq for k=1..cols, j=1..rows
    expect = np.array([[x0 + (k + 1) * sq, y0 + (j + 1) * sq]
                       for j in range(rows) for k in range(cols)], np.float32)
    # ordering may be flipped/transposed; compare as sets via NN distance
    from scipy.spatial import cKDTree
    d, _ = cKDTree(expect).query(corners)
    assert d.max() < 1.0, d.max()
