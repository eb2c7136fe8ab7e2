"""StereoBM agreement with cv2.StereoBM under the reference's parameters.

The reference's StereoBM demo (/root/reference/SfM-GMS/SfM-GMS/DisparityUtil.cpp:22-49)
runs cv::StereoBM with numDisparities=224, minDisparity=-39, XSOBEL prefilter
cap 61, textureThreshold=507, uniqueness=0, disp12MaxDiff=1 on the robot pair
(:465-466,479). Here the same configuration (scaled to a CPU-sized image) is
run through both engines and the disparity fields are compared directly:
among jointly-valid pixels, >=90% must agree within 1 disparity.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpusfm.config import StereoBMConfig
from tpusfm.io import imread_gray
from tpusfm.io.dataset import source_image
from tpusfm.stereo.block_matching import stereo_bm

cv2 = pytest.importorskip("cv2")


def test_stereo_bm_agrees_with_cv2_on_robot_pair():
    gl = imread_gray(source_image("leftRobot.png"))
    gr = imread_gray(source_image("rightRobot.png"))
    s = 0.25  # CPU-sized; disparity range scales with resolution
    hw = (int(gl.shape[0] * s), int(gl.shape[1] * s))
    gl_s = np.asarray(jax.image.resize(jnp.array(gl), hw, "linear"))
    gr_s = np.asarray(jax.image.resize(jnp.array(gr), hw, "linear"))
    nd, mind = 64, -16  # 224 / -39 at quarter resolution

    cfg = StereoBMConfig(num_disparities=nd, min_disparity=mind, block_size=21,
                         texture_threshold=507, uniqueness_ratio=0,
                         disp12_max_diff=1)
    disp, valid = stereo_bm(jnp.array(gl_s), jnp.array(gr_s), cfg)
    disp, valid = np.asarray(disp), np.asarray(valid)

    bm = cv2.StereoBM_create(numDisparities=nd, blockSize=21)
    bm.setPreFilterType(cv2.STEREO_BM_PREFILTER_XSOBEL)
    bm.setPreFilterCap(61)
    bm.setMinDisparity(mind)
    bm.setTextureThreshold(507)
    bm.setUniquenessRatio(0)
    bm.setSpeckleWindowSize(0)
    bm.setSpeckleRange(8)
    bm.setDisp12MaxDiff(1)
    dl = bm.compute((gl_s * 255).astype(np.uint8),
                    (gr_s * 255).astype(np.uint8)).astype(np.float32) / 16.0
    cv_valid = dl > (mind - 1) + 0.5  # OpenCV marks invalid as minDisparity-1

    both = valid & cv_valid
    assert both.mean() > 0.35, both.mean()
    agree = (np.abs(disp - dl)[both] <= 1.0).mean()
    assert agree >= 0.90, agree
