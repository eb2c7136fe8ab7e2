"""Rotation/rescale robustness probes as regression tests.

Mirrors the reference driver's implicit invariance test
(/root/reference/SfM-GMS/SfM-GMS/main.cpp:29-47): BF and GMS matching are
re-run on the Disparity_L/R pair after rotating image 2 by 180 deg
(img_rotate, main.cpp:114-120) and after rescaling it to a square aspect
(cv::resize to 1000x1000, main.cpp:44). The SfM-path GMS config enables
rotation+scale invariance (withRotation=true, withScale=true,
FeatureMatchUtil.cpp:69); with it GMS must retain a healthy share of its
unperturbed match count instead of collapsing.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpusfm.config import GmsConfig, PipelineConfig, SiftConfig
from tpusfm.features.sift import sift_detect_and_compute
from tpusfm.io import imread_gray
from tpusfm.io.dataset import source_image
from tpusfm.io.image import resize, rotate
from tpusfm.sfm.two_view import match_features


@pytest.fixture(scope="module")
def pair():
    def load(name, hw=(270, 360)):
        g = imread_gray(source_image(name))
        return np.asarray(jax.image.resize(jnp.array(g), hw, "linear"))

    return load("Disparity_L.jpg"), load("Disparity_R.jpg")


def _match_count(f1, f2, s1, s2, cfg, algo="gms"):
    m = match_features(f1, f2, algo, s1, s2, cfg)
    return int(np.asarray(m.mask).sum())


def test_gms_with_rotation_survives_rot180(pair):
    g1, g2 = pair
    cfg = PipelineConfig(
        sift=SiftConfig(max_features=1024),
        gms=GmsConfig(with_rotation=True, with_scale=True),
    )
    f1 = sift_detect_and_compute(jnp.array(g1), cfg.sift)
    f2 = sift_detect_and_compute(jnp.array(g2), cfg.sift)
    s1 = (g1.shape[1], g1.shape[0])
    s2 = (g2.shape[1], g2.shape[0])
    n_orig = _match_count(f1, f2, s1, s2, cfg)
    assert n_orig > 30, n_orig

    g2r = np.asarray(rotate(jnp.array(g2), 180.0))
    f2r = sift_detect_and_compute(jnp.array(g2r), cfg.sift)
    n_rot = _match_count(f1, f2r, s1, s2, cfg)
    # the rotation-aware vote patterns must retain a large share of matches
    assert n_rot > 0.6 * n_orig, (n_orig, n_rot)

    # and the rotation-off config (the disparity-path default,
    # DisparityUtil.cpp:149) must do strictly worse under rotation —
    # otherwise the rotation patterns aren't doing anything
    cfg_off = dataclasses.replace(cfg, gms=GmsConfig())
    n_rot_off = _match_count(f1, f2r, s1, s2, cfg_off)
    assert n_rot_off < n_rot, (n_rot_off, n_rot)


def test_gms_with_scale_survives_rescale(pair):
    g1, g2 = pair
    cfg = PipelineConfig(
        sift=SiftConfig(max_features=1024),
        gms=GmsConfig(with_rotation=True, with_scale=True),
    )
    f1 = sift_detect_and_compute(jnp.array(g1), cfg.sift)
    s1 = (g1.shape[1], g1.shape[0])
    n_orig = None

    f2 = sift_detect_and_compute(jnp.array(g2), cfg.sift)
    n_orig = _match_count(f1, f2, s1, (g2.shape[1], g2.shape[0]), cfg)

    # reference rescales 1920x1080 -> 1000x1000 (main.cpp:44): aspect-change
    # to square at similar area; here 360x270 -> 300x300
    g2s = np.asarray(resize(jnp.array(g2), 300, 300))
    f2s = sift_detect_and_compute(jnp.array(g2s), cfg.sift)
    n_scale = _match_count(f1, f2s, s1, (300, 300), cfg)
    assert n_scale > 0.3 * n_orig, (n_orig, n_scale)
