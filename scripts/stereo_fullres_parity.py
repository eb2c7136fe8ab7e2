"""Full-resolution StereoBM parity on chip (VERDICT r3 #10).

Runs tpusfm's stereo_bm on the REAL chip at the robot pair's native
2594x1131 resolution with the reference's exact parameters
(/root/reference/SfM-GMS/SfM-GMS/DisparityUtil.cpp:28-38: numDisparities=224,
blockSize=9 (the cv::StereoBM default the reference keeps), minDisparity=-39,
XSOBEL prefilter cap 61, textureThreshold=507, uniqueness=0,
disp12MaxDiff=1), compares against cv2.StereoBM on CPU, and records
within-1-disparity agreement + runtimes to out/STEREO_FULLRES.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import cv2
    import jax.numpy as jnp
    from tpusfm.config import StereoBMConfig
    from tpusfm.io import imread_gray
    from tpusfm.io.dataset import source_image
    from tpusfm.stereo.block_matching import stereo_bm

    gl = imread_gray(source_image("leftRobot.png"))
    gr = imread_gray(source_image("rightRobot.png"))
    print(f"native {gl.shape}", flush=True)

    cfg = StereoBMConfig()  # the reference's exact parameter set
    t0 = time.perf_counter()
    disp, valid = stereo_bm(jnp.asarray(gl), jnp.asarray(gr), cfg)
    disp = np.asarray(disp)
    valid = np.asarray(valid)
    t_chip_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    d2, v2 = stereo_bm(jnp.asarray(gl) + 1e-6, jnp.asarray(gr), cfg)
    _ = np.asarray(d2), np.asarray(v2)
    t_chip = time.perf_counter() - t0

    l8 = (np.asarray(gl) * 255).astype(np.uint8)
    r8 = (np.asarray(gr) * 255).astype(np.uint8)
    bm = cv2.StereoBM_create(numDisparities=cfg.num_disparities,
                             blockSize=cfg.block_size)
    bm.setPreFilterType(cv2.STEREO_BM_PREFILTER_XSOBEL)
    bm.setPreFilterCap(cfg.prefilter_cap)
    bm.setMinDisparity(cfg.min_disparity)
    bm.setTextureThreshold(cfg.texture_threshold)
    bm.setUniquenessRatio(cfg.uniqueness_ratio)
    bm.setDisp12MaxDiff(cfg.disp12_max_diff)
    t0 = time.perf_counter()
    dcv = bm.compute(l8, r8).astype(np.float32) / 16.0
    t_cv = time.perf_counter() - t0
    cv_valid = dcv > (cfg.min_disparity - 1 + 0.01)

    both = valid & cv_valid
    agree = np.abs(disp - dcv) <= 1.0
    pct = float((agree & both).sum() / max(both.sum(), 1))
    out = {
        "resolution": list(gl.shape),
        "params": "DisparityUtil.cpp:28-38 exact",
        "jointly_valid_frac": float(both.mean()),
        "tpusfm_valid_frac": float(valid.mean()),
        "cv2_valid_frac": float(cv_valid.mean()),
        "agreement_within_1": pct,
        "chip_s": round(t_chip, 2),
        "chip_cold_s": round(t_chip_cold, 2),
        "cv2_cpu_s": round(t_cv, 2),
    }
    print(json.dumps(out, indent=2), flush=True)
    with open(os.path.join(ROOT, "out", "STEREO_FULLRES.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("-> out/STEREO_FULLRES.json", flush=True)


if __name__ == "__main__":
    main()
