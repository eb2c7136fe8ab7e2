"""Dense-ORB parity isolation experiment (VERDICT r3 weak #2 / next #5).

The r3 grid lost one cell: dense ORB RMS 81.12 (tpusfm) vs 63.35 (OpenCV).
Hypotheses: (a) our generated BRIEF pattern differs from OpenCV's
bit_pattern_31, (b) our smaller invalid border keeps noisier near-border
pixels, (c) the matching itself. This experiment isolates them by feeding
OPENCV'S OWN dense descriptors (cv2.ORB.compute on a per-pixel keypoint
grid, exactly the reference's dense mode,
/root/reference/SfM-GMS/SfM-GMS/DisparityUtil.cpp:125-139) through OUR exact
Hamming NN matcher, and separately re-scoring our own descriptors under
OpenCV's border mask:

  row 1: cv2 pattern + cv2 border + FLANN LSH   (the reference cell, ~63)
  row 2: cv2 pattern + cv2 border + exact NN    (this script, on chip)
  row 3: ours pattern + cv2 border + exact NN   (this script, on chip)
  row 4: ours pattern + ours border + exact NN  (the r3 grid cell, 81.12)

If row 2 ~ 63: matching is fine -> gap is pattern (row 3 vs row 2) and/or
border (row 4 vs row 3), each read off directly.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def cv2_dense_orb(img_u8):
    """OpenCV descriptors on a per-pixel grid: (valid_mask (H*W,), desc)."""
    import cv2

    h, w = img_u8.shape
    kpts = [cv2.KeyPoint(float(x), float(y), 1.0)
            for y in range(h) for x in range(w)]
    orb = cv2.ORB_create()
    kept, desc = orb.compute(img_u8, kpts)
    valid = np.zeros(h * w, bool)
    out = np.zeros((h * w, 32), np.uint8)
    for k, d in zip(kept, desc):
        x, y = int(round(k.pt[0])), int(round(k.pt[1]))
        valid[y * w + x] = True
        out[y * w + x] = d
    return valid, out


def pack_u32(desc_u8):
    """(N, 32) uint8 -> (N, 8) uint32 little-endian packing."""
    return desc_u8.reshape(-1, 8, 4).astype(np.uint32) @ (
        np.uint32(1) << (8 * np.arange(4, dtype=np.uint32)))


def run_match_rms(desc1, valid1, desc2, valid2, gt, h, w, tag):
    import jax.numpy as jnp
    from tpusfm.config import PipelineConfig
    from tpusfm.stereo.disparity import (
        _dense_grid_kpts, dense_raw_match, disparity_rms, match_disparity_image,
    )
    from tpusfm.types import Features

    f1 = Features(kpts=_dense_grid_kpts(h, w, jnp.asarray(valid1)),
                  desc=jnp.asarray(desc1))
    f2 = Features(kpts=_dense_grid_kpts(h, w, jnp.asarray(valid2)),
                  desc=jnp.asarray(desc2))
    cfg = PipelineConfig()
    m = dense_raw_match(f1, f2, "hamming", cfg.match)
    disp, valid = match_disparity_image(f1.kpts, f2.kpts, m, h, w)
    rms, n = disparity_rms(disp, valid, gt, 4.0)
    print(f"{tag}: RMS={float(rms):.2f} count={int(n)}", flush=True)
    return float(rms), int(n)


def main():
    import cv2
    import jax.numpy as jnp
    from tpusfm.io import imread_gray
    from tpusfm.io.dataset import source_image
    from tpusfm.stereo.disparity import dense_orb_features

    left = imread_gray(source_image("left1.png"))
    right = imread_gray(source_image("right1.png"))
    gt = jnp.asarray(imread_gray(source_image("left_gt1.png")))
    h, w = left.shape
    l8 = (np.asarray(left) * 255).astype(np.uint8)
    r8 = (np.asarray(right) * 255).astype(np.uint8)

    print("computing cv2 dense ORB descriptors...", flush=True)
    v1, d1 = cv2_dense_orb(l8)
    v2, d2 = cv2_dense_orb(r8)
    print(f"cv2 valid: {v1.sum()} / {h*w}", flush=True)

    results = {}
    results["cv2_pattern_cv2_border_exactNN"] = run_match_rms(
        pack_u32(d1), v1, pack_u32(d2), v2, gt, h, w,
        "cv2 pattern + cv2 border + exact NN")

    print("computing tpusfm dense ORB descriptors...", flush=True)
    f1 = dense_orb_features(jnp.asarray(left))
    f2 = dense_orb_features(jnp.asarray(right))
    ours_v1 = np.asarray(f1.kpts.mask)
    ours_v2 = np.asarray(f2.kpts.mask)
    print(f"tpusfm valid: {ours_v1.sum()} / {h*w}", flush=True)

    results["ours_pattern_cv2_border_exactNN"] = run_match_rms(
        np.asarray(f1.desc), ours_v1 & v1, np.asarray(f2.desc), ours_v2 & v2,
        gt, h, w, "ours pattern + cv2 border + exact NN")
    results["ours_pattern_ours_border_exactNN"] = run_match_rms(
        np.asarray(f1.desc), ours_v1, np.asarray(f2.desc), ours_v2,
        gt, h, w, "ours pattern + ours border + exact NN")

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "out", "orb_dense_experiment.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("->", out, flush=True)


if __name__ == "__main__":
    main()
