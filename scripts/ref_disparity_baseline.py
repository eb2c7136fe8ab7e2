"""OpenCV baseline for the reference disparity benchmark grid.

Re-runs matchBasedDispCalculate (/root/reference/SfM-GMS/SfM-GMS/DisparityUtil.cpp:93-216)
via OpenCV on this machine for the cells whose algorithms exist in this cv2
build (sift, orb; this build lacks xfeatures2d, so the GMS/LOGOS cells cannot
be reproduced with OpenCV here). Matching mirrors the reference: FLANN
KD-tree(4) for SIFT, FLANN LSH(5,20,2) for ORB; disparity image from
per-match |x1-x2| at the query pixel; RMS vs gt/disp_ratio over valid pixels
(formula at DisparityUtil.cpp:188-201).

Writes out/ref_disparity_baseline.json.
"""
import json
import os
import sys
import time

import cv2
import numpy as np

SRC = "/root/reference/SfM-GMS/SourceImages"


def load(name):
    img = cv2.imread(os.path.join(SRC, name), cv2.IMREAD_GRAYSCALE)
    assert img is not None, name
    return img


def dense_keypoints(img):
    h, w = img.shape
    return [cv2.KeyPoint(float(x), float(y), 1.0)
            for y in range(h) for x in range(w)]


def run_cell(left, right, gt, alg, density, disp_ratio):
    t0 = time.time()
    if alg == "orb":
        det = cv2.ORB_create()
        index_params = dict(algorithm=6, table_number=5, key_size=20,
                            multi_probe_level=2)  # FLANN_INDEX_LSH
    else:
        det = cv2.SIFT_create()
        index_params = dict(algorithm=1, trees=4)  # FLANN_INDEX_KDTREE
    matcher = cv2.FlannBasedMatcher(index_params, dict(checks=50))

    if density == "dense":
        kp = dense_keypoints(left)
        k1, d1 = det.compute(left, kp)
        k2, d2 = det.compute(right, dense_keypoints(right))
    else:
        k1, d1 = det.detectAndCompute(left, None)
        k2, d2 = det.detectAndCompute(right, None)
    if d1 is None or d2 is None or len(k1) == 0 or len(k2) == 0:
        return None
    if alg != "orb":
        d1 = np.float32(d1)
        d2 = np.float32(d2)
    matches = matcher.match(d1, d2)

    h, w = left.shape
    disp = np.zeros((h, w), np.float32)
    hit = np.zeros((h, w), bool)
    for m in matches:
        x1, y1 = k1[m.queryIdx].pt
        x2, _ = k2[m.trainIdx].pt
        xi, yi = int(round(x1)), int(round(y1))
        if 0 <= xi < w and 0 <= yi < h:
            d = abs(x1 - x2)
            if not hit[yi, xi] or d > disp[yi, xi]:
                disp[yi, xi] = d
            hit[yi, xi] = True

    gtf = gt.astype(np.float32) / disp_ratio
    both = hit & (gt > 0)
    n = int(both.sum())
    rms = float(np.sqrt(((disp - gtf) ** 2)[both].sum() / max(n, 1)))
    return dict(alg=alg, density=density, rms=round(rms, 3), count=n,
                n_matches=len(matches), seconds=round(time.time() - t0, 2))


def main():
    left, right, gt = load("left1.png"), load("right1.png"), load("left_gt1.png")
    out = []
    cells = [(a, d) for d in ("sparse", "dense") for a in ("sift", "orb")]
    for alg, density in cells:
        r = run_cell(left, right, gt, alg, density, 4.0)
        print(r, flush=True)
        if r:
            out.append(r)
    os.makedirs("out", exist_ok=True)
    with open("out/ref_disparity_baseline.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
