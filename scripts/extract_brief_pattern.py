"""Recover OpenCV ORB's BRIEF sampling pattern by probing cv2 (CPU only).

The dense-ORB parity cell loses ~13 RMS to the sampling pattern
(out/orb_dense_experiment.json: cv2 pattern + exact NN = 62.63 vs ours =
75.98 under the same border/matcher). OpenCV's `bit_pattern_31_` is a
published constant table compiled into the binary; with no network access
it is recovered here by black-box probing: descriptor bit k is
I5x5(p1_k) < I5x5(p2_k) on the 31x31 patch (5x5 integral-box smoothing,
orientation from the intensity centroid). A strong horizontal background
gradient pins the centroid angle to ~0 and gives every sample a distinct
baseline; a bright probe dot at patch position q then flips exactly the
bits whose endpoint lands in the dot's smoothing window:
  bit 0 -> 1  =>  p2 in win(q);   bit 1 -> 0  =>  p1 in win(q).
Accumulating fire-counts over all 31x31 probe positions and taking the
centroid of each bit's fired region recovers both endpoints exactly.

Writes tpusfm/features/_brief_pattern.npy ((256, 4) int8: x1 y1 x2 y2,
patch-centered coords) and verifies bit-exactness against cv2 on random
angle-0 patches.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R = 15              # ORB patch half-size (31x31)
IMG = 96            # probe canvas
CX = CY = IMG // 2


def compute_desc(img, angle0=True):
    import cv2

    kp = cv2.KeyPoint(float(CX), float(CY), 31.0)
    orb = cv2.ORB_create()
    kept, desc = orb.compute(img, [kp])
    if not kept:
        return None, None
    return np.unpackbits(desc[0], bitorder="little"), kept[0].angle


def main():
    import cv2

    # backgrounds: horizontal ramps (pin the IC angle, give every sample a
    # distinct baseline). A low ramp hosts the bright-dot pass, a high ramp
    # the dark-dot pass, so the probe amplitude after ORB's 7x7/sigma-2
    # Gaussian always exceeds the largest baseline margin (slope * patch
    # width) and every bit fires for both endpoints.
    xs = np.arange(IMG, dtype=np.float32)
    lo = np.tile(np.clip(60 + (xs - CX) * 1.5, 0, 255).astype(np.uint8), (IMG, 1))
    hi = np.tile(np.clip(195 + (xs - CX) * 1.5, 0, 255).astype(np.uint8), (IMG, 1))
    b0, ang0 = compute_desc(lo)
    b0h, ang0h = compute_desc(hi)
    assert b0 is not None and (b0 == b0h).all()
    print(f"baseline angles {ang0:.2f} / {ang0h:.2f} deg", flush=True)

    # probe range extends past the patch so endpoint fire-regions (the 7x7
    # Gaussian support around each endpoint) are never truncated; the
    # endpoint is read off as the bounding-box center of the fired region
    # (exact for a symmetric kernel once the plus-neighbors fire).
    PR = R + 4
    # evidence: per (bit, endpoint) the probe positions that fired, each
    # UNROTATED by the probe's own IC angle (the dot shifts the patch
    # moments, so cv2 evaluates a slightly rotated pattern; compensating
    # with the exact returned angle makes all probes consistent).
    pts1 = [[] for _ in range(256)]
    pts2 = [[] for _ in range(256)]
    for bg, val, f_hi, f_lo in ((lo, 255, pts2, pts1), (hi, 0, pts1, pts2)):
        for qy in range(-PR, PR + 1):
            for qx in range(-PR, PR + 1):
                img = bg.copy()
                img[CY + qy - 1:CY + qy + 2, CX + qx - 1:CX + qx + 2] = val
                d, ang = compute_desc(img)
                if d is None or abs((ang + 180) % 360 - 180) > 10.0:
                    continue
                a = np.deg2rad(ang)
                ca, sa = np.cos(a), np.sin(a)
                ux = qx * ca + qy * sa        # R(-a) @ q
                uy = -qx * sa + qy * ca
                for k in np.nonzero((d == 1) & (b0 == 0))[0]:
                    f_hi[k].append((ux, uy))
                for k in np.nonzero((d == 0) & (b0 == 1))[0]:
                    f_lo[k].append((ux, uy))

    def region_center(pts):
        if not pts:
            return None
        a = np.asarray(pts)
        return (round((a[:, 0].min() + a[:, 0].max()) / 2.0),
                round((a[:, 1].min() + a[:, 1].max()) / 2.0))

    pattern = np.zeros((256, 4), np.int8)
    missing = []
    for k in range(256):
        c1 = region_center(pts1[k])
        c2 = region_center(pts2[k])
        if c1 is None or c2 is None:
            missing.append(k)
            continue
        pattern[k] = [c1[0], c1[1], c2[0], c2[1]]
    print(f"recovered {256 - len(missing)}/256 bits; missing: {missing[:8]}",
          flush=True)

    # verify: recompute descriptors from the pattern on random angle-0
    # patches (radially symmetric noise would not pin the angle, so verify
    # on the gradient background + random dots and compare bit-exactly)
    rng = np.random.default_rng(0)
    n_ok = 0
    n_bits = 0
    for trial in range(20):
        img = lo.copy().astype(np.int32)
        for _ in range(25):
            x = rng.integers(CX - R, CX + R + 1)
            y = rng.integers(CY - R, CY + R + 1)
            img[y - 1:y + 2, x - 1:x + 2] += int(rng.integers(-80, 80))
        img = np.clip(img, 0, 255).astype(np.uint8)
        d, ang = compute_desc(img)
        if d is None or abs((ang + 180) % 360 - 180) > 2.0:
            continue
        # ORB smooths with GaussianBlur(7,7,sigma=2, REFLECT_101) and samples
        # single pixels of the blurred image, pattern rotated by kp.angle
        blur = cv2.GaussianBlur(img, (7, 7), 2, borderType=cv2.BORDER_REFLECT_101)
        a = np.deg2rad(ang)
        ca, sa = np.cos(a), np.sin(a)

        def sample(px, py):
            rx = int(round(px * ca - py * sa))
            ry = int(round(px * sa + py * ca))
            return int(blur[CY + ry, CX + rx])

        mine = np.array([1 if sample(p[0], p[1]) < sample(p[2], p[3]) else 0
                         for p in pattern], np.uint8)
        n_ok += int((mine == d).sum())
        n_bits += 256
    print(f"verification: {n_ok}/{n_bits} bits match "
          f"({100.0 * n_ok / max(n_bits, 1):.2f}%)", flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tpusfm", "features", "_brief_pattern.npy")
    np.save(out, pattern)
    print("->", out, flush=True)


if __name__ == "__main__":
    main()
