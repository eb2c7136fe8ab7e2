"""Reference (OpenCV) pose chain over PikaBun1-6 for the ATE comparison.

The reference's only trajectory mechanism is chaining structureFromMotion
two-view poses (/root/reference/SfM-GMS/SfM-GMS/SfMUtil.cpp:39-45): per
pair SIFT -> BF cross-check match -> findEssentialMat(RANSAC) ->
recoverPose. Monocular scale per edge is resolved the standard way (the
reference never does this — it never chains): median triangulated-depth
ratio of keypoints shared between consecutive pairs, anchored at edge 0.

Writes out/ref_trajectory.npz with camera centers (V, 3) + per-edge stats.
Run once on CPU (cv2); the tpusfm side compares via tpusfm.utils.traj.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE_MAX = int(os.environ.get("REF_TRAJ_SIZE", "0"))     # 0 = native 2016x1512
N_FEATURES = int(os.environ.get("REF_TRAJ_FEATURES", "10000"))  # reference cap
# (cv::SIFT::create(10000), /root/reference/SfM-GMS/SfM-GMS/FeatureMatchUtil.cpp:10)


def load_gray(path, max_size=SIZE_MAX):
    import cv2

    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    h, w = img.shape
    if max_size and max(h, w) > max_size:
        s = max_size / max(h, w)
        img = cv2.resize(img, (int(w * s), int(h * s)))
    return img


def pair_edge(a, b, K):
    """cv2 two-view: returns (R, t_unit, depth maps keyed by kpt index)."""
    import cv2

    sift = cv2.SIFT_create(N_FEATURES)
    k1, d1 = sift.detectAndCompute(a, None)
    k2, d2 = sift.detectAndCompute(b, None)
    bf = cv2.BFMatcher(cv2.NORM_L2, crossCheck=True)
    ms = sorted(bf.match(d1, d2), key=lambda m: m.distance)[:1000]
    p1 = np.array([k1[m.queryIdx].pt for m in ms])
    p2 = np.array([k2[m.trainIdx].pt for m in ms])
    E, mask = cv2.findEssentialMat(p1, p2, K, cv2.RANSAC, 0.999, 1.0)
    _, R, t, mask2 = cv2.recoverPose(E, p1, p2, K, mask=mask)
    inl = mask2.ravel().astype(bool)
    x1 = cv2.undistortPoints(p1.reshape(-1, 1, 2), K, None).reshape(-1, 2)
    x2 = cv2.undistortPoints(p2.reshape(-1, 1, 2), K, None).reshape(-1, 2)
    P1 = np.hstack([np.eye(3), np.zeros((3, 1))])
    P2 = np.hstack([R, t])
    X = cv2.triangulatePoints(P1, P2, x1.T, x2.T)
    Xc = (X[:3] / X[3]).T
    z1 = Xc[:, 2]
    z2 = (Xc @ R.T + t.reshape(1, 3))[:, 2]
    good = inl & (z1 > 1e-6) & (z2 > 1e-6)
    qi = np.array([m.queryIdx for m in ms])
    ti = np.array([m.trainIdx for m in ms])
    depth_i = {int(q): float(z) for q, z in zip(qi[good], z1[good])}
    depth_j = {int(q): float(z) for q, z in zip(ti[good], z2[good])}
    return R, t.ravel() / np.linalg.norm(t), depth_i, depth_j, int(good.sum())


def main():
    """Usage: ref_trajectory.py [out_name.npz img1 img2 ...] — with no args,
    the PikaBun1-6 sequence into out/ref_trajectory.npz."""
    import cv2  # noqa: F401

    from tpusfm.io.dataset import source_image, SFM_SEQUENCE

    if len(sys.argv) > 2:
        out_name = sys.argv[1]
        paths = sys.argv[2:]
    else:
        out_name = "ref_trajectory.npz"
        paths = [source_image(n) for n in SFM_SEQUENCE]
    imgs = [load_gray(p) for p in paths]
    h, w = imgs[0].shape

    calib = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "out", "calib.npz")
    if os.path.exists(calib):
        z = np.load(calib)
        K0, (cw, ch) = z["K"], z["image_size"]
        K = K0 * np.array([[w / cw] * 3, [h / ch] * 3, [1, 1, 1]])
        K[2] = [0, 0, 1]
    else:
        K = np.array([[0.8255 * w, 0, w / 2], [0, 0.8255 * w, h / 2], [0, 0, 1]])

    V = len(imgs)
    edges = []
    for k in range(V - 1):
        R, tu, di, dj, ninl = pair_edge(imgs[k], imgs[k + 1], K)
        edges.append(dict(R=R, tu=tu, di=di, dj=dj, n=ninl))
        print(f"edge {k}->{k+1}: {ninl} inliers")

    scales = [1.0]
    for k in range(1, V - 1):
        shared = set(edges[k - 1]["dj"]) & set(edges[k]["di"])
        if len(shared) >= 5:
            r = np.median([edges[k - 1]["dj"][s] / edges[k]["di"][s] for s in shared])
        else:
            r = 1.0
            print(f"edge {k}: scale fallback (only {len(shared)} shared)")
        scales.append(scales[-1] * float(r))

    # chain world_T_cam poses: cam0 at origin; edge gives x_{k+1} = R x_k + s*tu
    Rw = [np.eye(3)]
    tw = [np.zeros(3)]
    for k in range(V - 1):
        Rrel = edges[k]["R"].T                     # k_T_{k+1} rotation
        trel = -edges[k]["R"].T @ (edges[k]["tu"] * scales[k])
        Rw.append(Rw[-1] @ Rrel)
        tw.append(Rw[-2] @ trel + tw[-1])
    centers = np.stack(tw)

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "out", out_name)
    np.savez(out, centers=centers, R=np.stack(Rw), scales=np.array(scales),
             n_inliers=np.array([e["n"] for e in edges]))
    print("centers:\n", np.round(centers, 3))
    print("->", out)


if __name__ == "__main__":
    main()
