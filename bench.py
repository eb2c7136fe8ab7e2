"""tpusfm benchmark: two-view SfM frames/s on TPU vs the reference pipeline.

Measured at the REFERENCE'S OWN operating point (VERDICT r3 #1): native
2016x1512 PikaBun frames with the 10000-feature SIFT cap
(/root/reference/SfM-GMS/SfM-GMS/FeatureMatchUtil.cpp:10, images
main.cpp:71-72). Pipeline per pair: SIFT detect+describe x2 -> cross-checked
BF match (<=500 kept) -> essential RANSAC -> recoverPose -> triangulate
(SfMUtil.cpp:4-83). Baseline = the exact pipeline via OpenCV (the
reference's engine) on this machine's CPU, same images, same feature cap.

Timing discipline: the tunneled TPU runtime's block_until_ready can return
before remote execution completes, so the measured region is closed by
device_get (np.asarray) of the LAST step's outputs — programs execute in
dispatch order on one stream, so nothing can be pending when the clock
stops. (Fetching every step's outputs, as r4 did, adds the ~23 ms
per-device_get tunnel roundtrip to every step.)

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# persistent compile cache: first bench invocation pays the XLA compiles,
# later ones start in seconds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

N_FEATURES = 10000
MAX_MATCHES = 500
N_PAIRS = 2        # pair batch per measured step
ITERS = 5          # measured steps
REF_REPS = 5       # timed OpenCV reference runs (median reported)


def _load_pair():
    from tpusfm.io import imread_gray
    from tpusfm.io.dataset import source_image

    return [np.asarray(imread_gray(source_image(n)))
            for n in ("PikaBun1.jpg", "PikaBun4.jpg")]


def bench_tpusfm(g1, g2):
    import jax.numpy as jnp
    import jax.tree_util as jtu
    from tpusfm.config import PipelineConfig, RansacConfig, SiftConfig, MatchConfig
    from tpusfm.features.sift import sift_detect_and_compute
    from tpusfm.sfm.two_view import two_view_batch
    from tpusfm.types import CameraIntrinsics

    h, w = g1.shape
    # 128 five-point hypotheses: comfortably above the reference's effective
    # RANSAC budget at prob=0.7 (SfMUtil.cpp:39) for the ~70% inlier ratios
    # this pipeline measures.
    cfg = PipelineConfig(sift=SiftConfig(max_features=N_FEATURES),
                         match=MatchConfig(max_matches=MAX_MATCHES),
                         ransac=RansacConfig(n_hypotheses=128))
    intr = CameraIntrinsics.ideal(0.8255 * w, 0.8255 * w, w / 2, h / 2)

    imgs = np.stack([g1, g2])  # one pair's images; re-used with unique noise

    def step(u):
        """One production step: N_PAIRS pairs through the full pipeline."""
        feats = []
        for p in range(N_PAIRS):
            x = jnp.asarray(imgs) + (u * N_PAIRS + p) * 1e-6
            feats.append(sift_detect_and_compute(x, cfg.sift))
        fb = jtu.tree_map(lambda *xs: jnp.concatenate(xs), *feats)
        f1 = jtu.tree_map(lambda a: a[0::2], fb)
        f2 = jtu.tree_map(lambda a: a[1::2], fb)
        return two_view_batch(f1, f2, intr, cfg)

    def drain(r):
        """Force completion: device_get the step outputs."""
        return (np.asarray(r.n_points), np.asarray(r.n_inliers),
                np.asarray(r.points3d[:, :4]))

    drain(step(10_000))  # warm / compile
    drain(step(10_001))  # second warm (first post-compile run can be slow)
    t0 = time.perf_counter()
    outs = [step(u) for u in range(ITERS)]
    last = drain(outs[-1])  # in-order execution: last done => all done
    dt = (time.perf_counter() - t0) / (ITERS * N_PAIRS)
    n_pts = int(last[0].mean())
    n_inl = int(last[1].mean())
    return 2.0 / dt, n_pts, n_inl


def bench_reference(g1, g2):
    """The reference pipeline via OpenCV on CPU (same machine, same inputs).

    2 warmups then REF_REPS timed runs, MEDIAN per-run time reported, plus
    quality counts (RANSAC/pose inliers, cheirality-positive points)."""
    try:
        import cv2
    except Exception:
        return None
    a = (g1 * 255).astype(np.uint8)
    b = (g2 * 255).astype(np.uint8)
    h, w = a.shape
    K = np.array([[0.8255 * w, 0, w / 2], [0, 0.8255 * w, h / 2], [0, 0, 1]])

    def run():
        sift = cv2.SIFT_create(N_FEATURES)
        k1, d1 = sift.detectAndCompute(a, None)
        k2, d2 = sift.detectAndCompute(b, None)
        bf = cv2.BFMatcher(cv2.NORM_L2, crossCheck=True)
        ms = sorted(bf.match(d1, d2), key=lambda m: m.distance)[:MAX_MATCHES]
        p1 = np.array([k1[m.queryIdx].pt for m in ms])
        p2 = np.array([k2[m.trainIdx].pt for m in ms])
        E, mask = cv2.findEssentialMat(p1, p2, K, cv2.RANSAC, 0.999, 1.0)
        _, R, t, mask2 = cv2.recoverPose(E, p1, p2, K, mask=mask)
        x1 = cv2.undistortPoints(p1.reshape(-1, 1, 2), K, None).reshape(-1, 2)
        x2 = cv2.undistortPoints(p2.reshape(-1, 1, 2), K, None).reshape(-1, 2)
        P1 = np.hstack([np.eye(3), np.zeros((3, 1))])
        P2 = np.hstack([R, t])
        X = cv2.triangulatePoints(P1, P2, x1.T, x2.T)
        Xc = (X[:3] / X[3]).T
        z2 = (Xc @ R.T + t.reshape(1, 3))[:, 2]
        n_cheir = int(((Xc[:, 2] > 0) & (z2 > 0)).sum())
        return len(ms), int(mask2.sum()), n_cheir

    run(); run()  # warmup
    times = []
    stats = None
    for _ in range(REF_REPS):
        t0 = time.perf_counter()
        stats = run()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return {
        "fps": 2.0 / dt,
        "fps_mean": 2.0 / float(np.mean(times)),
        "n_matches": stats[0],
        "n_inliers": stats[1],
        "n_points": stats[2],
    }


def main():
    g1, g2 = _load_pair()
    fps, n_points, n_inl = bench_tpusfm(g1, g2)
    ref = bench_reference(g1, g2)
    vs = fps / ref["fps"] if ref else None
    print(json.dumps({
        "metric": "two_view_sfm_frames_per_s_fullres_10k",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(vs, 3) if vs else None,
        "quality": {"tpusfm": {"n_inliers": n_inl, "n_points": n_points},
                    "opencv": ({"n_inliers": ref["n_inliers"],
                                "n_points": ref["n_points"]} if ref else None)},
    }))
    if ref:
        print(f"# tpusfm: {fps:.2f} f/s ({n_inl} inliers, {n_points} pts/pair) "
              f"at 2016x1512/10k feats; reference(OpenCV CPU): "
              f"{ref['fps']:.2f} f/s median (mean {ref['fps_mean']:.2f}; "
              f"{ref['n_inliers']} inliers, {ref['n_points']} pts/pair)",
              file=sys.stderr)
    else:
        print("# no reference available", file=sys.stderr)


if __name__ == "__main__":
    main()
