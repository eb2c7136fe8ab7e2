"""tpusfm benchmark: two-view SfM frames/s on TPU vs the reference pipeline.

The reference publishes no numbers (BASELINE.md) — its headline workload is
the two-view pipeline SIFT detect -> match -> essential/pose -> triangulate
(/root/reference/SfM-GMS/SfM-GMS/main.cpp:71-84, timed per-phase with
clock() in FeatureMatchUtil.cpp). The baseline here is that exact pipeline
re-run via OpenCV (the reference's engine) on this machine's CPU; ours is
the TPU-native pipeline end-to-end on the real chip.

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

SIZE = (378, 504)  # H, W
N_FEATURES = 1024
WARMUP = 2
ITERS = 10


def _load_pair():
    import jax
    import jax.numpy as jnp
    from tpusfm.io import imread_gray
    from tpusfm.io.dataset import source_image

    out = []
    for n in ("PikaBun1.jpg", "PikaBun4.jpg"):
        g = imread_gray(source_image(n))
        out.append(np.asarray(jax.image.resize(jnp.array(g), SIZE, "linear")))
    return out


def bench_tpusfm(g1, g2):
    import jax
    import jax.numpy as jnp
    from tpusfm.config import PipelineConfig, SiftConfig, MatchConfig
    from tpusfm.features.sift import sift_detect_and_compute
    from tpusfm.sfm import two_view_sfm
    from tpusfm.types import CameraIntrinsics

    h, w = g1.shape
    cfg = PipelineConfig(sift=SiftConfig(max_features=N_FEATURES),
                         match=MatchConfig(max_matches=500))
    intr = CameraIntrinsics.ideal(0.838 * w, 0.838 * w, w / 2, h / 2)
    j1 = jnp.array(g1)
    j2 = jnp.array(g2)

    def run(a, b):
        f1 = sift_detect_and_compute(a, cfg.sift)
        f2 = sift_detect_and_compute(b, cfg.sift)
        r = two_view_sfm(f1, f2, intr, "bf", (w, h), (w, h), cfg)
        return r

    # distinct device buffers per iteration so the runtime cannot dedup
    pairs = [(j1 + 0.0, j2 + 0.0) for _ in range(ITERS)]
    for _ in range(WARMUP):
        r = run(j1, j2)
    jax.block_until_ready(r.points3d)
    # throughput: pipeline all pairs (a production frame stream), block once
    t0 = time.perf_counter()
    rs = [run(a, b) for a, b in pairs]
    jax.block_until_ready([r.points3d for r in rs])
    dt = (time.perf_counter() - t0) / ITERS
    # a "frame" = one image processed through the full pipeline (2 per pair)
    return 2.0 / dt, int(rs[-1].n_points)


def bench_reference(g1, g2):
    """The reference pipeline via OpenCV on CPU (same machine, same inputs)."""
    try:
        import cv2
    except Exception:
        return None
    a = (g1 * 255).astype(np.uint8)
    b = (g2 * 255).astype(np.uint8)
    h, w = a.shape
    K = np.array([[0.838 * w, 0, w / 2], [0, 0.838 * w, h / 2], [0, 0, 1]])

    def run():
        sift = cv2.SIFT_create(N_FEATURES)
        k1, d1 = sift.detectAndCompute(a, None)
        k2, d2 = sift.detectAndCompute(b, None)
        bf = cv2.BFMatcher(cv2.NORM_L2, crossCheck=True)
        ms = sorted(bf.match(d1, d2), key=lambda m: m.distance)[:500]
        p1 = np.array([k1[m.queryIdx].pt for m in ms])
        p2 = np.array([k2[m.trainIdx].pt for m in ms])
        E, mask = cv2.findEssentialMat(p1, p2, K, cv2.RANSAC, 0.999, 1.0)
        _, R, t, mask2 = cv2.recoverPose(E, p1, p2, K, mask=mask)
        x1 = cv2.undistortPoints(p1.reshape(-1, 1, 2), K, None).reshape(-1, 2)
        x2 = cv2.undistortPoints(p2.reshape(-1, 1, 2), K, None).reshape(-1, 2)
        P1 = np.hstack([np.eye(3), np.zeros((3, 1))])
        P2 = np.hstack([R, t])
        X = cv2.triangulatePoints(P1, P2, x1.T, x2.T)
        return X

    run()  # warmup
    t0 = time.perf_counter()
    n = max(3, ITERS // 2)
    for _ in range(n):
        run()
    dt = (time.perf_counter() - t0) / n
    return 2.0 / dt


def main():
    g1, g2 = _load_pair()
    fps, n_points = bench_tpusfm(g1, g2)
    ref_fps = bench_reference(g1, g2)
    vs = fps / ref_fps if ref_fps else None
    print(json.dumps({
        "metric": "two_view_sfm_frames_per_s_504px",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(vs, 3) if vs else None,
    }))
    print(f"# tpusfm: {fps:.2f} f/s ({n_points} points); reference(OpenCV CPU): "
          f"{ref_fps:.2f} f/s" if ref_fps else "# no reference available",
          file=sys.stderr)


if __name__ == "__main__":
    main()
