"""tpusfm benchmark: two-view SfM frames/s on TPU vs the reference pipeline.

The reference publishes no numbers (BASELINE.md) — its headline workload is
the two-view pipeline SIFT detect -> match -> essential/pose -> triangulate
(/root/reference/SfM-GMS/SfM-GMS/main.cpp:71-84, timed per-phase with
clock() in FeatureMatchUtil.cpp). The baseline here is that exact pipeline
re-run via OpenCV (the reference's engine) on this machine's CPU; ours is
the TPU-native pipeline end-to-end on the real chip.

Production configuration measured: pairs stream through in batches —
SIFT on (4, H, W) image chunks (larger chunks hit the octave-0 pooled-plane
HBM cliff), then one vmapped match+RANSAC+pose+triangulation program over
the whole pair batch. Batching is what converts the pipeline's many small
latency-bound ops into wide VPU/MXU work.

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
N_PAIRS = 8        # pair batch per measured step
SIFT_CHUNK = 4     # images per SIFT program
ITERS = 4          # measured steps (N_PAIRS pairs each)
REF_REPS = 9       # timed OpenCV reference runs (median reported)


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
    import jax.tree_util as jtu
    from tpusfm.config import PipelineConfig, RansacConfig, SiftConfig, MatchConfig
    from tpusfm.features.sift import sift_detect_and_compute
    from tpusfm.sfm.two_view import two_view_batch
    from tpusfm.types import CameraIntrinsics

    h, w = g1.shape
    # 64 five-point samples: at this pipeline's measured ~70% inlier ratio a
    # clean sample lands with prob 1-(1-0.7^5)^64 ~ 1-6e-6; the reference
    # runs RANSAC at prob=0.7 (SfMUtil.cpp:39), needing only ~7 samples at
    # that ratio, so 64 is still ~10x its effective budget.
    cfg = PipelineConfig(sift=SiftConfig(max_features=N_FEATURES),
                         match=MatchConfig(max_matches=500),
                         ransac=RansacConfig(n_hypotheses=64))
    intr = CameraIntrinsics.ideal(0.8255 * w, 0.8255 * w, w / 2, h / 2)

    stack = np.stack([g1, g2] * N_PAIRS)  # (2B, H, W): both images of B pairs

    def run(x):
        feats = [
            sift_detect_and_compute(x[i : i + SIFT_CHUNK], cfg.sift)
            for i in range(0, 2 * N_PAIRS, SIFT_CHUNK)
        ]
        fb = jtu.tree_map(lambda *xs: jnp.concatenate(xs), *feats)
        f1 = jtu.tree_map(lambda a: a[0::2], fb)
        f2 = jtu.tree_map(lambda a: a[1::2], fb)
        return two_view_batch(f1, f2, intr, cfg)

    # distinct device buffers per iteration so the runtime cannot dedup
    xs = [jnp.asarray(stack) + float(i) * 1e-6 for i in range(ITERS)]
    r = run(xs[0])
    jax.block_until_ready(r.points3d)
    r = run(xs[-1])
    jax.block_until_ready(r.points3d)
    # throughput: a production frame stream, block once at the end
    t0 = time.perf_counter()
    rs = [run(x) for x in xs]
    jax.block_until_ready([r.points3d for r in rs])
    dt = (time.perf_counter() - t0) / (ITERS * N_PAIRS)
    n_pts = int(np.asarray(rs[-1].n_points).mean())
    n_inl = int(np.asarray(rs[-1].n_inliers).mean())
    # a "frame" = one image through the full pipeline (2 per pair)
    return 2.0 / dt, n_pts, n_inl


def bench_reference(g1, g2):
    """The reference pipeline via OpenCV on CPU (same machine, same inputs).

    Pinned measurement: 2 warmup runs, then REF_REPS timed runs; the
    reported frames/s uses the MEDIAN per-run time (the mean drifted by
    ~35% between rounds on this shared machine). Also returns the quality
    counts (RANSAC/pose inliers, cheirality-positive triangulated points)
    so throughput is compared at documented, comparable output quality.
    """
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
        "metric": "two_view_sfm_frames_per_s_504px",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(vs, 3) if vs else None,
        "quality": {"tpusfm": {"n_inliers": n_inl, "n_points": n_points},
                    "opencv": ({"n_inliers": ref["n_inliers"],
                                "n_points": ref["n_points"]} if ref else None)},
    }))
    if ref:
        print(f"# tpusfm: {fps:.2f} f/s ({n_inl} inliers, {n_points} pts/pair); "
              f"reference(OpenCV CPU): {ref['fps']:.2f} f/s median "
              f"(mean {ref['fps_mean']:.2f}; {ref['n_inliers']} inliers, "
              f"{ref['n_points']} pts/pair)", file=sys.stderr)
    else:
        print("# no reference available", file=sys.stderr)


if __name__ == "__main__":
    main()
