"""Per-kernel roofline on the real chip (VERDICT r3 #1 / missing #3).

For each hot kernel: measured throughput (device_get-synced streaming, the
only reliable sync on the tunneled backend), ANALYTIC FLOP count, and a
traffic estimate, against public v5e peaks (197 TFLOP/s bf16, 98.5 f32,
819 GB/s HBM). Writes out/ROOFLINE.json and prints the RESULTS.md table.

Covered: NN descriptor matching (bf16 Pallas kernel and the f32 pipeline
path) at the full-scale bench shapes (10k x 10k x 128), SIFT
detect+describe at 2016x1512/10k, the match+geometry program of the bench,
and one LM step of track-major BA at 32k tracks.
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
PEAK_BF16 = 197e12
PEAK_F32 = 98.5e12
HBM_BW = 819e9


def stream(fn, make_input, out_slice, k=4):
    """Sync-last streaming: dispatches pipeline in order, so a device_get of
    the LAST output closes the region; fetching every output would add the
    ~23 ms/fetch tunnel roundtrip per rep (what made the r4 roofline
    under-report kernel speed ~75x — memory/axon-tunnel-timing)."""
    xs = [make_input(i) for i in range(k)]
    _ = np.asarray(out_slice(fn(xs[0])))          # warm/compile
    _ = np.asarray(out_slice(fn(xs[1])))          # first post-compile run lies
    t0 = time.perf_counter()
    outs = [fn(x) for x in xs]
    _ = np.asarray(out_slice(outs[-1]))
    return (time.perf_counter() - t0) / k


def device_time(fn, x0, perturb, reps=16):
    """Kernel device time via an in-jit scan loop with per-rep varied input
    (the tunnel dedupes identical dispatches; per-dispatch cost ~2 ms)."""
    import functools
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(x, n: int):
        def body(carry, r):
            o = fn(perturb(x, r))
            return carry + o, None
        out, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(n, dtype=jnp.int32))
        return out

    _ = np.asarray(loop(x0, 1))
    _ = np.asarray(loop(x0, reps))
    best = None
    for p in (1e-6, 2e-6, 3e-6):  # freshly-compiled programs absorb a
        t0 = time.perf_counter()  # one-time ~450 ms cost in their first
        _ = np.asarray(loop(x0 + p, reps))  # timed series: take the min
        dt = (time.perf_counter() - t0 - 0.025) / reps
        best = dt if best is None else min(best, dt)
    return max(best, 1e-6)


def main():
    import jax
    import jax.numpy as jnp
    from tpusfm.kernels.distance import nn_search

    rows = []
    # salt the inputs so the tunnel's byte-identical dispatch dedup can
    # never serve a cached result from a previous roofline run
    rng = np.random.default_rng(time.time_ns() % (1 << 31))

    # --- NN matching, 10k x 10k x 128 ---
    n, d = 10000, 128
    q0 = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    db = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    flops = 2.0 * n * n * d
    bytes_ = 2 * n * d * 4 + n * 12

    # throwaway series: a one-time ~450 ms per-process device cost lands in
    # the first timed loop of the process regardless of warm-up calls
    device_time(lambda x: nn_search(x, db.astype(jnp.bfloat16))[1][0],
                q0.astype(jnp.bfloat16),
                lambda x, r: x + r.astype(x.dtype) * jnp.asarray(1e-3, x.dtype))

    for dtype, peak, label in ((jnp.bfloat16, PEAK_BF16, "nn_match_bf16"),
                               (jnp.float32, PEAK_F32, "nn_match_f32")):
        qq = q0.astype(dtype)
        dd = db.astype(dtype)
        t = device_time(
            lambda x: nn_search(x, dd)[1][0],
            qq, lambda x, r: x + r.astype(x.dtype) * jnp.asarray(1e-3, x.dtype))
        # attainable bound: MXU at peak for the cross-matmul; f32 HIGHEST
        # runs the 6-pass decomposition (~3x the flops at bf16 rate)
        bound_ms = (flops / peak) * 1e3
        rows.append({"kernel": label, "shape": f"{n}x{n}x{d}",
                     "ms": round(t * 1e3, 2),
                     "gflop": round(flops / 1e9, 1),
                     "tflops": round(flops / t / 1e12, 2),
                     "pct_peak": round(flops / t / peak * 100, 1),
                     "bound_ms": round(bound_ms, 3),
                     "bound": "MXU"})

    # --- SIFT detect+describe, full res, 10k features ---
    from tpusfm.io import imread_gray
    from tpusfm.io.dataset import source_image
    from tpusfm.config import PipelineConfig, SiftConfig, MatchConfig, RansacConfig
    from tpusfm.features.sift import sift_detect_and_compute

    g = imread_gray(source_image("PikaBun1.jpg"))
    scfg = SiftConfig(max_features=10000)
    img0 = jnp.asarray(np.stack([np.asarray(g)]))
    t = stream(lambda x: sift_detect_and_compute(x, scfg),
               lambda i: img0 + i * 1e-6, lambda f: f.kpts.xy[0, 0])
    px = 4 * g.shape[0] * g.shape[1]          # upsampled base pixels
    # analytic: pyramid+extrema ~200 FLOP/px, planes+pooling ~1.4 kFLOP/px
    # on octave 0 shrinking 4x per octave -> x4/3 total
    flops_sift = 1.6e3 * px * 4 / 3
    # minimum materialized traffic: gauss/dog/grads/planes/pooled stacks
    bytes_sift = 65 * px * 4 * 4 / 3
    rows.append({"kernel": "sift_fullres_10k", "shape": f"{g.shape} cap 10k",
                 "ms": round(t * 1e3, 1),
                 "gflop": round(flops_sift / 1e9, 1),
                 "tflops": round(flops_sift / t / 1e12, 3),
                 "pct_peak": round(flops_sift / t / PEAK_F32 * 100, 2),
                 "gbps": round(bytes_sift / t / 1e9, 1),
                 "pct_hbm": round(bytes_sift / t / HBM_BW * 100, 1),
                 "bound": "HBM/stencil"})

    # --- match+geometry batch program of the bench ---
    from tpusfm.sfm.two_view import two_view_batch
    from tpusfm.types import CameraIntrinsics
    import jax.tree_util as jtu

    cfg = PipelineConfig(sift=scfg, match=MatchConfig(max_matches=500),
                         ransac=RansacConfig(n_hypotheses=128))
    h, w = g.shape
    intr = CameraIntrinsics.ideal(0.8255 * w, 0.8255 * w, w / 2, h / 2)
    f1 = sift_detect_and_compute(img0, scfg)
    g2 = imread_gray(source_image("PikaBun4.jpg"))
    f2 = sift_detect_and_compute(jnp.asarray(np.stack([np.asarray(g2)])), scfg)

    def geo(x):
        f1x = jtu.tree_map(lambda a: a, f1)
        f1x = jtu.tree_map(
            lambda a: (a + x * 1e-6) if a.dtype == jnp.float32 else a, f1x)
        return two_view_batch(f1x, f2, intr, cfg)

    t = stream(lambda x: geo(x), lambda i: jnp.float32(i),
               lambda r: r.n_points)
    flops_geo = 2.0 * 2 * 10000 * 10000 * 128   # cross-check NN dominates
    rows.append({"kernel": "match+geometry (1 pair)", "shape": "10k feats",
                 "ms": round(t * 1e3, 1),
                 "gflop": round(flops_geo / 1e9, 1),
                 "tflops": round(flops_geo / t / 1e12, 2),
                 "pct_peak": round(flops_geo / t / PEAK_F32 * 100, 1),
                 "bound": "MXU+dispatch"})

    # --- one LM step of track-major BA, 32k tracks / 12 views ---
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    from scaling_bench import synth_ba_problem
    from tpusfm.ba.track_solver import bundle_adjust_tm, to_track_major
    from tpusfm.config import BaConfig

    K, dist, cams0, X0, obs = synth_ba_problem(12, 32768, 3)
    tobs = to_track_major(obs, n_tracks=32768)
    bcfg = BaConfig(max_iters=4)
    t = stream(lambda c: bundle_adjust_tm(c, X0, tobs, K, dist, bcfg, 1),
               lambda i: cams0 + (i + 1) * 1e-6, lambda o: o[2]) / bcfg.max_iters
    n_obs = int(np.asarray(tobs.mask).sum())
    flops_ba = 2500.0 * n_obs * 2      # blocks+schur and the extra cost pass
    rows.append({"kernel": "ba_tm_lm_step", "shape": "32k tracks/12 views",
                 "ms": round(t * 1e3, 1),
                 "gflop": round(flops_ba / 1e9, 2),
                 "tflops": round(flops_ba / t / 1e12, 3),
                 "pct_peak": round(flops_ba / t / PEAK_F32 * 100, 2),
                 "bound": "jacfwd/scatter"})

    out = {"peaks": {"bf16_tflops": 197, "f32_tflops": 98.5, "hbm_gbps": 819},
           "rows": rows}
    with open(os.path.join(ROOT, "out", "ROOFLINE.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("| kernel | shape | ms | GFLOP | TFLOP/s | %peak | bound |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['kernel']} | {r['shape']} | {r['ms']} | {r['gflop']} | "
              f"{r['tflops']} | {r['pct_peak']}% | {r['bound']} |")
    print("-> out/ROOFLINE.json")


if __name__ == "__main__":
    main()
