"""Per-stage steady-state profile of the bench pipeline on the current backend.

Answers VERDICT r2 #1: where do the milliseconds of a bench step go —
SIFT programs, the match+geometry program, or host/dispatch overhead?
Uses bench.py's exact shapes/configs so compiled programs are shared with
the benchmark via the persistent compilation cache.

Prints per-stage wall times and a derived dispatch-overhead estimate.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import bench  # noqa: E402


def timed(fn, out_of, reps=6):
    """device_get closes each rep — block_until_ready can return early on
    the tunneled backend (see RESULTS.md r4 measurement discipline)."""
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = out_of(fn())
        _ = np.asarray(out.reshape(-1)[:4]) if hasattr(out, "reshape") else np.asarray(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu
    from tpusfm.config import PipelineConfig, SiftConfig, MatchConfig
    from tpusfm.features.sift import sift_detect_and_compute
    from tpusfm.sfm.two_view import two_view_batch
    from tpusfm.types import CameraIntrinsics

    g1, g2 = bench._load_pair()
    h, w = g1.shape
    cfg = PipelineConfig(sift=SiftConfig(max_features=bench.N_FEATURES),
                         match=MatchConfig(max_matches=500))
    intr = CameraIntrinsics.ideal(0.8255 * w, 0.8255 * w, w / 2, h / 2)
    stack = jnp.asarray(np.stack([g1, g2] * bench.N_PAIRS))
    B2 = 2 * bench.N_PAIRS
    C = 2  # images per SIFT program (one pair)

    print(f"backend={jax.default_backend()} pairs={bench.N_PAIRS} "
          f"chunk={C} size={h}x{w}", flush=True)

    # warm up all programs
    t0 = time.perf_counter()
    feats = [sift_detect_and_compute(stack[i:i + C], cfg.sift) for i in range(0, B2, C)]
    fb = jtu.tree_map(lambda *xs: jnp.concatenate(xs), *feats)
    f1 = jtu.tree_map(lambda a: a[0::2], fb)
    f2 = jtu.tree_map(lambda a: a[1::2], fb)
    r = two_view_batch(f1, f2, intr, cfg)
    jax.block_until_ready(r.points3d)
    print(f"warmup(total incl compile): {time.perf_counter()-t0:.1f}s", flush=True)

    def cost_flops(fn, *args, **kw):
        """XLA's own FLOP estimate for the compiled program."""
        try:
            c = jax.jit(fn, **kw).lower(*args).compile().cost_analysis()
            if isinstance(c, (list, tuple)):
                c = c[0]
            return float(c.get("flops", 0.0))
        except Exception:
            return 0.0

    PEAK_BF16 = 197e12  # TPU v5e MXU peak, bf16 (394 TOPS is the int8 figure)

    t_sift1 = timed(lambda: sift_detect_and_compute(stack[:C], cfg.sift),
                    lambda f: f.desc)
    fl_sift = cost_flops(
        lambda x: sift_detect_and_compute.__wrapped__(x, cfg.sift), stack[:C])
    print(f"one SIFT chunk ({C} imgs): {t_sift1*1e3:8.1f} ms "
          f"({t_sift1/C*1e3:.1f} ms/img, {fl_sift/1e9:.2f} GFLOP, "
          f"{fl_sift/t_sift1/1e12:.3f} TFLOP/s, "
          f"MFU {fl_sift/t_sift1/PEAK_BF16*100:.2f}%)", flush=True)

    def all_sift():
        return [sift_detect_and_compute(stack[i:i + C], cfg.sift)
                for i in range(0, B2, C)]
    t_sift_all = timed(all_sift, lambda fs: fs[-1].desc)
    print(f"all SIFT ({B2} imgs, {B2//C} programs): {t_sift_all*1e3:8.1f} ms",
          flush=True)

    t_gather = timed(
        lambda: jtu.tree_map(lambda *xs: jnp.concatenate(xs), *feats),
        lambda fb_: fb_.desc)
    print(f"concat/deinterleave:      {t_gather*1e3:8.1f} ms", flush=True)

    t_geo = timed(lambda: two_view_batch(f1, f2, intr, cfg),
                  lambda rr: rr.points3d)
    fl_geo = cost_flops(
        lambda a, b: two_view_batch.__wrapped__(a, b, intr, cfg), f1, f2)
    print(f"match+geometry batch:     {t_geo*1e3:8.1f} ms "
          f"({t_geo/bench.N_PAIRS*1e3:.1f} ms/pair, {fl_geo/1e9:.2f} GFLOP, "
          f"{fl_geo/t_geo/1e12:.3f} TFLOP/s, "
          f"MFU {fl_geo/t_geo/PEAK_BF16*100:.2f}%)", flush=True)

    def full_step():
        fs = all_sift()
        fb_ = jtu.tree_map(lambda *xs: jnp.concatenate(xs), *fs)
        a = jtu.tree_map(lambda x: x[0::2], fb_)
        b = jtu.tree_map(lambda x: x[1::2], fb_)
        return two_view_batch(a, b, intr, cfg)
    t_step = timed(full_step, lambda rr: rr.points3d)
    frames = 2.0 * bench.N_PAIRS
    print(f"full step ({frames:.0f} frames): {t_step*1e3:8.1f} ms "
          f"-> {frames/t_step:.2f} f/s", flush=True)
    overhead = t_step - t_sift_all - t_gather - t_geo
    print(f"residual (pipelining/dispatch): {overhead*1e3:8.1f} ms", flush=True)

    if "--trace" in sys.argv:
        # XLA op-level trace for TensorBoard (SURVEY.md §5 tracing row);
        # tolerated to fail on backends without profiler support (the
        # tunnel plugin may not export TraceMe hooks).
        tdir = "out/trace"
        try:
            with jax.profiler.trace(tdir):
                jax.block_until_ready(full_step().points3d)
            print(f"trace -> {tdir}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"trace unavailable on this backend: {e}", flush=True)


if __name__ == "__main__":
    main()
