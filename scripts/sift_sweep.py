"""SIFT batching/octave sweep on the current backend.

Finds the throughput-optimal (chunk size, max_octaves) for the bench
pipeline: per-dispatch tunnel latency argues for large image batches per
program, the octave-0 working set argues for small ones, and octaves >= 4
hold ~1% of selected features (measured on the bench pair) so capping the
pyramid saves programs. Prints ms/image for each configuration.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from tpusfm.config import SiftConfig
    from tpusfm.features.sift import sift_detect_and_compute

    g1, g2 = bench._load_pair()
    stack16 = jnp.asarray(np.stack([g1, g2] * 8))
    print(f"backend={jax.default_backend()}", flush=True)

    # stage breakdown at the bench configuration (chunk=4)
    import math

    from tpusfm.features import scalespace as ss
    from tpusfm.features.sift import (
        _merge_octaves, _octave_bases, _octave_detect, _octave_detect_tail,
        _prepare_base, _BORDER,
    )

    cfg = SiftConfig(max_features=bench.N_FEATURES)
    x = stack16[:4]

    def stage_times():
        t = {}
        def tick(name, fn, ready):
            t0 = time.perf_counter()
            r = fn()
            jax.block_until_ready(ready(r))
            t[name] = (time.perf_counter() - t0) * 1e3
            return r
        base = tick("prepare", lambda: _prepare_base(x, cfg), lambda r: r)
        h, w = base.shape[-2:]
        n_oct = ss.num_octaves(h, w, cfg.max_octaves)
        n_oct = min(n_oct, 1 + max(0, int(math.log2(min(h, w) / (4 * _BORDER)))))
        bases = tick("bases", lambda: _octave_bases(base, n_oct, cfg), lambda r: r[-1])
        plan = []
        base_scale = 0.5 if cfg.upsample else 1.0
        for o, b in enumerate(bases):
            if min(b.shape[-2:]) < 4 * _BORDER:
                break
            plan.append((b, base_scale * 2.0 ** o, max(32, cfg.max_features >> o)))
        o0 = tick("oct0", lambda: _octave_detect(*plan[0], cfg), lambda r: r[4])
        o1 = tick("oct1", lambda: _octave_detect(*plan[1], cfg), lambda r: r[4])
        tail = plan[2:]
        ot = tick("tail(x%d)" % len(tail), lambda: _octave_detect_tail(
            tuple(b for b, _, _ in tail), tuple(s for _, s, _ in tail),
            tuple(k for _, _, k in tail), cfg), lambda r: r[-1][4])
        outs = [o0, o1] + list(ot)
        tick("merge", lambda: _merge_octaves(outs, cfg.max_features), lambda r: r.desc)
        return t

    stage_times()  # warm all programs
    t = stage_times()
    total = sum(t.values())
    for name, ms in t.items():
        print(f"  stage {name:10s}: {ms:7.1f} ms", flush=True)
    print(f"  stage sum: {total:.1f} ms for chunk of 4 ({total/4:.1f} ms/img)",
          flush=True)

    for max_oct in (8, 5):
        cfg = SiftConfig(max_features=bench.N_FEATURES, max_octaves=max_oct)
        for chunk in (4, 8, 16):
            x = stack16[:chunk]
            t0 = time.perf_counter()
            f = sift_detect_and_compute(x, cfg)
            jax.block_until_ready(f.desc)
            compile_s = time.perf_counter() - t0
            ts = []
            for i in range(5):
                xi = x + np.float32(i) * 1e-6
                t0 = time.perf_counter()
                f = sift_detect_and_compute(xi, cfg)
                jax.block_until_ready(f.desc)
                ts.append(time.perf_counter() - t0)
            dt = float(np.median(ts))
            nk = int(np.asarray(f.kpts.mask.sum(1)).mean())
            print(f"max_oct={max_oct} chunk={chunk:2d}: {dt/chunk*1e3:7.1f} ms/img "
                  f"(warm {dt*1e3:.0f} ms/chunk, first {compile_s:.1f}s, "
                  f"mean kpts {nk})", flush=True)


if __name__ == "__main__":
    main()
