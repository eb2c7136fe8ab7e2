"""Tile sweep for the streaming NN kernel at the headline operating point.

Timing uses the device_get streaming pattern (scripts/sift_stage_probe.py):
fresh inputs per rep, np.asarray of an output slice closes the region.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpusfm.kernels.distance import nn_search_pallas  # noqa: E402


def bench(n, d, dtype, tile_q, tile_db, k=8):
    rng = np.random.default_rng(0)
    qs = [jnp.asarray(rng.standard_normal((n, d)), dtype) for _ in range(k)]
    db = jnp.asarray(rng.standard_normal((n, d)), dtype)
    m = jnp.ones((n,), jnp.float32)
    run = lambda q: nn_search_pallas(q, db, m, tile_q=tile_q, tile_db=tile_db)
    _ = np.asarray(run(qs[0])[1][:8])  # compile + warm
    t0 = time.perf_counter()
    outs = [run(q) for q in qs]
    _ = [np.asarray(o[1][:8]) for o in outs]
    dt = (time.perf_counter() - t0) / k
    gflop = 2 * n * n * d / 1e9
    peak = 197e3 if dtype == jnp.bfloat16 else 98.5e3
    print(f"  n={n} d={d} {np.dtype(dtype).name if dtype!=jnp.bfloat16 else 'bf16'} "
          f"tq={tile_q} td={tile_db}: {dt*1e3:7.2f} ms  "
          f"{gflop/dt/1e3:6.2f} TFLOP/s ({gflop/dt/peak*100:5.1f}% peak)",
          flush=True)
    return dt


if __name__ == "__main__":
    n = 10240
    print("bf16 sweep:", flush=True)
    for tq, td in [(512, 512), (1024, 512), (1024, 1024), (2048, 512),
                   (2048, 1024), (512, 1024), (1024, 256), (2048, 2048)]:
        try:
            bench(n, 128, jnp.bfloat16, tq, td)
        except Exception as e:  # noqa: BLE001
            print(f"  tq={tq} td={td}: FAIL {type(e).__name__}", flush=True)
    print("f32 (HIGHEST) best tiles:", flush=True)
    for tq, td in [(1024, 512), (2048, 512), (1024, 1024)]:
        try:
            bench(n, 128, jnp.float32, tq, td)
        except Exception as e:  # noqa: BLE001
            print(f"  tq={tq} td={td}: FAIL {type(e).__name__}", flush=True)
