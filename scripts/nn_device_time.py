"""Device-side NN kernel time: R reps inside ONE program via lax.scan.

Separates true kernel throughput from the per-dispatch tunnel latency
(~25 ms/program on the axon backend), which the one-call-per-rep pattern
cannot see past. Inputs vary per rep (tunnel dedups identical dispatches).
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpusfm.kernels.distance import nn_search_pallas  # noqa: E402


@functools.partial(jax.jit, static_argnames=("reps", "tile_q", "tile_db"))
def loop(q0, db, m, reps: int, tile_q: int, tile_db: int):
    def body(carry, r):
        q = q0 + r.astype(q0.dtype) * jnp.asarray(1e-3, q0.dtype)
        idx, best, second = nn_search_pallas(q, db, m, tile_q=tile_q, tile_db=tile_db)
        return carry + idx[0] + best[0].astype(jnp.int32), None

    out, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(reps, dtype=jnp.int32))
    return out


def bench(n, d, dtype, tile_q, tile_db, reps=16):
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.standard_normal((n, d)), dtype)
    db = jnp.asarray(rng.standard_normal((n, d)), dtype)
    m = jnp.ones((n,), jnp.float32)
    _ = np.asarray(loop(q0, db, m, 1, tile_q, tile_db))  # warm small
    _ = np.asarray(loop(q0, db, m, reps, tile_q, tile_db))  # warm full
    t0 = time.perf_counter()
    _ = np.asarray(loop(q0 + 1e-5, db, m, reps, tile_q, tile_db))
    dt = (time.perf_counter() - t0 - 0.025) / reps  # subtract one dispatch
    gflop = 2 * n * n * d / 1e9
    peak = 197e3 if dtype == jnp.bfloat16 else 98.5e3
    name = "bf16" if dtype == jnp.bfloat16 else np.dtype(dtype).name
    print(f"  n={n} d={d} {name} tq={tile_q} td={tile_db}: {dt*1e3:7.2f} ms/call "
          f"{gflop/dt/1e3:6.2f} TFLOP/s ({gflop/dt/peak*100:5.1f}% peak)",
          flush=True)
    return dt


if __name__ == "__main__":
    n = 10240
    for tq, td in [(1024, 512), (2048, 512), (2048, 1024), (1024, 1024),
                   (512, 512), (2048, 2048)]:
        try:
            bench(n, 128, jnp.bfloat16, tq, td)
        except Exception as e:  # noqa: BLE001
            print(f"  tq={tq} td={td}: FAIL {type(e).__name__}: {e}", flush=True)
    bench(n, 128, jnp.float32, 1024, 1024)
