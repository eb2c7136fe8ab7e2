"""Top-k selection variants for the SIFT candidate preselect (60.9M scores).

Measures device time (in-jit scan loop) and, on the REAL PikaBun octave-0
score map, how many of the exact top-10000 candidates each variant loses.
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

from tpusfm.io import imread_gray  # noqa: E402
from tpusfm.io.dataset import source_image  # noqa: E402
from tpusfm.config import SiftConfig  # noqa: E402
from tpusfm.features import sift as fs  # noqa: E402
from tpusfm.features import scalespace as ss  # noqa: E402
from tpusfm.utils.topk import safe_top_k  # noqa: E402

K = 10000


def chunk_capped_top_k(x, k, kc=1024, chunk=65536):
    """Per-chunk top-kc + exact merge. Exact iff no chunk holds > kc of the
    global top-k."""
    n = x.shape[-1]
    j = -(-n // chunk)
    pad = j * chunk - n
    xp = jnp.concatenate([x, jnp.full((pad,), -jnp.inf, x.dtype)], -1)
    xc = xp.reshape(j, chunk)
    v, i = jax.lax.top_k(xc, kc)
    gi = i + (jnp.arange(j, dtype=i.dtype) * chunk)[:, None]
    v2, i2 = safe_top_k(v.reshape(-1), k)
    return v2, jnp.take(gi.reshape(-1), i2)


def layer_reduced_top_k(score3, k, kc=1024):
    """Reduce the layer axis (3 -> 1) with argmax tracking, then chunk-capped
    top-k on the (H*W,) winner map. Loses only same-pixel multi-layer extrema."""
    L, h, w = score3.shape
    win = score3[0]
    wl = jnp.zeros((h, w), jnp.int32)
    for l in range(1, L):
        take = score3[l] > win
        win = jnp.where(take, score3[l], win)
        wl = jnp.where(take, l, wl)
    v, i = chunk_capped_top_k(win.reshape(-1), k, kc=kc)
    li = jnp.take(wl.reshape(-1), i)
    return v, li.astype(i.dtype) * (h * w) + i


@functools.partial(jax.jit, static_argnames=("fn_id", "reps", "kc"))
def loop(score, fn_id: int, reps: int, kc: int):
    def body(carry, r):
        s = score + r.astype(jnp.float32) * 1e-9
        if fn_id == 0:
            v, i = safe_top_k(s.reshape(-1), K)
        elif fn_id == 1:
            v, i = chunk_capped_top_k(s.reshape(-1), K, kc=kc)
        else:
            v, i = layer_reduced_top_k(s, K, kc=kc)
        return carry + v[0] + i[0].astype(jnp.float32), None

    out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps, dtype=jnp.int32))
    return out


def bench(score, fn_id, kc, reps=8, label=""):
    _ = np.asarray(loop(score, fn_id, 1, kc))
    _ = np.asarray(loop(score, fn_id, reps, kc))
    t0 = time.perf_counter()
    _ = np.asarray(loop(score + 1e-8, fn_id, reps, kc))
    dt = (time.perf_counter() - t0 - 0.025) / reps
    print(f"{label}: {dt*1e3:7.2f} ms/call", flush=True)


def main():
    g = imread_gray(source_image("PikaBun1.jpg"))
    cfg = SiftConfig(max_features=K)
    img0 = jnp.asarray(np.stack([g]))
    bases = fs._prepare_and_bases(img0, 8, cfg)
    b0 = bases[0][0]
    n_layers = cfg.n_octave_layers
    thr = 0.5 * cfg.contrast_threshold / n_layers

    @jax.jit
    def scores(bb):
        gauss, dog = ss.build_octave(bb, cfg.sigma, n_layers)
        ext = fs._extrema_mask(dog, thr)
        return jnp.where(ext, jnp.abs(dog[1:-1]), -1.0)

    s = jax.block_until_ready(scores(b0))
    n_cand = int(np.asarray((s > 0).sum()))
    print(f"score map {s.shape}, candidates above thr: {n_cand}", flush=True)

    v0, i0 = safe_top_k(s.reshape(-1), K)
    exact = set(np.asarray(i0[np.asarray(v0) > 0]).tolist())
    for kc in (512, 1024, 2048):
        v1, i1 = chunk_capped_top_k(s.reshape(-1), K, kc=kc)
        got = set(np.asarray(i1[np.asarray(v1) > 0]).tolist())
        print(f"chunk-capped kc={kc}: lost {len(exact - got)} of {len(exact)}",
              flush=True)
    v2, i2 = layer_reduced_top_k(s, K, kc=1024)
    got = set(np.asarray(i2[np.asarray(v2) > 0]).tolist())
    print(f"layer-reduced kc=1024: lost {len(exact - got)} of {len(exact)}",
          flush=True)

    bench(s, 0, 0, label="safe_top_k (exact)     ")
    for kc in (512, 1024, 2048):
        bench(s, 1, kc, label=f"chunk-capped kc={kc:5d}  ")
    bench(s, 2, 1024, label="layer-reduced kc=1024  ")


if __name__ == "__main__":
    main()
