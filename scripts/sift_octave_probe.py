"""Cumulative per-stage device-time probe of SIFT octave 0.

Sync-last measurement (see memory/axon-tunnel-timing): dispatch K fresh
inputs, np.asarray ONLY the last tiny output; programs execute in order so
wall/K is true throughput without the ~23 ms per-fetch tunnel roundtrip.
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

_uniq = [1000]


def timed(fn, make_input, out_slice, k=4, label=""):
    xs = []
    for _ in range(k):
        _uniq[0] += 1
        xs.append(make_input(_uniq[0]))
    _ = np.asarray(out_slice(fn(xs[0])))          # compile
    _ = np.asarray(out_slice(fn(xs[1])))          # warm (first-run anomaly)
    t0 = time.perf_counter()
    outs = [fn(x) for x in xs]
    _ = np.asarray(out_slice(outs[-1]))           # sync last only
    dt = (time.perf_counter() - t0) / k
    print(f"{label}: {dt*1e3:8.1f} ms", flush=True)
    return dt


def main():
    g = imread_gray(source_image("PikaBun1.jpg"))
    nf = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    cfg = SiftConfig(max_features=nf)
    img0 = jnp.asarray(np.stack([g]))
    print(f"image {g.shape} nf={nf}", flush=True)

    n_oct = 8
    bases = fs._prepare_and_bases(img0, n_oct, cfg)
    b0 = bases[0]
    ho, wo = b0.shape[-2:]
    k_oct = min(max(32, nf), cfg.n_octave_layers * ho * wo)
    mk = lambda u: b0 + u * 1e-6
    n_layers = cfg.n_octave_layers
    thr = 0.5 * cfg.contrast_threshold / n_layers

    def jitstage(f):
        return jax.jit(lambda b: jax.vmap(f)(b))

    # a: pyramid only
    def st_a(bb):
        gauss, dog = ss.build_octave(bb, cfg.sigma, n_layers)
        return jnp.sum(dog[:, ::64, ::64])
    # b: + extrema
    def st_b(bb):
        gauss, dog = ss.build_octave(bb, cfg.sigma, n_layers)
        ext = fs._extrema_mask(dog, thr)
        return jnp.sum(jnp.where(ext, jnp.abs(dog[1:-1]), -1.0))
    # c: + topk
    def st_c(bb):
        gauss, dog = ss.build_octave(bb, cfg.sigma, n_layers)
        ext = fs._extrema_mask(dog, thr)
        score = jnp.where(ext, jnp.abs(dog[1:-1]), -1.0)
        v, i = safe_top_k(score.reshape(-1), k_oct)
        return v[0] + i[0].astype(jnp.float32)
    # d: + refine
    def st_d(bb):
        gauss, dog = ss.build_octave(bb, cfg.sigma, n_layers)
        ext = fs._extrema_mask(dog, thr)
        score = jnp.where(ext, jnp.abs(dog[1:-1]), -1.0)
        top_v, top_i = safe_top_k(score.reshape(-1), k_oct)
        h, w = dog.shape[1], dog.shape[2]
        li = top_i // (h * w) + 1
        yi = (top_i % (h * w)) // w
        xi = top_i % w
        l, y, x, off, contrast, ok = fs._refine_batch(dog, li, yi, xi, n_layers, cfg)
        return jnp.sum(off) + jnp.sum(contrast)
    # e: + gradients of the gauss stack
    def st_e(bb):
        gauss, dog = ss.build_octave(bb, cfg.sigma, n_layers)
        dx, dy = ss.gradients(gauss)
        return jnp.sum(dx[:, ::64, ::64]) + jnp.sum(dy[:, ::64, ::64])
    # f: planes + pool for all 3 layers (no gathers)
    def st_f(bb):
        gauss, dog = ss.build_octave(bb, cfg.sigma, n_layers)
        dx, dy = ss.gradients(gauss)
        acc = jnp.float32(0)
        for l in range(1, n_layers + 1):
            sigma_l = cfg.sigma * 2.0 ** (l / n_layers)
            P = fs._tri_pool(fs._oriented_planes(dx[l], dy[l]),
                             int(round(3.0 * sigma_l)))
            acc = acc + jnp.sum(P[:, ::64, ::64])
        return acc
    # g: planes only (no pool)
    def st_g(bb):
        gauss, dog = ss.build_octave(bb, cfg.sigma, n_layers)
        dx, dy = ss.gradients(gauss)
        acc = jnp.float32(0)
        for l in range(1, n_layers + 1):
            P = fs._oriented_planes(dx[l], dy[l])
            acc = acc + jnp.sum(P[:, ::64, ::64])
        return acc

    # full octave (two-program structure)
    def full(x):
        gauss, nxt, fx, fy, fl, c, ok = fs._octave_select(x, k_oct, cfg)
        return fs._octave_describe(gauss, fx, fy, fl, c, ok, 0.5, cfg)
    timed(full, mk, lambda o: o[0][0, 0], label="octave0 FULL           ")
    timed(lambda x: fs._octave_select(x, k_oct, cfg), mk,
          lambda o: o[2][0, 0], label="octave0 select only    ")
    timed(jitstage(st_a), mk, lambda o: o[0], label="a pyramid              ")
    timed(jitstage(st_b), mk, lambda o: o[0], label="b +extrema             ")
    timed(jitstage(st_c), mk, lambda o: o[0], label="c +topk                ")
    timed(jitstage(st_d), mk, lambda o: o[0], label="d +refine              ")
    timed(jitstage(st_e), mk, lambda o: o[0], label="e pyramid+gradients    ")
    timed(jitstage(st_g), mk, lambda o: o[0], label="g +planes (no pool)    ")
    timed(jitstage(st_f), mk, lambda o: o[0], label="f +planes+pool x3      ")


if __name__ == "__main__":
    main()
