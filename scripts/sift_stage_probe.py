"""Per-stage chip profile of full-res SIFT: where do the milliseconds go.

Times each sub-program of sift_detect_and_compute separately (bases,
octave 0, octave 1, tail+merge) and, inside octave 0, the selection
(extrema + top-k) vs the descriptor sampling, to target the full-scale
bench optimization (VERDICT r4 item #1).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np  # noqa: E402


def timed(fn, reps=4):
    import jax

    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp
    import functools
    from tpusfm.io import imread_gray
    from tpusfm.io.dataset import source_image
    from tpusfm.config import SiftConfig
    from tpusfm.features import sift as fs
    from tpusfm.features import scalespace as ss
    from tpusfm.utils.topk import safe_top_k

    g = imread_gray(source_image("PikaBun1.jpg"))
    nf = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    cfg = SiftConfig(max_features=nf)
    img = jnp.asarray(np.stack([g]))
    print(f"image {g.shape} nf={nf}", flush=True)

    t = timed(lambda: fs.sift_detect_and_compute(img, cfg).desc)
    print(f"total sift: {t*1e3:8.1f} ms", flush=True)

    import math
    h, w = g.shape
    hh = h * 2 if cfg.upsample else h
    ww = w * 2 if cfg.upsample else w
    n_oct = ss.num_octaves(hh, ww, cfg.max_octaves)
    n_oct = min(n_oct, 1 + max(0, int(math.log2(min(hh, ww) / 20))))
    bases = fs._prepare_and_bases(img, n_oct, cfg)
    t = timed(lambda: fs._prepare_and_bases(img, n_oct, cfg))
    print(f"bases ({n_oct} octaves):   {t*1e3:8.1f} ms", flush=True)

    base_scale = 0.5 if cfg.upsample else 1.0
    for o in (0, 1):
        ho, wo = bases[o].shape[-2:]
        k_oct = min(max(32, nf >> o), cfg.n_octave_layers * ho * wo)
        t = timed(lambda o=o, k=k_oct: fs._octave_detect(
            bases[o], base_scale * 2.0 ** o, k, cfg))
        print(f"octave {o} ({ho}x{wo}, k={k_oct}): {t*1e3:8.1f} ms", flush=True)

    # inside octave 0: the selection path alone
    @functools.partial(jax.jit, static_argnames=("k",))
    def select_only(b, k: int):
        def one(bb):
            gauss, dog = ss.build_octave(bb, cfg.sigma, cfg.n_octave_layers)
            thr = 0.5 * cfg.contrast_threshold / cfg.n_octave_layers
            ext = fs._extrema_mask(dog, thr)
            score = jnp.where(ext, jnp.abs(dog[1:-1]), -1.0)
            return safe_top_k(score.reshape(-1), k)

        return jax.vmap(one)(b)

    ho, wo = bases[0].shape[-2:]
    k0 = min(max(32, nf), cfg.n_octave_layers * ho * wo)
    t = timed(lambda: select_only(bases[0], k0))
    print(f"octave 0 build+extrema+topk only: {t*1e3:8.1f} ms", flush=True)

    @functools.partial(jax.jit, static_argnames=("k",))
    def pyramid_only(b, k: int):
        def one(bb):
            gauss, dog = ss.build_octave(bb, cfg.sigma, cfg.n_octave_layers)
            thr = 0.5 * cfg.contrast_threshold / cfg.n_octave_layers
            ext = fs._extrema_mask(dog, thr)
            score = jnp.where(ext, jnp.abs(dog[1:-1]), -1.0)
            return jnp.sum(score)

        return jax.vmap(one)(b)

    t = timed(lambda: pyramid_only(bases[0], k0))
    print(f"octave 0 build+extrema (no topk): {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
