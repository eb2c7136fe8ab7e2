"""Per-stage chip profile of full-res SIFT: where do the milliseconds go.

MEASUREMENT RULE for the tunneled TPU backend: jax.block_until_ready can
return before remote execution finishes (measured: a 2.25 s/img pipeline
"completes" in 0.4 ms), so every timing here streams K fresh inputs through
the stage and forces completion with a device_get (np.asarray) of a small
output slice per input — throughput = wall / K.
"""
from __future__ import annotations

import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np  # noqa: E402

_uniq = [0]


def throughput(stage_fn, make_input, out_slice, k=4, label=""):
    """Stream k fresh inputs through stage_fn; device_get of the LAST output
    forces completion (programs execute in order; fetching every output
    would add the ~23 ms/fetch tunnel roundtrip per rep — see
    memory/axon-tunnel-timing)."""
    xs = []
    for _ in range(k):
        _uniq[0] += 1
        xs.append(make_input(_uniq[0]))
    # warm/compile twice (first post-compile run can be anomalously slow)
    _ = np.asarray(out_slice(stage_fn(xs[0])))
    _ = np.asarray(out_slice(stage_fn(xs[1])))
    t0 = time.perf_counter()
    outs = [stage_fn(x) for x in xs]
    _ = np.asarray(out_slice(outs[-1]))
    dt = (time.perf_counter() - t0) / k
    print(f"{label}: {dt*1e3:8.1f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from tpusfm.io import imread_gray
    from tpusfm.io.dataset import source_image
    from tpusfm.config import SiftConfig
    from tpusfm.features import sift as fs
    from tpusfm.features import scalespace as ss
    from tpusfm.utils.topk import safe_top_k

    g = imread_gray(source_image("PikaBun1.jpg"))
    nf = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    cfg = SiftConfig(max_features=nf)
    img0 = jnp.asarray(np.stack([g]))
    print(f"image {g.shape} nf={nf}", flush=True)

    mk_img = lambda u: img0 + u * 1e-6

    throughput(lambda x: fs.sift_detect_and_compute(x, cfg), mk_img,
               lambda f: f.kpts.xy[0, 0], label="total sift")

    h, w = g.shape
    hh, ww = (h * 2, w * 2) if cfg.upsample else (h, w)
    n_oct = min(ss.num_octaves(hh, ww, cfg.max_octaves),
                1 + max(0, int(math.log2(min(hh, ww) / 20))))
    throughput(lambda x: fs._prepare_and_bases(x, n_oct, cfg), mk_img,
               lambda bs: bs[-1][0, 0, 0], label=f"bases ({n_oct} octaves)")

    bases = fs._prepare_and_bases(img0, n_oct, cfg)
    base_scale = 0.5 if cfg.upsample else 1.0

    def octave(x, scale, k):
        gauss, fx, fy, fl, c, ok = fs._octave_select(x, k, cfg)
        return fs._octave_describe(gauss, fx, fy, fl, c, ok, scale, cfg)

    for o in (0, 1, 2):
        ho, wo = bases[o].shape[-2:]
        k_oct = min(max(32, nf >> o), cfg.n_octave_layers * ho * wo)
        throughput(
            lambda x, o=o, k=k_oct: octave(x, base_scale * 2.0 ** o, k),
            lambda u, o=o: bases[o] + u * 1e-6,
            lambda out: out[0][0, 0],
            label=f"octave {o} ({ho}x{wo}, k={k_oct})")

    @functools.partial(jax.jit, static_argnames=("k",))
    def select_only(b, k: int):
        def one(bb):
            gauss, dog = ss.build_octave(bb, cfg.sigma, cfg.n_octave_layers)
            thr = 0.5 * cfg.contrast_threshold / cfg.n_octave_layers
            ext = fs._extrema_mask(dog, thr)
            score = jnp.where(ext, jnp.abs(dog[1:-1]), -1.0)
            return safe_top_k(score.reshape(-1), k)

        return jax.vmap(one)(b)

    @jax.jit
    def pyramid_only(b):
        def one(bb):
            gauss, dog = ss.build_octave(bb, cfg.sigma, cfg.n_octave_layers)
            thr = 0.5 * cfg.contrast_threshold / cfg.n_octave_layers
            ext = fs._extrema_mask(dog, thr)
            return jnp.sum(jnp.where(ext, jnp.abs(dog[1:-1]), -1.0))

        return jax.vmap(one)(b)

    ho, wo = bases[0].shape[-2:]
    k0 = min(max(32, nf), cfg.n_octave_layers * ho * wo)
    throughput(lambda x: select_only(x, k0),
               lambda u: bases[0] + u * 1e-6,
               lambda out: out[0][0, 0],
               label="octave0 build+extrema+topk")
    throughput(pyramid_only,
               lambda u: bases[0] + u * 1e-6,
               lambda out: out[0],
               label="octave0 build+extrema    ")


if __name__ == "__main__":
    main()
