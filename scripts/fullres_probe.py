"""Probe: where does full-res (2016x1512, 10k features) SIFT cost go on chip.

Steps image size up and prints per-stage cold/warm times so the full-scale
bench configuration (VERDICT r3 #1) can be designed from data.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from tpusfm.io import imread_gray
    from tpusfm.io.dataset import source_image
    from tpusfm.config import SiftConfig
    from tpusfm.features.sift import sift_detect_and_compute

    g = imread_gray(source_image("PikaBun1.jpg"))
    H, W = g.shape
    print(f"native {H}x{W}", flush=True)

    sizes = [(378, 504), (756, 1008), (1512, 2016)]
    nf = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    for (h, w) in sizes:
        img = np.asarray(jax.image.resize(jnp.array(g), (h, w), "linear"))
        cfg = SiftConfig(max_features=nf)
        x = jnp.asarray(np.stack([img]))
        t0 = time.time()
        f = sift_detect_and_compute(x, cfg)
        jax.block_until_ready(f.desc)
        cold = time.time() - t0
        ts = []
        for i in range(3):
            t0 = time.time()
            f = sift_detect_and_compute(x + (i + 1) * 1e-6, cfg)
            jax.block_until_ready(f.desc)
            ts.append(time.time() - t0)
        print(f"{h}x{w} nf={nf}: cold {cold:.1f}s warm {min(ts)*1e3:.0f} ms "
              f"valid={int(np.asarray(f.kpts.mask).sum())}", flush=True)


if __name__ == "__main__":
    main()
