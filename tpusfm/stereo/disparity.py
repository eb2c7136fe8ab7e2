"""Match-based disparity + the RMS-vs-ground-truth benchmark.

Replicates matchBasedDispCalculate — THE quantitative benchmark of the
reference (/root/reference/SfM-GMS/SfM-GMS/DisparityUtil.cpp:93-216):
for {sift, orb} x {sparse, dense} x {none, gms, logos} produce a disparity
image from per-match |x1 - x2| at the query pixel, then
RMS = sqrt(mean over valid pixels of (disp - gt/disp_ratio)^2) plus the
valid-disparity count (DisparityUtil.cpp:188-201).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpusfm.config import PipelineConfig, MatchConfig
from tpusfm.features.dense import dense_sift_descriptors
from tpusfm.features.sift import sift_detect_and_compute
from tpusfm.features.orb import orb_detect_and_compute
from tpusfm.kernels.distance import nn_search
from tpusfm.match.bf import bf_match
from tpusfm.match.gms import gms_filter
from tpusfm.match.logos import logos_match
from tpusfm.types import Features, Keypoints, Matches


@functools.partial(jax.jit, static_argnames=("height", "width"))
def match_disparity_image(kpts1: Keypoints, kpts2: Keypoints, matches: Matches,
                          height: int, width: int):
    """Disparity image from matches: disp[y, x] = |x - x1| at each matched
    query pixel; unmatched pixels invalid (the reference initializes to 255,
    DisparityUtil.cpp:179-185). Returns (disp (H, W) f32, valid (H, W) bool)."""
    p1, p2 = matches.gather_xy(kpts1, kpts2)
    d = jnp.abs(p1[:, 0] - p2[:, 0])
    x = jnp.clip(jnp.round(p1[:, 0]).astype(jnp.int32), 0, width - 1)
    y = jnp.clip(jnp.round(p1[:, 1]).astype(jnp.int32), 0, height - 1)
    flat = jnp.where(matches.mask, y * width + x, height * width)
    disp = jnp.zeros((height * width + 1,)).at[flat].max(jnp.where(matches.mask, d, 0.0))
    hit = jnp.zeros((height * width + 1,), bool).at[flat].set(True)
    return disp[:-1].reshape(height, width), hit[:-1].reshape(height, width)


def disparity_rms(disp, valid, gt, disp_ratio: float, gt_valid=None):
    """The reference metric (DisparityUtil.cpp:188-201): RMS between computed
    disparity and gt/disp_ratio over pixels where both are valid, plus count.

    gt: ground-truth image in [0, 1] (8-bit scale restored internally)."""
    gt255 = jnp.asarray(gt) * 255.0
    gv = gt255 > 0 if gt_valid is None else gt_valid
    both = valid & gv
    err = (disp - gt255 / disp_ratio) ** 2
    n = jnp.sum(both.astype(jnp.float32))
    rms = jnp.sqrt(jnp.sum(jnp.where(both, err, 0.0)) / jnp.maximum(n, 1.0))
    return rms, n


def dense_features(img, cell: int = 4) -> Features:
    """Per-pixel descriptors wrapped as Features (the reference's dense
    keypoint grid, DisparityUtil.cpp:125-133)."""
    h, w = img.shape
    desc = dense_sift_descriptors(img, cell=cell)
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    kpts = Keypoints(
        xy=jnp.stack([xs.reshape(-1), ys.reshape(-1)], 1),
        scale=jnp.ones(h * w, jnp.float32),
        angle=jnp.zeros(h * w, jnp.float32),
        response=jnp.ones(h * w, jnp.float32),
        mask=jnp.ones(h * w, bool),
    )
    return Features(kpts=kpts, desc=desc.reshape(h * w, -1))


def run_disparity_benchmark(
    left, right, gt, alg: str, density: str, disp_ratio: float,
    cfg: PipelineConfig = PipelineConfig(),
):
    """One cell of the reference benchmark grid (DisparityUtil.cpp:430-461).

    alg in {"sift", "orb", "gms", "logos"}; density in {"sparse", "dense"}.
    Returns dict(rms, count, disp, valid)."""
    h, w = left.shape
    size = (w, h)
    if density == "dense":
        f1 = dense_features(left)
        f2 = dense_features(right)
        metric = "l2"
    elif alg == "orb":
        f1 = orb_detect_and_compute(left, cfg.orb)
        f2 = orb_detect_and_compute(right, cfg.orb)
        metric = "hamming"
    else:
        f1 = sift_detect_and_compute(left, cfg.sift)
        f2 = sift_detect_and_compute(right, cfg.sift)
        metric = "l2"

    mcfg = dataclasses.replace(cfg.match, cross_check=False)
    raw = bf_match(f1.desc, f2.desc, f1.kpts.mask, f2.kpts.mask, mcfg,
                   metric=metric, prune=False, capacity=f1.capacity)
    if alg == "gms":
        matches = gms_filter(f1.kpts, f2.kpts, raw, size, size, cfg.gms)
    elif alg == "logos" and density == "sparse":
        matches = logos_match(f1, f2, cfg.logos)
    else:
        matches = raw

    disp, valid = match_disparity_image(f1.kpts, f2.kpts, matches, h, w)
    rms, n = disparity_rms(disp, valid, gt, disp_ratio)
    return {
        "rms": float(rms),
        "count": int(n),
        "n_matches": int(matches.count),
        "disp": disp,
        "valid": valid,
    }
