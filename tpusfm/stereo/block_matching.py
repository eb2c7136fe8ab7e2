"""Block-matching stereo (StereoBM equivalent).

Replaces the reference's cv::StereoBM configuration
(/root/reference/SfM-GMS/SfM-GMS/DisparityUtil.cpp:22-49: numDisparities=224,
blockSize(default 21 -> here config), minDisparity=-39, preFilterCap=61,
textureThreshold=507, uniqueness=0, disp12MaxDiff=1) as a streaming scan over
the disparity axis: per-disparity SAD costs come from an integral-image box
filter and only running (best, second, argbest) accumulators are kept — the
cost volume is never materialized. Left-right consistency reuses the same
scan by tracking the right view's running minimum of shifted costs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpusfm.config import StereoBMConfig
from tpusfm.stereo.filters import box_filter

_BIG = 1e30


def _xsobel_prefilter(img, cap: float):
    """OpenCV PREFILTER_XSOBEL: horizontal Sobel clamped to [-cap, cap]."""
    g = jnp.asarray(img, jnp.float32) * 255.0
    p = jnp.pad(g, ((1, 1), (1, 1)), mode="edge")
    sob = (
        (p[:-2, 2:] + 2 * p[1:-1, 2:] + p[2:, 2:])
        - (p[:-2, :-2] + 2 * p[1:-1, :-2] + p[2:, :-2])
    ) * 0.25
    return jnp.clip(sob, -cap, cap)


@functools.partial(jax.jit, static_argnames=("cfg",))
def stereo_bm(left, right, cfg: StereoBMConfig = StereoBMConfig()):
    """Dense disparity of the left image. Returns (disp (H, W) float32,
    valid (H, W) bool). Disparity in pixels (left_x - right_x), can include
    the negative range when cfg.min_disparity < 0."""
    h, w = left.shape
    r = cfg.block_size // 2
    cap = float(cfg.prefilter_cap)
    lp = _xsobel_prefilter(left, cap)
    rp = _xsobel_prefilter(right, cap)

    texture = box_filter(jnp.abs(lp), r)
    xs = jnp.arange(w)[None, :]

    disps = jnp.arange(cfg.min_disparity, cfg.min_disparity + cfg.num_disparities)

    def body(carry, d):
        bestL, best2L, argL, bestR, argR, cm1, cp1, prev = carry
        # right image shifted so column x aligns with right column x - d
        rs = jnp.roll(rp, d, axis=1)
        cost = box_filter(jnp.abs(lp - rs), r)
        # columns whose window would wrap are invalid
        ok = (xs - d >= r) & (xs - d < w - r) & (xs >= r) & (xs < w - r)
        cost = jnp.where(ok, cost, _BIG)

        better = cost < bestL
        best2L = jnp.where(better, bestL, jnp.minimum(best2L, cost))
        bestL = jnp.where(better, cost, bestL)
        argL = jnp.where(better, d, argL)
        # neighbors of the winning disparity (for subpixel interpolation):
        # cost at d-1 is last iteration's cost; cost at d+1 arrives next
        # iteration when d == argL + 1
        cm1 = jnp.where(better, prev, cm1)
        # a new minimum invalidates any previously captured right neighbor;
        # if the scan ends before d == argL + 1 the stale value must not be
        # used for refinement (OpenCV skips refinement at the range boundary)
        cp1 = jnp.where(better, _BIG, cp1)
        cp1 = jnp.where(d == argL + 1, cost, cp1)

        # right-view cost: costR(x, d) = costL(x + d, d)
        costR = jnp.roll(cost, -d, axis=1)
        betterR = costR < bestR
        bestR = jnp.where(betterR, costR, bestR)
        argR = jnp.where(betterR, d, argR)
        return (bestL, best2L, argL, bestR, argR, cm1, cp1, cost), None

    init = (
        jnp.full((h, w), _BIG),
        jnp.full((h, w), _BIG),
        jnp.zeros((h, w), jnp.int32),
        jnp.full((h, w), _BIG),
        jnp.zeros((h, w), jnp.int32),
        jnp.full((h, w), _BIG),
        jnp.full((h, w), _BIG),
        jnp.full((h, w), _BIG),
    )
    (bestL, best2L, argL, bestR, argR, cm1, cp1, _), _ = jax.lax.scan(body, init, disps)

    valid = bestL < _BIG / 2
    # texture: flat windows are unreliable (reference threshold 507 on 8-bit sums)
    valid &= texture >= cfg.texture_threshold
    # uniqueness (disabled when ratio = 0, as in the reference)
    if cfg.uniqueness_ratio > 0:
        valid &= best2L * 100 >= bestL * (100 + cfg.uniqueness_ratio)
    # left-right consistency: |dL(x) - dR(x - dL(x))| <= disp12_max_diff
    if cfg.disp12_max_diff >= 0:
        xr = jnp.clip(xs - argL, 0, w - 1)
        dR_at = jnp.take_along_axis(argR, xr, axis=1)
        valid &= jnp.abs(argL - dR_at) <= cfg.disp12_max_diff

    disp = argL.astype(jnp.float32)
    if cfg.subpixel:
        # quadratic interpolation of the SAD minimum (OpenCV StereoBM always
        # refines; its DISP_SCALE=16 fixed point is float here): the vertex
        # of the parabola through (d-1, cm1), (d, best), (d+1, cp1)
        nb_ok = (cm1 < _BIG / 2) & (cp1 < _BIG / 2)
        denom = cm1 - 2.0 * bestL + cp1
        off = jnp.where(
            nb_ok & (denom > 1e-9), 0.5 * (cm1 - cp1) / jnp.maximum(denom, 1e-9), 0.0
        )
        disp = disp + jnp.clip(off, -0.5, 0.5)
    return disp, valid


def stereo_bm_filtered(left, right, cfg: StereoBMConfig = StereoBMConfig()):
    """stereo_bm + the speckle post-filter (cv::filterSpeckles equivalent,
    enabled when cfg.speckle_window_size > 0, matching OpenCV semantics —
    the reference's configuration sets it to 0, DisparityUtil.cpp:35).

    The speckle filter is a host-side connected-component pass
    (csrc/ccl.cpp via tpusfm.native); returns numpy (disp, valid)."""
    import numpy as np

    from tpusfm.native import filter_speckles

    disp, valid = stereo_bm(left, right, cfg)
    disp = np.asarray(disp)
    valid = np.asarray(valid)
    if cfg.speckle_window_size > 0:
        disp, valid = filter_speckles(
            disp, valid, float(cfg.speckle_range), int(cfg.speckle_window_size)
        )
    return disp, valid


def normalize_disparity(disp, valid):
    """8-bit display normalization with the reference's 0->255 swap
    (DisparityUtil.cpp:39-48)."""
    d = jnp.where(valid, disp, 0.0)
    lo = jnp.min(jnp.where(valid, disp, jnp.inf))
    hi = jnp.max(jnp.where(valid, disp, -jnp.inf))
    scale = 255.0 / jnp.maximum(hi - lo, 1e-6)
    out = jnp.clip((d - lo) * scale, 0, 255)
    out = jnp.where(out == 0, 255.0, out)
    return out / 255.0
