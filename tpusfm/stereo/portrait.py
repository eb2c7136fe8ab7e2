"""Synthetic-bokeh "portrait mode" from dense stereo.

Replicates createPortraitMode
(/root/reference/SfM-GMS/SfM-GMS/DisparityUtil.cpp:274-428): dense GMS
disparity -> threshold 60 -> dilate x2 -> keep the 5 largest connected
regions as foreground -> median-blur(15) the whole image -> paste the sharp
foreground back. Device work (disparity, threshold, dilation, median) in
JAX; component selection on the native C++ union-find (tpusfm.native).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tpusfm.config import PipelineConfig
from tpusfm.native import connected_components
from tpusfm.stereo.disparity import dense_features, match_disparity_image
from tpusfm.stereo.filters import dilate, median_blur
from tpusfm.match.gms import gms_filter
import dataclasses


def foreground_mask_from_disparity(disp, valid, threshold: float = 60.0,
                                   dilate_iters: int = 2, keep: int = 5):
    """Threshold + dilate + keep the `keep` largest components."""
    m = np.asarray((jnp.asarray(disp) > threshold) & jnp.asarray(valid))
    m = np.asarray(dilate(m, dilate_iters))
    labels, n, areas = connected_components(m, 8)
    if n == 0:
        return np.zeros_like(m)
    order = np.argsort(areas)[::-1][:keep]
    keep_ids = np.zeros(n + 1, bool)
    keep_ids[order + 1] = True
    return keep_ids[labels]


def create_portrait_mode(left_rgb, right_rgb, cfg: PipelineConfig = PipelineConfig(),
                         threshold: float = 60.0, blur_radius: int = 7):
    """Full portrait pipeline. left_rgb/right_rgb: (H, W, 3) float [0,1].

    Returns (portrait (H, W, 3), fg_mask (H, W) bool, disp (H, W))."""
    from tpusfm.io.image import to_gray

    g1 = to_gray(left_rgb)
    g2 = to_gray(right_rgb)
    h, w = g1.shape
    f1 = dense_features(g1)
    f2 = dense_features(g2)
    mcfg = dataclasses.replace(cfg.match, cross_check=False)
    # dense-scale matching: query-chunked programs over the bf16 big-tile
    # kernel (tpusfm.stereo.disparity.dense_raw_match) so the full-frame
    # robot pair (2594x1131, ~2.9M descriptors) streams through the MXU in
    # bounded dispatches — the reference matches these descriptors with
    # approximate FLANN (DisparityUtil.cpp:286-300)
    from tpusfm.stereo.disparity import dense_raw_match

    raw = dense_raw_match(f1, f2, "l2", mcfg)
    matches = gms_filter(f1.kpts, f2.kpts, raw, (w, h), (w, h), cfg.gms)
    disp, valid = match_disparity_image(f1.kpts, f2.kpts, matches, h, w)

    fg = foreground_mask_from_disparity(disp, valid, threshold)
    blurred = median_blur(jnp.asarray(left_rgb), blur_radius)
    out = jnp.where(jnp.asarray(fg)[..., None], jnp.asarray(left_rgb), blurred)
    return np.asarray(out), fg, np.asarray(disp)
