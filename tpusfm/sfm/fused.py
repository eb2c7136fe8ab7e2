"""Fused single-program pipelines.

The tunneled TPU backend used for benchmarking has ~30 ms fixed cost per
dispatched program, so the production configuration fuses the whole
two-view pipeline — SIFT on both images, matching, essential RANSAC, pose,
triangulation — into ONE XLA program. Compile time is large but paid once
into the persistent compilation cache (JAX_COMPILATION_CACHE_DIR); steady
state is then a single dispatch per image pair.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpusfm.config import PipelineConfig, SiftConfig
from tpusfm.features import scalespace as ss
from tpusfm.features.sift import (
    _BORDER,
    _merge_octaves,
    _octave_detect_impl,
    _prepare_base,
)
from tpusfm.geometry.epipolar import find_essential_ransac
from tpusfm.geometry.pose import recover_pose
from tpusfm.geometry.triangulate import triangulate_pair
from tpusfm.geometry.undistort import undistort_points
from tpusfm.match.bf import bf_match
from tpusfm.sfm.two_view import TwoViewResult
from tpusfm.types import Features


def _sift_inline(img, cfg: SiftConfig) -> Features:
    """SIFT as inline trace (no inner jit boundaries) for fusion."""
    base = _prepare_base.__wrapped__(img, cfg)
    base_scale = 0.5 if cfg.upsample else 1.0
    n_oct = ss.num_octaves(base.shape[0], base.shape[1], cfg.max_octaves)
    outs = []
    cur = base
    for o in range(n_oct):
        if min(cur.shape) < 4 * _BORDER:
            break
        k_oct = max(32, cfg.max_features >> o)
        out, cur = _octave_detect_impl(cur, base_scale * (2.0 ** o), k_oct, cfg)
        outs.append(out)
    return _merge_octaves.__wrapped__(outs, cfg.max_features)


@functools.partial(jax.jit, static_argnames=("size1", "size2", "cfg"))
def fused_two_view(img1, img2, K, dist, size1, size2, cfg: PipelineConfig) -> TwoViewResult:
    """The full reference pipeline (structureFromMotion, SfMUtil.cpp:4-83)
    as one XLA program: detect both -> BF match -> essential RANSAC ->
    recoverPose -> triangulate."""
    f1 = _sift_inline(img1, cfg.sift)
    f2 = _sift_inline(img2, cfg.sift)
    m = bf_match.__wrapped__(
        f1.desc, f2.desc, f1.kpts.mask, f2.kpts.mask, cfg.match, "l2", True, None
    )
    p1, p2 = m.gather_xy(f1.kpts, f2.kpts)
    x1n = undistort_points(p1, K, dist)
    x2n = undistort_points(p2, K, dist)
    focal = (K[0, 0] + K[1, 1]) * 0.5
    E, inl, n_inl = find_essential_ransac.__wrapped__(x1n, x2n, m.mask, focal, cfg.ransac)
    R, t, cheir = recover_pose(E, x1n, x2n, inl)
    X = triangulate_pair(R, t, x1n, x2n)
    return TwoViewResult(
        R=R, t=t, E=E,
        points3d=jnp.where(cheir[:, None], X, 0.0), point_mask=cheir,
        matches=m, n_matches=m.count, n_inliers=n_inl,
        n_points=jnp.sum(cheir.astype(jnp.int32)),
    )
