"""Two-view SfM over a pipeline-parallel device mesh.

Stages the reference's serial chain (SfMUtil.cpp:4-83) across devices with
micro-batched image pairs via tpusfm.dist.pipeline. Stage split:

  S=2:  [detect both images] -> [match + essential RANSAC + pose + triangulate]
  S=4:  [detect img1] -> [detect img2 (carries img2 through)] ->
        [match] -> [geometry]

Every stage's outputs are fixed-capacity pytrees, so the rotating edge
buffers are static. Equivalence vs the serial path is exact (same jitted
math, tested on the CPU mesh).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpusfm.config import PipelineConfig
from tpusfm.dist.pipeline import pipeline_map
from tpusfm.geometry.epipolar import find_essential_ransac
from tpusfm.geometry.pose import recover_pose
from tpusfm.geometry.triangulate import triangulate_pair
from tpusfm.geometry.undistort import undistort_points
from tpusfm.match.bf import bf_match
from tpusfm.sfm.fused import _sift_inline
from tpusfm.sfm.two_view import TwoViewResult


def _geometry(m, f1, f2, intr, cfg: PipelineConfig) -> TwoViewResult:
    p1, p2 = m.gather_xy(f1.kpts, f2.kpts)
    x1n = undistort_points(p1, intr.K, intr.dist)
    x2n = undistort_points(p2, intr.K, intr.dist)
    focal = (intr.K[0, 0] + intr.K[1, 1]) * 0.5
    E, inl, n_inl = find_essential_ransac.__wrapped__(x1n, x2n, m.mask, focal, cfg.ransac)
    R, t, cheir = recover_pose(E, x1n, x2n, inl)
    X = triangulate_pair(R, t, x1n, x2n)
    return TwoViewResult(
        R=R, t=t, E=E,
        points3d=jnp.where(cheir[:, None], X, 0.0), point_mask=cheir,
        matches=m, n_matches=m.count, n_inliers=n_inl,
        n_points=jnp.sum(cheir.astype(jnp.int32)),
    )


def _match(f1, f2, cfg: PipelineConfig):
    return bf_match.__wrapped__(
        f1.desc, f2.desc, f1.kpts.mask, f2.kpts.mask, cfg.match, "l2", True, None
    )


def two_view_stages(intr, cfg: PipelineConfig, n_stages: int = 2):
    """Stage functions for pipeline_map. Input micro-batch: (2, H, W) pair."""
    if n_stages == 2:
        def detect(pair):
            return _sift_inline(pair[0], cfg.sift), _sift_inline(pair[1], cfg.sift)

        def geometry(feats):
            f1, f2 = feats
            return _geometry(_match(f1, f2, cfg), f1, f2, intr, cfg)

        return [detect, geometry]

    if n_stages == 4:
        def detect1(pair):
            return _sift_inline(pair[0], cfg.sift), pair[1]

        def detect2(x):
            f1, img2 = x
            return f1, _sift_inline(img2, cfg.sift)

        def match(feats):
            f1, f2 = feats
            return _match(f1, f2, cfg), f1, f2

        def geometry(x):
            m, f1, f2 = x
            return _geometry(m, f1, f2, intr, cfg)

        return [detect1, detect2, match, geometry]

    raise ValueError(f"unsupported n_stages {n_stages}")


def two_view_pipelined(pairs, intr, mesh, cfg: PipelineConfig = PipelineConfig(),
                       axis: str = "d") -> TwoViewResult:
    """Micro-batched pipeline-parallel two-view SfM.

    pairs: (M, 2, H, W) image pairs. mesh size selects the stage split
    (2 or 4 devices). Returns TwoViewResult with leading axis M."""
    stages = two_view_stages(intr, cfg, mesh.devices.size)
    return pipeline_map(stages, pairs, mesh, axis=axis)
