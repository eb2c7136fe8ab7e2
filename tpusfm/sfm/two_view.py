"""Two-view Structure-from-Motion — the reference pipeline's spine.

TPU-native equivalent of structureFromMotion
(/root/reference/SfM-GMS/SfM-GMS/SfMUtil.cpp:4-83): match (BF/GMS/LOGOS
dispatch, SfMUtil.cpp:12-22) -> coordinate gather (:26-35) -> essential
RANSAC (:39) -> recoverPose (:45) -> canonical P1=[I|0], P2=[R|t] (:53-59)
-> inlier filter (:69-74) -> undistort to normalized coords (:78-79) ->
linear triangulation (:82). Here the whole chain after feature extraction is
one jitted program with static shapes.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from tpusfm.config import PipelineConfig
from tpusfm.geometry.epipolar import find_essential_ransac
from tpusfm.geometry.pose import recover_pose
from tpusfm.geometry.triangulate import triangulate_pair
from tpusfm.geometry.undistort import undistort_points
from tpusfm.match.bf import bf_match
from tpusfm.match.gms import gms_filter
from tpusfm.match.logos import logos_match
from tpusfm.types import CameraIntrinsics, Features, Matches


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class TwoViewResult:
    """Pose, sparse points, and per-stage metrics for one image pair."""

    R: Any
    t: Any
    E: Any
    points3d: Any        # (M, 3), masked
    point_mask: Any      # (M,)
    matches: Matches
    n_matches: Any
    n_inliers: Any
    n_points: Any

    def tree_flatten(self):
        f = dataclasses.fields(self)
        return [getattr(self, x.name) for x in f], None

    @classmethod
    def tree_unflatten(cls, _, children):
        return cls(*children)


def match_features(
    feat1: Features,
    feat2: Features,
    algo: str,
    size1: tuple[int, int],
    size2: tuple[int, int],
    cfg: PipelineConfig = PipelineConfig(),
) -> Matches:
    """Algorithm dispatch mirroring SfMUtil.cpp:12-22. algo in
    {"bf", "gms", "logos"}; sizes are (width, height)."""
    if algo == "bf":
        return bf_match(feat1.desc, feat2.desc, feat1.kpts.mask, feat2.kpts.mask, cfg.match)
    if algo == "gms":
        # GMS consumes un-cross-checked, unpruned NN matches
        # (FeatureMatchUtil.cpp:66-69)
        raw = bf_match(
            feat1.desc, feat2.desc, feat1.kpts.mask, feat2.kpts.mask,
            dataclasses.replace(cfg.match, cross_check=False),
            prune=False, capacity=feat1.capacity,
        )
        return gms_filter(feat1.kpts, feat2.kpts, raw, size1, size2, cfg.gms)
    if algo == "logos":
        return logos_match(feat1, feat2, cfg.logos)
    raise ValueError(f"unknown algo {algo!r}")


@functools.partial(jax.jit, static_argnames=("cfg",))
def _geometry_chain(
    matches: Matches,
    feat1: Features,
    feat2: Features,
    intr: CameraIntrinsics,
    cfg: PipelineConfig,
) -> TwoViewResult:
    p1, p2 = matches.gather_xy(feat1.kpts, feat2.kpts)
    x1n = undistort_points(p1, intr.K, intr.dist)
    x2n = undistort_points(p2, intr.K, intr.dist)
    focal = (intr.K[0, 0] + intr.K[1, 1]) * 0.5

    E, inl, n_inl = find_essential_ransac(x1n, x2n, matches.mask, focal, cfg.ransac)
    R, t, cheir = recover_pose(E, x1n, x2n, inl)

    X = triangulate_pair(R, t, x1n, x2n)
    pmask = cheir
    X = jnp.where(pmask[:, None], X, 0.0)
    return TwoViewResult(
        R=R, t=t, E=E,
        points3d=X, point_mask=pmask, matches=matches,
        n_matches=matches.count, n_inliers=n_inl,
        n_points=jnp.sum(pmask.astype(jnp.int32)),
    )


def two_view_sfm(
    feat1: Features,
    feat2: Features,
    intr: CameraIntrinsics,
    algo: str = "gms",
    size1: tuple[int, int] = (0, 0),
    size2: tuple[int, int] = (0, 0),
    cfg: PipelineConfig = PipelineConfig(),
) -> TwoViewResult:
    """Full two-view SfM from extracted features (structureFromMotion
    equivalent). Feature extraction is separate so it can be batched/sharded
    independently (tpusfm.dist)."""
    matches = match_features(feat1, feat2, algo, size1, size2, cfg)
    return _geometry_chain(matches, feat1, feat2, intr, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def two_view_batch(
    feats1: Features,
    feats2: Features,
    intr: CameraIntrinsics,
    cfg: PipelineConfig = PipelineConfig(),
) -> TwoViewResult:
    """BF match + geometry for a BATCH of pairs in one program.

    feats1/feats2 carry a leading batch axis (from batched
    sift_detect_and_compute). The reference processes pairs serially
    (/root/reference/SfM-GMS/SfM-GMS/DisparityUtil.cpp:444-460); on TPU a
    vmapped batch turns the pipeline's many small latency-bound ops (RANSAC
    solves, refinement gathers) into wide ones, which is where the
    throughput comes from."""

    def one(f1: Features, f2: Features) -> TwoViewResult:
        m = bf_match.__wrapped__(
            f1.desc, f2.desc, f1.kpts.mask, f2.kpts.mask,
            cfg.match, "l2", True, None,
        )
        return _geometry_chain.__wrapped__(m, f1, f2, intr, cfg)

    return jax.vmap(one)(feats1, feats2)
