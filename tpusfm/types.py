"""Core padded-tensor containers.

TPU/XLA requires static shapes, so every variable-length quantity (keypoints,
matches, tracks) is carried as a fixed-capacity tensor plus a validity mask.
Invalid rows are zero-filled; consumers must respect ``mask``.

These mirror the reference's dynamic containers (``vector<KeyPoint>``,
``vector<DMatch>`` — /root/reference/SfM-GMS/SfM-GMS/FeatureMatchUtil.h:23-29)
re-designed as JAX pytrees.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return [getattr(obj, n) for n in fields], None

    def unflatten(_, children):
        return cls(*children)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_pytree_dataclass
class Keypoints:
    """Fixed-capacity keypoint set for one image.

    xy:       (K, 2) float32 — pixel coordinates (x, y), origin top-left.
    scale:    (K,)   float32 — absolute scale (sigma) of the keypoint.
    angle:    (K,)   float32 — orientation in radians, [0, 2pi).
    response: (K,)   float32 — detector response (|DoG| contrast, Harris, ...).
    mask:     (K,)   bool    — validity.
    """

    xy: Any
    scale: Any
    angle: Any
    response: Any
    mask: Any

    @property
    def capacity(self) -> int:
        return self.xy.shape[-2]

    @property
    def count(self):
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)

    @staticmethod
    def zeros(capacity: int) -> "Keypoints":
        return Keypoints(
            xy=jnp.zeros((capacity, 2), jnp.float32),
            scale=jnp.zeros((capacity,), jnp.float32),
            angle=jnp.zeros((capacity,), jnp.float32),
            response=jnp.zeros((capacity,), jnp.float32),
            mask=jnp.zeros((capacity,), bool),
        )


@_pytree_dataclass
class Features:
    """Keypoints plus their descriptors.

    desc: (K, D) float32 (SIFT: D=128) or (K, W) uint32 packed bits (ORB: W=8).
    """

    kpts: Keypoints
    desc: Any

    @property
    def capacity(self) -> int:
        return self.desc.shape[-2]


@_pytree_dataclass
class Matches:
    """Fixed-capacity match set between two images.

    idx1, idx2: (M,) int32 — indices into the two Keypoints sets.
    distance:   (M,) float32 — descriptor distance.
    mask:       (M,) bool.
    """

    idx1: Any
    idx2: Any
    distance: Any
    mask: Any

    @property
    def capacity(self) -> int:
        return self.idx1.shape[-1]

    @property
    def count(self):
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)

    def gather_xy(self, kpts1: Keypoints, kpts2: Keypoints):
        """Matched pixel coordinates ((M,2), (M,2)), zeroed where invalid.

        Mirrors the coordinate-gather stage of the reference SfM driver
        (/root/reference/SfM-GMS/SfM-GMS/SfMUtil.cpp:26-35).
        """
        p1 = jnp.take(kpts1.xy, jnp.clip(self.idx1, 0, kpts1.capacity - 1), axis=0)
        p2 = jnp.take(kpts2.xy, jnp.clip(self.idx2, 0, kpts2.capacity - 1), axis=0)
        m = self.mask[:, None]
        return jnp.where(m, p1, 0.0), jnp.where(m, p2, 0.0)


@_pytree_dataclass
class CameraIntrinsics:
    """Pinhole intrinsics + radial/tangential distortion.

    K:    (3, 3) float32 camera matrix.
    dist: (5,)   float32 — (k1, k2, p1, p2, k3), OpenCV ordering.
    """

    K: Any
    dist: Any

    @staticmethod
    def ideal(fx: float, fy: float, cx: float, cy: float) -> "CameraIntrinsics":
        K = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], jnp.float32)
        return CameraIntrinsics(K=K, dist=jnp.zeros((5,), jnp.float32))


@_pytree_dataclass
class Pose:
    """Rigid transform world->camera: x_cam = R @ x_world + t."""

    R: Any  # (3, 3)
    t: Any  # (3,)

    @staticmethod
    def identity() -> "Pose":
        return Pose(R=jnp.eye(3, dtype=jnp.float32), t=jnp.zeros((3,), jnp.float32))

    def compose(self, other: "Pose") -> "Pose":
        """self ∘ other: apply ``other`` first."""
        return Pose(R=self.R @ other.R, t=self.R @ other.t + self.t)

    def inverse(self) -> "Pose":
        Rt = self.R.T
        return Pose(R=Rt, t=-(Rt @ self.t))


@_pytree_dataclass
class Reconstruction:
    """Multi-view reconstruction state (checkpointable pytree).

    poses:   Pose with leading view axis (V, ...).
    points:  (P, 3) float32 world points.
    point_mask: (P,) bool.
    view_mask:  (V,) bool — which views are registered.
    """

    poses: Pose
    points: Any
    point_mask: Any
    view_mask: Any


def top_k_select(values, k: int, mask=None, largest: bool = True):
    """Indices of the top-k entries of ``values`` respecting ``mask``.

    Returns (idx, valid): idx (k,) int32, valid (k,) bool. Invalid/masked
    entries never win; if fewer than k valid entries exist the tail is flagged
    invalid.
    """
    v = jnp.asarray(values, jnp.float32)
    if not largest:
        v = -v
    if mask is not None:
        v = jnp.where(mask, v, -jnp.inf)
    _, top_i = jax.lax.top_k(v, k)
    valid = jnp.take(mask, top_i) if mask is not None else jnp.ones((k,), bool)
    return top_i.astype(jnp.int32), valid
