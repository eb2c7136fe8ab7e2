"""LOGOS — Local Geometric Support spatial verification (Lowry & Andreasson '18).

TPU-native re-design of cv::xfeatures2d::matchLOGOS
(/root/reference/SfM-GMS/SfM-GMS/FeatureMatchUtil.cpp:100-116): candidate
matches are keypoint pairs assigned to the same BoW visual word; each
candidate is verified by *local geometric support* — spatial nearest-neighbor
keypoints around each endpoint must themselves correspond (same word) with a
consistent relative geometry (position normalized by the keypoint's scale and
orientation).

Everything is fixed-capacity tensor math: spatial KNN via a distance matrix
top-k, word agreement via an equality matrix, support counting via a blocked
(N1, N2, K, K) contraction.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpusfm.config import LogosConfig
from tpusfm.match.kmeans import kmeans, assign_words
from tpusfm.types import Keypoints, Matches


def _spatial_knn(kpts: Keypoints, k: int):
    """k nearest (valid) neighbors per keypoint by image distance.

    Returns idx (N, k) i32 and valid (N, k) bool. Self excluded.
    """
    xy = kpts.xy
    n = xy.shape[0]
    d2 = jnp.sum((xy[:, None, :] - xy[None, :, :]) ** 2, axis=-1)
    big = jnp.float32(1e30)
    d2 = jnp.where(kpts.mask[None, :], d2, big)
    d2 = d2 + jnp.eye(n) * big  # exclude self
    neg, idx = jax.lax.top_k(-d2, k)
    valid = (-neg) < big / 2
    valid = valid & kpts.mask[:, None]
    return idx.astype(jnp.int32), valid


def _neighbor_geometry(kpts: Keypoints, nbr_idx, nbr_valid):
    """Relative neighbor vectors in the keypoint's local frame.

    v = R(-angle) @ (xy_nbr - xy) / scale  -> (N, K, 2); invalid -> large.
    """
    xy = kpts.xy
    rel = jnp.take(xy, nbr_idx, axis=0) - xy[:, None, :]
    c = jnp.cos(-kpts.angle)[:, None]
    s = jnp.sin(-kpts.angle)[:, None]
    vx = rel[..., 0] * c - rel[..., 1] * s
    vy = rel[..., 0] * s + rel[..., 1] * c
    scale = jnp.maximum(kpts.scale, 1e-6)[:, None]
    v = jnp.stack([vx / scale, vy / scale], axis=-1)
    return jnp.where(nbr_valid[..., None], v, 1e6)


@functools.partial(jax.jit, static_argnames=("cfg",))
def logos_verify(
    kpts1: Keypoints,
    kpts2: Keypoints,
    words1,
    words2,
    cfg: LogosConfig = LogosConfig(),
) -> Matches:
    """Verified matches given per-keypoint visual-word assignments.

    Mirrors the matchLOGOS contract: inputs are two keypoint sets plus
    nearest-word ids (nn1/nn2 in the reference); output is a match set.
    """
    n1 = kpts1.capacity
    n2 = kpts2.capacity
    k = cfg.knn

    nbr1, nv1 = _spatial_knn(kpts1, k)
    nbr2, nv2 = _spatial_knn(kpts2, k)
    v1 = _neighbor_geometry(kpts1, nbr1, nv1)    # (N1, K, 2)
    v2 = _neighbor_geometry(kpts2, nbr2, nv2)    # (N2, K, 2)
    w1n = jnp.take(words1, nbr1)                  # (N1, K)
    w2n = jnp.take(words2, nbr2)                  # (N2, K)
    w1n = jnp.where(nv1, w1n, -1)
    w2n = jnp.where(nv2, w2n, -2)

    # Support(i, j) = #{(k, l): words agree and local vectors agree}.
    # Blocked over j to bound memory.
    tau2 = jnp.float32(cfg.scale_ratio_threshold**2)

    def support_block(j0, block):
        # Accumulate over the K x K neighbor pairs one term at a time: the
        # one-shot (N1, B, K, K, 2) broadcast costs K^2 * 2 = 128x the block
        # memory (hundreds of MB at sparse scale, hopeless at dense scale);
        # the unrolled accumulation keeps every intermediate at (N1, B).
        w2b = jax.lax.dynamic_slice_in_dim(w2n, j0, block, 0)     # (B, K)
        v2b = jax.lax.dynamic_slice_in_dim(v2, j0, block, 0)      # (B, K, 2)
        acc = jnp.zeros((w1n.shape[0], block), jnp.int32)
        for kk in range(k):
            for ll in range(k):
                same_w = w1n[:, None, kk] == w2b[None, :, ll]
                dvx = v1[:, None, kk, 0] - v2b[None, :, ll, 0]
                dvy = v1[:, None, kk, 1] - v2b[None, :, ll, 1]
                close = dvx * dvx + dvy * dvy < tau2
                acc = acc + (same_w & close).astype(jnp.int32)
        return acc

    block = min(512, n2)
    nblocks = (n2 + block - 1) // block
    pads = nblocks * block - n2
    if pads:
        w2n = jnp.pad(w2n, ((0, pads), (0, 0)), constant_values=-2)
        v2 = jnp.pad(v2, ((0, pads), (0, 0), (0, 0)), constant_values=1e6)

    supports = []
    for b in range(nblocks):
        supports.append(support_block(b * block, block))
    support = jnp.concatenate(supports, axis=1)[:, :n2]           # (N1, N2)

    cand = (words1[:, None] == words2[None, :]) & kpts1.mask[:, None] & kpts2.mask[None, :]
    # Scale-consistency of the endpoints themselves.
    sr = kpts1.scale[:, None] / jnp.maximum(kpts2.scale[None, :], 1e-6)
    scale_ok = (sr < cfg.scale_ratio_threshold) & (sr > 1.0 / cfg.scale_ratio_threshold)
    score = jnp.where(cand & scale_ok, support, -1)

    best_j = jnp.argmax(score, axis=1).astype(jnp.int32)
    best_s = jnp.max(score, axis=1)
    accept = best_s >= cfg.min_support

    # One-to-one: keep (i, best_j[i]) only if i is also the best for that j.
    best_i_for_j = jnp.argmax(jnp.where(accept[:, None], score, -1), axis=0).astype(jnp.int32)
    mutual = jnp.take(best_i_for_j, best_j) == jnp.arange(n1, dtype=jnp.int32)
    accept = accept & mutual

    return Matches(
        idx1=jnp.where(accept, jnp.arange(n1, dtype=jnp.int32), 0),
        idx2=jnp.where(accept, best_j, 0),
        distance=jnp.where(accept, -best_s.astype(jnp.float32), 0.0),
        mask=accept,
    )


def logos_match(feat1, feat2, cfg: LogosConfig = LogosConfig()) -> Matches:
    """Full LOGOS pipeline: BoW vocabulary from image-1 descriptors (the
    reference clusters desc1 only, FeatureMatchUtil.cpp:101-102), word
    assignment for both images, then geometric verification."""
    centers, _ = kmeans(feat1.desc, feat1.kpts.mask, cfg.num_words, cfg.kmeans_iters)
    words1 = assign_words(feat1.desc, centers)
    words2 = assign_words(feat2.desc, centers)
    words1 = jnp.where(feat1.kpts.mask, words1, -1)
    words2 = jnp.where(feat2.kpts.mask, words2, -2)
    return logos_verify(feat1.kpts, feat2.kpts, words1, words2, cfg)
