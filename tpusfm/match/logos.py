"""LOGOS — Local Geometric Support spatial verification (Lowry & Andreasson '18).

TPU-native re-design of cv::xfeatures2d::matchLOGOS
(/root/reference/SfM-GMS/SfM-GMS/FeatureMatchUtil.cpp:100-116): candidate
matches are keypoint pairs assigned to the same BoW visual word; each
candidate is verified by *local geometric support* — spatial nearest-neighbor
keypoints around each endpoint must themselves correspond (same word) with a
consistent relative geometry (position normalized by the keypoint's scale and
orientation).

Memory discipline (VERDICT r3 #7): nothing materializes an (N1, N2) or
(N, N) matrix. Spatial KNN runs in row blocks; support counting + the
mutual-best reduction stream over column blocks with lax.map, carrying only
(N1,) running bests and per-block column bests — the pipeline holds at the
reference's own nfeatures=10000 cap
(/root/reference/SfM-GMS/SfM-GMS/FeatureMatchUtil.cpp:10) and beyond.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpusfm.config import LogosConfig
from tpusfm.match.kmeans import kmeans, assign_words
from tpusfm.types import Keypoints, Matches

_BIG = jnp.float32(1e30)


def _spatial_knn(kpts: Keypoints, k: int, row_block: int = 1024):
    """k nearest (valid) neighbors per keypoint by image distance.

    Blocked over query rows: peak memory is (row_block, N), never (N, N).
    Returns idx (N, k) i32 and valid (N, k) bool. Self excluded.
    """
    xy = kpts.xy
    n = xy.shape[0]
    rb = min(row_block, n)
    nb = -(-n // rb)
    pad = nb * rb - n
    xq = jnp.pad(xy, ((0, pad), (0, 0)))
    iq = jnp.arange(nb * rb, dtype=jnp.int32)
    col_ok = kpts.mask[None, :]

    def blk(args):
        xb, ib = args                                      # (rb, 2), (rb,)
        d2 = jnp.sum((xb[:, None, :] - xy[None, :, :]) ** 2, axis=-1)
        d2 = jnp.where(col_ok, d2, _BIG)
        d2 = jnp.where(ib[:, None] == jnp.arange(n, dtype=jnp.int32)[None, :],
                       _BIG, d2)
        neg, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32), (-neg) < _BIG / 2

    idx, valid = jax.lax.map(blk, (xq.reshape(nb, rb, 2), iq.reshape(nb, rb)))
    idx = idx.reshape(nb * rb, k)[:n]
    valid = valid.reshape(nb * rb, k)[:n] & kpts.mask[:, None]
    return idx, valid


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
    w1n = jnp.where(nv1, jnp.take(words1, nbr1), -1)    # (N1, K)
    w2n = jnp.where(nv2, jnp.take(words2, nbr2), -2)    # (N2, K)

    tau2 = jnp.float32(cfg.scale_ratio_threshold**2)
    block = min(512, n2)
    nblocks = (n2 + block - 1) // block
    pads = nblocks * block - n2
    w2p = jnp.pad(w2n, ((0, pads), (0, 0)), constant_values=-2)
    v2p = jnp.pad(v2, ((0, pads), (0, 0), (0, 0)), constant_values=1e6)
    words2p = jnp.pad(words2, (0, pads), constant_values=-2)
    scale2p = jnp.pad(kpts2.scale, (0, pads))
    mask2p = jnp.pad(kpts2.mask, (0, pads))

    s1 = jnp.maximum(kpts1.scale, 1e-6)
    inv_ratio = jnp.float32(1.0 / cfg.scale_ratio_threshold)

    def block_score(w2b, v2b, wb, sb, mb):
        """Masked support score for one column block: (N1, B)."""
        # Accumulate over the K x K neighbor pairs one term at a time: a
        # one-shot (N1, B, K, K) broadcast costs K^2 = 25x the block memory;
        # the scan keeps every intermediate at (N1, B).
        def pair_term(acc, kl):
            kk, ll = kl[0], kl[1]
            w1k = jax.lax.dynamic_index_in_dim(w1n, kk, 1, False)   # (N1,)
            w2l = jax.lax.dynamic_index_in_dim(w2b, ll, 1, False)   # (B,)
            v1k = jax.lax.dynamic_index_in_dim(v1, kk, 1, False)    # (N1, 2)
            v2l = jax.lax.dynamic_index_in_dim(v2b, ll, 1, False)   # (B, 2)
            same_w = w1k[:, None] == w2l[None, :]
            dvx = v1k[:, None, 0] - v2l[None, :, 0]
            dvy = v1k[:, None, 1] - v2l[None, :, 1]
            close = dvx * dvx + dvy * dvy < tau2
            return acc + (same_w & close).astype(jnp.int32), None

        kl = jnp.stack(jnp.meshgrid(jnp.arange(k), jnp.arange(k)),
                       -1).reshape(-1, 2)
        acc0 = jnp.zeros((n1, w2b.shape[0]), jnp.int32)
        support, _ = jax.lax.scan(pair_term, acc0, kl)

        cand = (words1[:, None] == wb[None, :]) & kpts1.mask[:, None] & mb[None, :]
        sr = s1[:, None] / jnp.maximum(sb[None, :], 1e-6)
        scale_ok = (sr < cfg.scale_ratio_threshold) & (sr > inv_ratio)
        return jnp.where(cand & scale_ok, support, -1)

    args = (w2p.reshape(nblocks, block, k),
            v2p.reshape(nblocks, block, k, 2),
            words2p.reshape(nblocks, block),
            scale2p.reshape(nblocks, block),
            mask2p.reshape(nblocks, block))

    # pass 1: row-wise best over all column blocks (streamed running max;
    # strictly-greater updates preserve argmax's first-max-wins tie rule)
    def row_pass(carry, a):
        best_s, best_j, j0 = carry
        sc = block_score(*a)
        bs = jnp.max(sc, axis=1)
        bj = jnp.argmax(sc, axis=1).astype(jnp.int32) + j0
        upd = bs > best_s
        return (jnp.where(upd, bs, best_s), jnp.where(upd, bj, best_j),
                j0 + block), None

    (best_s, best_j, _), _ = jax.lax.scan(
        row_pass,
        (jnp.full((n1,), -2, jnp.int32), jnp.zeros((n1,), jnp.int32),
         jnp.int32(0)),
        args)
    accept = best_s >= cfg.min_support

    # pass 2: column-wise best among accepted rows (the mutual check)
    def col_pass(_, a):
        sc = jnp.where(accept[:, None], block_score(*a), -1)
        return None, jnp.argmax(sc, axis=0).astype(jnp.int32)

    _, best_i_cols = jax.lax.scan(col_pass, None, args)
    best_i_for_j = best_i_cols.reshape(-1)[:n2]

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
