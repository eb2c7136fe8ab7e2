"""Brute-force descriptor matching with the reference's prune rules.

Replicates bruteForceMatch (/root/reference/SfM-GMS/SfM-GMS/FeatureMatchUtil.cpp:20-31):
  1. mutual-nearest (cross-check) L2 matching,
  2. sort ascending by distance; pop from the back while
     min_distance * kDistanceCoef < max_distance  (kDistanceCoef = 4.0)
     -> equivalently keep matches with distance <= 4 * min_distance,
  3. cap at kMaxMatchingSize (500) smallest.
and the plain (no cross-check) variant used by the GMS path
(FeatureMatchUtil.cpp:66-68).

All sets are fixed-capacity (`MatchConfig.max_matches`) with masks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpusfm.config import MatchConfig
from tpusfm.kernels.distance import nn_search, BIG
from tpusfm.types import Matches


@functools.partial(jax.jit, static_argnames=("cfg", "metric", "prune",
                                              "capacity", "tile_q", "tile_db"))
def bf_match(
    desc1,
    desc2,
    mask1=None,
    mask2=None,
    cfg: MatchConfig = MatchConfig(),
    metric: str = "l2",
    prune: bool = True,
    capacity: int | None = None,
    tile_q: int | None = None,
    tile_db: int | None = None,
) -> Matches:
    """Match desc1 -> desc2. Returns a Matches of fixed capacity.

    capacity defaults to cfg.max_matches when pruning, else desc1 capacity.
    tile_q/tile_db tune the streaming kernel for dense-scale inputs
    (see tpusfm.kernels.distance.nn_search).
    """
    n1 = desc1.shape[0]
    if mask1 is None:
        mask1 = jnp.ones((n1,), bool)
    if mask2 is None:
        mask2 = jnp.ones((desc2.shape[0],), bool)

    idx12, d12, _ = nn_search(desc1, desc2, mask2, metric=metric,
                              tile_q=tile_q, tile_db=tile_db)
    valid = mask1 & (d12 < BIG / 2)

    if cfg.cross_check:
        idx21, _, _ = nn_search(desc2, desc1, mask1, metric=metric,
                                tile_q=tile_q, tile_db=tile_db)
        back = jnp.take(idx21, jnp.clip(idx12, 0, desc2.shape[0] - 1))
        valid = valid & (back == jnp.arange(n1, dtype=jnp.int32))

    return matches_from_nn(idx12, d12, valid, cfg, metric, prune, capacity)


@functools.partial(jax.jit, static_argnames=("cfg", "metric", "prune", "capacity"))
def matches_from_nn(
    idx12,
    d12,
    valid,
    cfg: MatchConfig = MatchConfig(),
    metric: str = "l2",
    prune: bool = True,
    capacity: int | None = None,
) -> Matches:
    """Build a pruned fixed-capacity Matches from per-query NN results.

    Shared tail of bf_match, also fed by the ring-sharded NN search
    (tpusfm.dist.ring_match) so distributed matching applies the exact same
    reference prune rules (FeatureMatchUtil.cpp:24-30)."""
    n1 = idx12.shape[0]
    dist = jnp.sqrt(jnp.maximum(d12, 0.0)) if metric == "l2" else d12
    dist = jnp.where(valid, dist, BIG)

    if capacity is None:
        capacity = cfg.max_matches if prune else n1
    capacity = min(capacity, n1)

    if prune:
        # Floor the reference's relative threshold (keep d <= 4 * d_min,
        # FeatureMatchUtil.cpp:24-30): when d_min is exactly 0 (bit-identical
        # descriptors on synthetic/repeating texture) a pure relative rule
        # degenerates to keeping only the zero-distance matches.
        # 0.05 is far below any informative unit-descriptor distance, so the
        # floor only activates in the degenerate regime.
        min_d = jnp.min(dist)
        keep = valid & (dist <= jnp.maximum(cfg.distance_coef * min_d, 0.05))
        dist = jnp.where(keep, dist, BIG)
        valid = keep

    if not prune and capacity == n1:
        # Unpruned full-capacity output: selection order is irrelevant to
        # every consumer (GMS votes, LOGOS, disparity scatter), so skip the
        # O(N log N) top_k — at dense-mode scale (millions of queries) the
        # sort would dominate the whole matching step.
        order = jnp.arange(n1, dtype=jnp.int32)
    else:
        # `capacity` smallest distances (ties by index via stable top_k).
        _, order = jax.lax.top_k(-dist, capacity)
        order = order.astype(jnp.int32)
    sel_valid = jnp.take(valid, order)
    sel_dist = jnp.take(dist, order)
    sel_idx2 = jnp.take(idx12, order)
    return Matches(
        idx1=jnp.where(sel_valid, order, 0),
        idx2=jnp.where(sel_valid, sel_idx2, 0).astype(jnp.int32),
        distance=jnp.where(sel_valid, sel_dist, 0.0),
        mask=sel_valid,
    )
