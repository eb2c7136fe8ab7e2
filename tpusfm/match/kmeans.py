"""Batched k-means (Lloyd's) for BoW vocabularies.

TPU-native replacement for cv::BOWKMeansTrainer
(/root/reference/SfM-GMS/SfM-GMS/FeatureMatchUtil.cpp:101-102,
DisparityUtil.cpp:60-62): assignment is an MXU distance matmul, the update a
segment-mean. Deterministic k-means++-style seeding from a PRNG key; fixed
iteration count for static control flow.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pairwise_d2(x, c):
    xn = jnp.sum(x * x, axis=1, keepdims=True)
    cn = jnp.sum(c * c, axis=1, keepdims=True)
    cross = jax.lax.dot_general(x, c, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    return jnp.maximum(xn + cn.T - 2.0 * cross, 0.0)


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(x, mask, k: int, iters: int = 10, key=None):
    """Cluster x (N, D) f32 with validity mask (N,) into k centers.

    Returns (centers (k, D), assign (N,) i32).
    Seeding: greedy farthest-point (deterministic k-means++ flavor without
    sampling) so results are reproducible across backends.
    """
    n = x.shape[0]
    maskf = mask.astype(jnp.float32)
    big = jnp.float32(1e30)

    # Farthest-point init: start from the valid point with max norm.
    norms = jnp.where(mask, jnp.sum(x * x, axis=1), -1.0)
    first = jnp.argmax(norms)
    centers0 = jnp.zeros((k, x.shape[1]), jnp.float32).at[0].set(x[first])

    def seed_body(i, centers):
        d2 = _pairwise_d2(x, centers)
        # Distance to nearest chosen center (first i centers valid).
        chosen = jnp.arange(k) < i
        d2 = jnp.where(chosen[None, :], d2, big)
        mind = jnp.min(d2, axis=1)
        mind = jnp.where(mask, mind, -1.0)
        nxt = jnp.argmax(mind)
        return centers.at[i].set(x[nxt])

    centers = jax.lax.fori_loop(1, k, seed_body, centers0)

    def lloyd(carry, _):
        c = carry
        d2 = _pairwise_d2(x, c)
        assign = jnp.argmin(d2, axis=1).astype(jnp.int32)
        a = jnp.where(mask, assign, k)  # invalid rows to a dummy bucket
        one_hot = (a[:, None] == jnp.arange(k)[None, :]).astype(jnp.float32)
        counts = jnp.sum(one_hot, axis=0)
        sums = jax.lax.dot_general(
            one_hot, x, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        new_c = sums / jnp.maximum(counts[:, None], 1.0)
        new_c = jnp.where(counts[:, None] > 0, new_c, c)  # keep empty clusters
        return new_c, None

    centers, _ = jax.lax.scan(lloyd, centers, None, length=iters)
    assign = jnp.argmin(_pairwise_d2(x, centers), axis=1).astype(jnp.int32)
    return centers, assign


def assign_words(desc, centers):
    """Nearest visual word per descriptor — the FLANN vocab-match stage
    (/root/reference/SfM-GMS/SfM-GMS/FeatureMatchUtil.cpp:105-114)."""
    return jnp.argmin(_pairwise_d2(desc, centers), axis=1).astype(jnp.int32)
