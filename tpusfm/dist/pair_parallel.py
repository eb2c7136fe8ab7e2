"""Data-parallel image-pair processing.

The reference runs its pair comparisons serially
(/root/reference/SfM-GMS/SfM-GMS/DisparityUtil.cpp:444-460, main.cpp:31-47);
detect+match is per-pair independent, so pairs shard perfectly over the
mesh: a batch of descriptor sets is placed with the batch axis on the
device axis and the per-pair matcher is vmapped inside shard_map. Scaling
is embarrassingly parallel — the frames/s axis of the BASELINE target.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpusfm.kernels.distance import BIG, _block_l2, _block_hamming, _block_top2


def _pair_nn(d1, d2, m1, m2, metric):
    """Cross-checked NN match of one pair (dense in-VMEM sizes)."""
    if metric == "l2":
        dist = _block_l2(d1, d2)
    else:
        dist = _block_hamming(d1, d2)
    dist = dist + (1.0 - m2.reshape(1, -1)) * BIG
    dist = dist + (1.0 - m1.reshape(-1, 1)) * BIG
    fwd = jnp.argmin(dist, axis=1)
    bwd = jnp.argmin(dist, axis=0)
    mutual = jnp.take(bwd, fwd) == jnp.arange(d1.shape[0])
    dmin = jnp.min(dist, axis=1)
    valid = mutual & (dmin < BIG / 2) & (m1 > 0.5)
    return fwd.astype(jnp.int32), jnp.where(valid, dmin, 0.0), valid


def parallel_pair_match(desc1, desc2, mask1, mask2, mesh: Mesh,
                        metric: str = "l2", axis: str = "d"):
    """Match a batch of pairs, batch axis sharded over the mesh.

    desc1, desc2: (B, N, D); mask1, mask2: (B, N).
    Returns (idx2 (B, N), dist (B, N), valid (B, N)).
    """
    def local(d1, d2, m1, m2):
        return jax.vmap(lambda a, b, c, d: _pair_nn(a, b, c, d, metric))(d1, d2, m1, m2)

    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    with mesh:
        return f(desc1, desc2, mask1.astype(jnp.float32), mask2.astype(jnp.float32))


def parallel_two_view(feats1, feats2, intr, mesh: Mesh, cfg=None, axis: str = "d"):
    """FULL two-view SfM (match -> RANSAC -> pose -> triangulate) for a batch
    of pairs with the pair axis sharded over the mesh — the data-parallel
    product path that generalizes the reference's serial pair loop
    (/root/reference/SfM-GMS/SfM-GMS/DisparityUtil.cpp:444-460).

    feats1/feats2: Features with leading batch axis divisible by the mesh
    size; intr replicated. Returns a TwoViewResult with the batch axis
    sharded. Per-pair results are identical to tpusfm.sfm.two_view_batch on
    one device (tests/test_dist.py)."""
    from tpusfm.config import PipelineConfig
    from tpusfm.sfm.two_view import two_view_batch

    cfg = cfg or PipelineConfig()

    def local(f1, f2):
        return two_view_batch.__wrapped__(f1, f2, intr, cfg)

    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    with mesh:
        return f(feats1, feats2)
