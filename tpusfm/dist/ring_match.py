"""Ring-blockwise nearest-neighbor matching (sequence-parallel analog).

The SfM long-axis is the keypoint/descriptor count: dense mode reaches one
descriptor per pixel (~2M at 1080p, SURVEY.md §2.4), so the N1 x N2 distance
matrix can exceed any single chip's memory. Structure borrowed from
ring attention: both query and database descriptors are sharded over the
mesh; each step computes the local block's running (best, second, argbest)
and then rotates the database shard around the ring with
`jax.lax.ppermute`. After n_devices steps every query shard has seen the
full database without the matrix ever existing. Communication rides
ICI neighbor links — bandwidth-optimal for this reduction.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpusfm.kernels.distance import (
    BIG, _block_l2, _block_hamming, _block_top2, _merge_top2, nn_search_xla,
)


def ring_local_nn(q_l, db_l, dbm_l, n_dev: int, shard: int, metric: str,
                  axis: str, block: int | None):
    """Per-device ring NN body (runs inside shard_map): rotate the db shard
    around the ring with ppermute, merging each block's running
    (best, second, argbest). Also used by the fused dense-mode pipeline
    (tpusfm/dist/fused_dense.py)."""
    me = jax.lax.axis_index(axis)
    nq = q_l.shape[0]
    best = jnp.full((nq,), BIG, jnp.float32)
    second = jnp.full((nq,), BIG, jnp.float32)
    idx = jnp.full((nq,), -1, jnp.int32)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def body(carry, step):
        best, second, idx, db_c, dbm_c = carry
        # block owner: the shard currently held started at device (me - step)
        owner = jnp.mod(me - step, n_dev)
        if block is not None and block < shard:
            bidx, bmin, bmin2 = nn_search_xla(
                q_l, db_c, dbm_c, metric=metric, block=block)
        else:
            if metric == "l2":
                dist = _block_l2(q_l, db_c)
            else:
                dist = _block_hamming(q_l, db_c)
            dist = dist + (1.0 - dbm_c.reshape(1, -1)) * BIG
            bmin, bmin2, bidx = _block_top2(dist)
        bidx = bidx + owner.astype(jnp.int32) * shard
        best, second, idx = _merge_top2(best, second, idx, bmin, bmin2, bidx)
        # rotate database shard to the next device
        db_c = jax.lax.ppermute(db_c, axis, perm)
        dbm_c = jax.lax.ppermute(dbm_c, axis, perm)
        return (best, second, idx, db_c, dbm_c), None

    (best, second, idx, _, _), _ = jax.lax.scan(
        body, (best, second, idx, db_l, dbm_l),
        jnp.arange(n_dev), length=n_dev,
    )
    return idx, best, second


def ring_nn_search(q, db, db_mask, mesh: Mesh, metric: str = "l2", axis: str = "d",
                   block: int | None = None):
    """Exact NN over the full db with both q and db sharded on ``axis``.

    q: (Nq, D), db: (Ndb, D), db_mask: (Ndb,). Nq and Ndb must be divisible
    by the mesh size (pad upstream). Returns (idx, best, second) like
    tpusfm.kernels.distance.nn_search, with idx referring to global db rows.

    block: inner tile of the local db shard per compute step. Without it the
    per-step distance block is (Nq/devs, Ndb/devs) — fine for sparse
    workloads, hopeless at dense-mode scale (~366k x 366k per device for the
    robot pair on 8 devices). Set e.g. 2048 to bound the materialized block;
    the shard then streams through the same running-(best, second, argbest)
    merge the single-chip kernel uses, while ppermute rotation is unchanged.
    """
    n_dev = mesh.devices.size
    shard = db.shape[0] // n_dev

    def local(q_l, db_l, dbm_l):
        return ring_local_nn(q_l, db_l, dbm_l, n_dev, shard, metric, axis,
                             block)

    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    with mesh:
        return f(q, db, db_mask.astype(jnp.float32))
