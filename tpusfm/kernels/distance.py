"""Descriptor nearest-neighbor search — the matching hot loop.

TPU-native replacement for the reference's cv::BFMatcher N1xN2 search
(/root/reference/SfM-GMS/SfM-GMS/FeatureMatchUtil.cpp:20-31) and its FLANN
approximate variants (/root/reference/SfM-GMS/SfM-GMS/DisparityUtil.cpp:101-116):
on the MXU an *exact* blockwise search is faster than approximate trees, so
FLANN call sites map onto this same kernel.

Design: flash-attention-style streaming. The (Nq, Ndb) distance matrix is
never materialized; a Pallas kernel tiles it and keeps per-query running
(best, second-best, argbest) accumulators in VMEM. L2 distances come from the
MXU via d2 = |q|^2 + |db|^2 - 2 q.db ; Hamming (ORB) from XOR+popcount on the
VPU. Complexity O(Nq*Ndb*D) FLOPs, O(Nq + Ndb) memory.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusfm.utils.pad import pad_axis, round_up

BIG = 1e30  # python float: safe to close over inside pallas kernels

TILE_Q = 256
TILE_DB = 256


def _block_l2(q, db):
    """Squared-L2 distance block: q (TQ, D), db (TD, D) -> (TQ, TD) f32.

    Accepts f32 or bf16 operands (bf16 feeds the MXU at double rate; the
    Hamming path uses exact 0/1 bf16 bit vectors). The contract precision
    must match the operand dtype explicitly: the package-wide
    jax_default_matmul_precision=float32 (tpusfm/__init__.py) would
    otherwise reach into this kernel and make Mosaic reject bf16 operands
    with an fp32 contract precision ("Bad lhs type")."""
    qf = q.astype(jnp.float32)
    dbf = db.astype(jnp.float32)
    qn = jnp.sum(qf * qf, axis=1, keepdims=True)
    dn = jnp.sum(dbf * dbf, axis=1, keepdims=True)
    prec = jax.lax.Precision.DEFAULT if q.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    cross = jax.lax.dot_general(
        q, db, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    )
    return jnp.maximum(qn + dn.T - 2.0 * cross, 0.0)


def unpack_bits(x):
    """Packed binary descriptors (N, W) uint32 -> (N, 32*W) bf16 of 0/1 bits.

    Hamming distance between packed descriptors equals squared-L2 between
    their bit vectors (|a_i - b_i|^2 = a_i XOR b_i for bits), so ORB
    matching rides the same MXU streaming kernel as SIFT instead of VPU
    XOR/popcount loops. Exactness: bit values, their squares, and all
    partial dot products are integers <= 256 = 2^8 — exactly representable
    in bf16's 8-bit significand, and the MXU accumulates in f32."""
    x = jnp.asarray(x, jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (x[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(x.shape[0], -1).astype(jnp.bfloat16)


def _block_hamming(q, db):
    """Hamming distance block on packed uint32 words -> float32 (TQ, TD).

    Accumulated one 32-bit word at a time: the obvious broadcast
    ``popcount(q[:,None,:] ^ db[None,:,:])`` builds a (TQ, TD, W) rank-3
    intermediate whose minor dim W=8 is padded to the 128-lane tile by
    Mosaic — 64 MB of scoped VMEM at 256x256 tiles, an on-chip OOM. The
    unrolled word loop keeps every intermediate a well-tiled (TQ, TD)
    block (256 KB). popcount yields uint32; Mosaic cannot reduce unsigned
    ints, so cast to int32 (values <= 32 per word) before summing."""
    acc = jnp.zeros((q.shape[0], db.shape[0]), jnp.int32)
    for w in range(q.shape[1]):
        x = jax.lax.population_count(q[:, w][:, None] ^ db[:, w][None, :])
        acc = acc + x.astype(jnp.int32)
    return acc.astype(jnp.float32)


def _merge_top2(best, second, best_idx, bmin, bmin2, bidx):
    """Merge running (best, second, idx) with a block's (min, min2, argmin)."""
    take = bmin < best
    new_best = jnp.where(take, bmin, best)
    new_idx = jnp.where(take, bidx, best_idx)
    # Second-smallest of {best, second, bmin, bmin2}: loser of the best
    # comparison competes with the incumbent second and the block's second.
    loser = jnp.where(take, best, bmin)
    new_second = jnp.minimum(second, jnp.minimum(loser, bmin2))
    return new_best, new_second, new_idx


def _block_top2(dist):
    """Per-row (min, second-min, argmin) of a (TQ, TD) block."""
    bidx = jnp.argmin(dist, axis=1)
    bmin = jnp.min(dist, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    masked = jnp.where(cols == bidx[:, None], BIG, dist)
    bmin2 = jnp.min(masked, axis=1)
    return bmin, bmin2, bidx.astype(jnp.int32)


def _nn_kernel(q_ref, db_ref, dbmask_ref, best_ref, second_ref, idx_ref, *, metric):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, BIG)
        second_ref[:] = jnp.full_like(second_ref, BIG)
        idx_ref[:] = jnp.full_like(idx_ref, -1)

    q = q_ref[:]
    db = db_ref[:]
    if metric == "l2":
        dist = _block_l2(q, db)
    else:
        dist = _block_hamming(q, db)
    # Invalid db rows can never win.
    dist = dist + (1.0 - dbmask_ref[:].reshape(1, -1)) * BIG

    bmin, bmin2, bidx = _block_top2(dist)
    bidx = bidx + j * dist.shape[1]

    best, second, idx = best_ref[:, 0], second_ref[:, 0], idx_ref[:, 0]
    nb, ns, ni = _merge_top2(best, second, idx, bmin, bmin2, bidx)
    best_ref[:, 0] = nb
    second_ref[:, 0] = ns
    idx_ref[:, 0] = ni


@functools.partial(jax.jit, static_argnames=("metric", "tile_q", "tile_db"))
def nn_search_pallas(q, db, db_mask, metric: str = "l2",
                     tile_q: int = TILE_Q, tile_db: int = TILE_DB):
    """Streaming NN search on TPU via Pallas.

    q: (Nq, D), db: (Ndb, D) — f32/bf16 for "l2", uint32-packed for
    "hamming". db_mask: (Ndb,) f32/bool — invalid database rows never match.
    Nq, Ndb must be multiples of the tile sizes (caller pads; see nn_search).

    tile_q is the HBM-traffic lever: the full database streams from HBM
    Nq/tile_q times, so dense-mode matching (millions of descriptors) wants
    large query tiles — tile_q=4096, tile_db=512 keeps the (TQ, TD) f32
    distance block at 8 MB of VMEM while cutting database re-streaming ~16x
    vs the 256x256 default (which is tuned for sparse workloads where the
    whole problem is small).

    Returns (idx (Nq,) i32, best (Nq,) f32, second (Nq,) f32) —
    best/second are squared-L2 or Hamming distances.
    """
    if metric == "hamming":
        # Exact Hamming via the L2 kernel on unpacked bits (see unpack_bits):
        # MXU matmuls instead of VPU popcounts, and no rank-3 XOR
        # intermediate (the popcount formulation pads its minor dim W=8 to
        # the 128-lane tile and OOMs scoped VMEM at 256x256 tiles).
        q, db = unpack_bits(q), unpack_bits(db)
        metric = "l2"
    nq, d = q.shape
    ndb = db.shape[0]
    assert nq % tile_q == 0 and ndb % tile_db == 0, (nq, ndb, tile_q, tile_db)
    grid = (nq // tile_q, ndb // tile_db)

    dbm = db_mask.astype(jnp.float32).reshape(ndb, 1)
    out_shape = (
        jax.ShapeDtypeStruct((nq, 1), jnp.float32),
        jax.ShapeDtypeStruct((nq, 1), jnp.float32),
        jax.ShapeDtypeStruct((nq, 1), jnp.int32),
    )
    el = 2 if q.dtype == jnp.bfloat16 else 4
    best, second, idx = pl.pallas_call(
        functools.partial(_nn_kernel, metric=metric),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_db, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_db, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * ndb * d,
            bytes_accessed=el * (nq * d + (nq // tile_q) * ndb * d) + 4 * 3 * nq,
            transcendentals=0,
        ),
    )(q, db, dbm)
    return idx[:, 0], best[:, 0], second[:, 0]


@functools.partial(jax.jit, static_argnames=("metric", "block"))
def nn_search_xla(q, db, db_mask, metric: str = "l2", block: int = 1024):
    """Pure-XLA reference path (CPU tests / fallback): scan over db blocks."""
    nq = q.shape[0]
    ndb = db.shape[0]
    nblocks = max(1, round_up(ndb, block) // block)
    dbp = pad_axis(db, nblocks * block, axis=0)
    dbmp = pad_axis(db_mask.astype(jnp.float32), nblocks * block, axis=0)
    db_blocks = dbp.reshape(nblocks, block, -1)
    dbm_blocks = dbmp.reshape(nblocks, block)

    def body_i(carry, xs):
        (best, second, idx) = carry
        dbb, dbmb, off = xs
        if metric == "l2":
            dist = _block_l2(q, dbb)
        else:
            dist = _block_hamming(q, dbb)
        dist = dist + (1.0 - dbmb.reshape(1, -1)) * BIG
        bmin, bmin2, bidx = _block_top2(dist)
        bidx = bidx + off
        return _merge_top2(best, second, idx, bmin, bmin2, bidx), None

    init = (
        jnp.full((nq,), BIG, jnp.float32),
        jnp.full((nq,), BIG, jnp.float32),
        jnp.full((nq,), -1, jnp.int32),
    )
    offs = jnp.arange(nblocks, dtype=jnp.int32) * block
    (best, second, idx), _ = jax.lax.scan(body_i, init, (db_blocks, dbm_blocks, offs))
    return idx, best, second


def nn_search(q, db, db_mask=None, metric: str = "l2",
              tile_q: int | None = None, tile_db: int | None = None):
    """Dispatching NN search: Pallas on TPU, XLA elsewhere.

    Handles padding to tile multiples; returned indices refer to the unpadded
    db. Invalid queries (padding rows) return index -1 only if their distances
    are BIG — callers should mask query validity themselves.

    tile_q/tile_db override the Pallas tile sizes (see nn_search_pallas);
    dense-scale callers pass large query tiles to bound HBM re-streaming.
    """
    q = jnp.asarray(q)
    db = jnp.asarray(db)
    if db_mask is None:
        db_mask = jnp.ones((db.shape[0],), jnp.float32)
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        return nn_search_xla(q, db, db_mask, metric=metric)
    tq = tile_q or TILE_Q
    td = tile_db or TILE_DB
    nq = round_up(q.shape[0], tq)
    ndb = round_up(db.shape[0], td)
    d = round_up(q.shape[1], 128) if metric == "l2" else q.shape[1]
    qp = pad_axis(pad_axis(q, nq, 0), d, 1)
    dbp = pad_axis(pad_axis(db, ndb, 0), d, 1)
    dbmp = pad_axis(db_mask.astype(jnp.float32), ndb, 0)
    idx, best, second = nn_search_pallas(qp, dbp, dbmp, metric=metric,
                                         tile_q=tq, tile_db=td)
    n = q.shape[0]
    return idx[:n], best[:n], second[:n]
