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
NEG = -3e30  # accumulator init: below any masked score (~ -BIG)

TILE_Q = 1024
TILE_DB = 512


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


def _nn_kernel(q_ref, db_ref, pen_ref, best_ref, second_ref, idx_ref,
               m1_ref, m2_ref, off_ref, *, prec):
    """Score-space streaming top-2.

    The r4 kernel serialized a cross-lane argmin + iota re-mask + 3-way merge
    against every 256x256 tile's matmul and measured 0.4% of MXU peak (30 ms
    for 10k x 10k x 128 — VERDICT r4 #1). This design keeps PER-COLUMN top-2
    accumulators (tile_q, tile_db) updated with five elementwise VPU ops per
    distance — no cross-lane work in the streaming loop — and extracts the
    global per-row top-2 ONCE per query tile at the last db step.

    Scores are s = q.db - 0.5|db|^2 - mask_penalty (maximizing s minimizes
    the L2 distance; |q|^2 is a per-row constant restored by the wrapper), so
    each block costs one MXU matmul plus one subtract before bookkeeping.
    """
    j = pl.program_id(1)  # innermost grid axis = db stream
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m1_ref[:] = jnp.full_like(m1_ref, NEG)
        m2_ref[:] = jnp.full_like(m2_ref, NEG)
        off_ref[:] = jnp.zeros_like(off_ref)

    s = jax.lax.dot_general(
        q_ref[:], db_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) - pen_ref[:]
    m1 = m1_ref[:]
    take = s > m1
    m2_ref[:] = jnp.maximum(m2_ref[:], jnp.where(take, m1, s))
    m1_ref[:] = jnp.maximum(m1, s)
    off_ref[:] = jnp.where(take, j, off_ref[:])

    @pl.when(j == nj - 1)
    def _():
        M1 = m1_ref[:]
        td = M1.shape[1]
        a = jnp.argmax(M1, axis=1)
        g1 = jnp.max(M1, axis=1)
        cols = jax.lax.broadcasted_iota(jnp.int32, M1.shape, 1)
        at_a = cols == a[:, None]
        runner = jnp.maximum(
            jnp.max(jnp.where(at_a, NEG, M1), axis=1),      # best of other cols
            jnp.max(jnp.where(at_a, m2_ref[:], NEG), axis=1),  # 2nd in the argmax col
        )
        off_a = jnp.max(jnp.where(at_a, off_ref[:], -1), axis=1)
        best_ref[:, 0] = g1
        second_ref[:, 0] = runner
        idx_ref[:, 0] = off_a * td + a


@functools.partial(jax.jit, static_argnames=("metric", "tile_q", "tile_db"))
def nn_search_pallas(q, db, db_mask, metric: str = "l2",
                     tile_q: int = TILE_Q, tile_db: int = TILE_DB):
    """Streaming NN search on TPU via Pallas.

    q: (Nq, D), db: (Ndb, D) — f32/bf16 for "l2", uint32-packed for
    "hamming". db_mask: (Ndb,) f32/bool — invalid database rows never match.
    Nq, Ndb must be multiples of the tile sizes (caller pads; see nn_search).

    tile_q is the HBM-traffic lever: the full database streams from HBM
    Nq/tile_q times, so dense-mode matching (millions of descriptors) wants
    large query tiles. The (tile_q, tile_db) f32 accumulators (x3) plus the
    score block live in VMEM — 1024x512 costs ~8 MB of the ~16 MB budget.

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
    # shrink tiles for small problems (tile sizes are jit-static)
    while tile_q > 8 and nq % tile_q:
        tile_q //= 2
    while tile_db > 128 and ndb % tile_db:
        tile_db //= 2
    assert nq % tile_q == 0 and ndb % tile_db == 0, (nq, ndb, tile_q, tile_db)
    grid = (nq // tile_q, ndb // tile_db)

    dbf = db.astype(jnp.float32)
    # per-column penalty: half db norm + "never wins" for masked rows
    pen = (0.5 * jnp.sum(dbf * dbf, axis=1)
           + (1.0 - db_mask.astype(jnp.float32)) * BIG).reshape(1, ndb)
    prec = (jax.lax.Precision.DEFAULT if q.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    out_shape = (
        jax.ShapeDtypeStruct((nq, 1), jnp.float32),
        jax.ShapeDtypeStruct((nq, 1), jnp.float32),
        jax.ShapeDtypeStruct((nq, 1), jnp.int32),
    )
    el = 2 if q.dtype == jnp.bfloat16 else 4
    g1, runner, idx = pl.pallas_call(
        functools.partial(_nn_kernel, prec=prec),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_db, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_db), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((tile_q, tile_db), jnp.float32),
            pltpu.VMEM((tile_q, tile_db), jnp.float32),
            pltpu.VMEM((tile_q, tile_db), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * ndb * d,
            bytes_accessed=el * (nq * d + (nq // tile_q) * ndb * d) + 4 * 3 * nq,
            transcendentals=0,
        ),
        # 3 (tile_q, tile_db) accumulators + the score block exceed the 16 MB
        # default scoped-vmem budget at the large-tile operating points;
        # v5e has 128 MiB of physical VMEM.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
    )(q, db, pen)
    g1, runner = g1[:, 0], runner[:, 0]
    qf = q.astype(jnp.float32)
    qn = jnp.sum(qf * qf, axis=1)
    no_best = g1 < -1e29      # every db row masked
    no_second = runner < -1e29
    best = jnp.where(no_best, BIG, jnp.maximum(qn - 2.0 * g1, 0.0))
    second = jnp.where(no_second, BIG, jnp.maximum(qn - 2.0 * runner, 0.0))
    idx = jnp.where(no_best, -1, idx[:, 0])
    return idx, best, second


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
