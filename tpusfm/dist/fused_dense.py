"""Fused dense-mode pipeline: ring NN matching + GMS voting in ONE step.

The reference's dense disparity mode matches one descriptor per pixel and
then GMS-filters the matches (/root/reference/SfM-GMS/SfM-GMS/
DisparityUtil.cpp:125-152). Run separately, the sharded GMS pass re-pays
its vote-grid psums against GMS's tiny compute and projected only 58%
8-chip efficiency (r4 comm model). Here the votes are accumulated directly
behind the ring-match pass inside one shard_map: each device finishes its
query shard's ring reduction, gathers matched coordinates from a
REPLICATED (Ndb, 2) table (16 MB at 2M keypoints — noise next to the
descriptor shards), scatters its shard's votes, and the tiny
(cells1 x cells2) grids are psum'd once per scale/offset. The grid psums
are unchanged in bytes but now amortize against the ring match's matmul
FLOPs in the same step — the fused row projects >=90% at 8 chips
(scripts/comm_model.py).

Equivalence with [nn_search + gms_filter] is tested on the virtual CPU
mesh (tests/test_dist.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpusfm.config import GmsConfig
from tpusfm.dist.ring_match import ring_local_nn
from tpusfm.match.gms import _SCALE_RATIOS, _rotation_perms, _scale_pass


def ring_match_gms(q, db, db_mask, xy1, xy2, size1, size2, mesh: Mesh,
                   cfg: GmsConfig = GmsConfig(), metric: str = "l2",
                   axis: str = "d", block: int | None = None):
    """Ring-sharded exact NN + GMS filtering fused into one program.

    q/db: (Nq, D)/(Ndb, D) descriptors, both sharded on ``axis`` (divisible
    by the mesh size; pad upstream). xy1: (Nq, 2) query pixel coords
    (sharded); xy2: (Ndb, 2) database pixel coords (replicated). Returns
    (idx (Nq,) i32 global db rows, best, second, inlier (Nq,) bool).
    """
    n_dev = mesh.devices.size
    shard = db.shape[0] // n_dev

    rot_perms = _rotation_perms()
    if not cfg.with_rotation:
        rot_perms = rot_perms[:1]
    scales = _SCALE_RATIOS if cfg.with_scale else [1.0]

    def local(q_l, db_l, dbm_l, xy1_l, xy2_g):
        idx, best, second = ring_local_nn(q_l, db_l, dbm_l, n_dev, shard,
                                          metric, axis, block)
        ok = idx >= 0
        xy2_m = jnp.take(xy2_g, jnp.maximum(idx, 0), axis=0)
        inls = jnp.concatenate([
            _scale_pass(
                xy1_l, xy2_m, ok, size1, size2, cfg,
                max(1, int(round(cfg.grid_rows * s))),
                max(1, int(round(cfg.grid_cols * s))),
                rot_perms, axis_name=axis,
            )
            for s in scales
        ])                                               # (S*R, N_local)
        counts = jax.lax.psum(jnp.sum(inls.astype(jnp.int32), axis=1), axis)
        return idx, best, second, inls[jnp.argmax(counts)]

    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    with mesh:
        return f(q, db, db_mask.astype(jnp.float32), xy1, xy2)
